"""GaussianImage++ on TPU — a from-scratch JAX/XLA/Pallas framework.

TPU-native re-implementation of the capabilities of the reference
GaussianImage++ repository (2D Gaussian splatting image representation and
compression): projection, tile-binned accumulated-sum rasterization with
hand-written VJPs, progressive point growth / PSD pruning under fixed shapes,
LSQ/log/VQ attribute quantization, bitstream codec, and mesh-parallel batched
fitting.
"""

__version__ = "0.1.0"
