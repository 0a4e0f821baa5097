"""Matmul precision policy — ONE home for the whole framework.

Every raster/SSIM/SH matmul runs at ``Precision.HIGHEST``: the TPU MXU's
default bf16 operand rounding (~0.4% rel) cancels catastrophically in the
expanded sigma quadratic near Gaussian centers, and the ``sigma >= 0`` blend
gate then drops alpha~1 contributions pseudo-randomly (~3 dB on Kodak fits —
see EXPERIMENTS.md "MXU precision root cause"). The 6-pass cost is ~1 ms per
Kodak train step because the raster is exp/VPU-bound, not MXU-bound.

Change the policy here only, with fresh A/B PSNR measurements on hardware.
"""

import jax

MM_PRECISION = jax.lax.Precision.HIGHEST
