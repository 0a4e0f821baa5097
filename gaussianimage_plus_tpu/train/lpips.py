"""LPIPS (Learned Perceptual Image Patch Similarity), VGG-16 backbone, in JAX.

Mirrors the ``lpips`` package's ``LPIPS(net='vgg')`` exactly as the reference
uses it (models/metrics.py:62-95): scaling layer -> VGG16 feature slices
(relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3) -> channel unit-normalize
-> squared difference -> 1x1 linear heads (no bias) -> spatial mean -> sum
over the five layers.  ``lpips(img0, img1, params)`` takes [H, W, 3] images
in [0, 1] like the other metrics here and handles the [-1, 1] remap that the
reference does at the call site (``2*rgb - 1``).

Pretrained weights are NOT bundled: this environment has no network access
and no torchvision / lpips weight caches to convert.  The reference has the
same runtime gate — its ``lpips()`` raises unless ``pip install lpips`` (and
its weight download) has happened.  Use:

- ``params_from_npz(path)`` — load an ``.npz`` export (``conv{i}_w``,
  ``conv{i}_b`` for i in 0..12, ``lin{j}_w`` for j in 0..4);
- ``params_from_torch(vgg_state_dict, lin_state_dict)`` — convert the
  torchvision ``vgg16(pretrained=True).state_dict()`` plus the lpips
  package's ``weights/v0.1/vgg.pth`` linear heads;
- ``random_params(key)`` — architecture-shaped random weights, used by the
  tests to prove numerical parity against a line-by-line torch mirror (so
  dropping real weights in yields the real metric with no code change).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

# torchvision vgg16 'D' configuration: 13 3x3 convs; maxpool before convs
# 2, 4, 7, 10 (0-indexed) — i.e. at the start of LPIPS slices 2..5.
VGG_CHANNELS = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)
POOL_BEFORE = (2, 4, 7, 10)
# LPIPS taps the ReLU after convs 1, 3, 6, 9, 12 (relu1_2 ... relu5_3).
SLICE_ENDS = (1, 3, 6, 9, 12)
LIN_CHANNELS = (64, 128, 256, 512, 512)

# lpips.ScalingLayer constants (lpips/lpips.py v0.1).
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class LPIPSParams(NamedTuple):
    conv_w: Tuple[jax.Array, ...]   # 13 x [O, I, 3, 3]
    conv_b: Tuple[jax.Array, ...]   # 13 x [O]
    lin_w: Tuple[jax.Array, ...]    # 5 x [C] (1x1 conv, no bias)


def random_params(key: jax.Array, scale: float = 0.1) -> LPIPSParams:
    """Architecture-shaped random weights (testing / smoke only)."""
    conv_w, conv_b, lin_w = [], [], []
    c_in = 3
    for c_out in VGG_CHANNELS:
        key, k1, k2 = jax.random.split(key, 3)
        conv_w.append(jax.random.normal(k1, (c_out, c_in, 3, 3)) * scale)
        conv_b.append(jax.random.normal(k2, (c_out,)) * scale)
        c_in = c_out
    for c in LIN_CHANNELS:
        key, k1 = jax.random.split(key)
        # real LPIPS lins are non-negative; keep that property
        lin_w.append(jnp.abs(jax.random.normal(k1, (c,))) * scale)
    return LPIPSParams(tuple(conv_w), tuple(conv_b), tuple(lin_w))


@functools.lru_cache(maxsize=2)
def params_from_npz(path: str) -> LPIPSParams:
    """Load (and cache — ~55 MB of VGG weights; eval loops call this per
    image) an .npz weight export."""
    import numpy as np

    z = np.load(path)
    return LPIPSParams(
        tuple(jnp.asarray(z[f"conv{i}_w"]) for i in range(13)),
        tuple(jnp.asarray(z[f"conv{i}_b"]) for i in range(13)),
        tuple(jnp.asarray(z[f"lin{j}_w"]) for j in range(5)),
    )


def save_npz(path: str, params: LPIPSParams) -> None:
    import numpy as np

    np.savez(path, **{f"conv{i}_w": np.asarray(w)
                      for i, w in enumerate(params.conv_w)},
             **{f"conv{i}_b": np.asarray(b)
                for i, b in enumerate(params.conv_b)},
             **{f"lin{j}_w": np.asarray(w)
                for j, w in enumerate(params.lin_w)})


def params_from_torch(vgg_state_dict, lin_state_dict) -> LPIPSParams:
    """Convert torchvision ``vgg16().state_dict()`` + the lpips package's
    ``weights/v0.1/vgg.pth`` (keys ``lin{j}.model.1.weight`` [1, C, 1, 1])."""
    import numpy as np

    feat_idx = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    conv_w = tuple(jnp.asarray(np.asarray(vgg_state_dict[f"features.{i}.weight"]))
                   for i in feat_idx)
    conv_b = tuple(jnp.asarray(np.asarray(vgg_state_dict[f"features.{i}.bias"]))
                   for i in feat_idx)
    lin_w = tuple(jnp.asarray(
        np.asarray(lin_state_dict[f"lin{j}.model.1.weight"]).reshape(-1))
        for j in range(5))
    return LPIPSParams(conv_w, conv_b, lin_w)


def _conv3x3(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + b[None, :, None, None]


def _maxpool2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def _vgg_slices(params: LPIPSParams, x: jax.Array) -> Sequence[jax.Array]:
    """x: [N, 3, H, W] scaled input -> the five tapped feature maps."""
    feats = []
    for i, (w, b) in enumerate(zip(params.conv_w, params.conv_b)):
        if i in POOL_BEFORE:
            x = _maxpool2(x)
        x = jax.nn.relu(_conv3x3(x, w, b))
        if i in SLICE_ENDS:
            feats.append(x)
    return feats


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    """lpips.normalize_tensor: divide by channel L2 norm (+eps OUTSIDE
    the sqrt, matching the package)."""
    n = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x / (n + eps)


@functools.partial(jax.jit, static_argnames=())
def lpips(img0: jax.Array, img1: jax.Array, params: LPIPSParams) -> jax.Array:
    """LPIPS distance between two [H, W, 3] images in [0, 1].

    Matches the reference call ``lpips_model(2*rgb - 1, 2*gts - 1).mean()``
    (models/metrics.py:95) with the package's eval-mode forward.
    """
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]

    def prep(im):
        x = (2.0 * im - 1.0).transpose(2, 0, 1)[None]        # [1, 3, H, W]
        return (x - shift) / scale

    f0 = _vgg_slices(params, prep(img0))
    f1 = _vgg_slices(params, prep(img1))
    total = jnp.zeros(())
    for a, b, lw in zip(f0, f1, params.lin_w):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2   # [1, C, H, W]
        head = jnp.sum(d * lw[None, :, None, None], axis=1)  # 1x1 conv, no bias
        total = total + jnp.mean(head)                       # spatial average
    return total
