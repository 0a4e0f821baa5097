"""Loss library: L2 / L1 / SSIM / MS-SSIM and the fusion mixes.

Reference: ``loss_fn`` models/utils.py:60-80 (L2, L1, SSIM, Fusion1-4,
Fusion_hinerv with lambda=0.7) built on pytorch_msssim. The SSIM/MS-SSIM here
follow the same construction as pytorch_msssim: 1D separable Gaussian window
(default win_size=11, sigma=1.5), K=(0.01, 0.03), per-channel depthwise
filtering, valid padding; MS-SSIM uses the standard 5 scale weights and 2x2
average pooling between scales.

Images are [H, W, C] or [B, H, W, C] floats in [0, 1] (data_range=1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# f32-accurate matmuls (MXU default rounds to bf16; see kernels/raster_pallas.py)
from ..core.precision import MM_PRECISION  # single policy home

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(win_size: int, sigma: float) -> jax.Array:
    x = jnp.arange(win_size, dtype=jnp.float32) - (win_size - 1) / 2.0
    g = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return g / jnp.sum(g)


def _band_matrix(n_in: int, k: int, win: jax.Array) -> jax.Array:
    """[n_in-k+1, n_in] valid-mode sliding-window matrix, built on device
    (A[i, i+j] = win[j]) — separable filtering as two matmuls rides the MXU
    and avoids both conv edge cases and large embedded constants."""
    n_out = n_in - k + 1
    row = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n_out, n_in), 1)
    off = col - row
    a = jnp.zeros((n_out, n_in), win.dtype)
    valid = (off >= 0) & (off < k)
    return jnp.where(valid, win[jnp.clip(off, 0, k - 1)], a)


def _filter2d_separable(img: jax.Array, win: jax.Array) -> jax.Array:
    """Depthwise separable valid-mode filtering on [B, H, W, C] via band-matrix
    matmuls: out = A_h @ X @ A_w^T per channel."""
    B, H, W, C = img.shape
    k = win.shape[0]
    A_h = _band_matrix(H, k, win)                     # [H-k+1, H]
    A_w = _band_matrix(W, k, win)                     # [W-k+1, W]
    x = img.transpose(0, 3, 1, 2)                     # [B, C, H, W]
    x = jnp.einsum("oh,bchw->bcow", A_h, x, precision=MM_PRECISION)
    x = jnp.einsum("pw,bchw->bchp", A_w, x, precision=MM_PRECISION)
    return x.transpose(0, 2, 3, 1)


def _ssim_components(x: jax.Array, y: jax.Array, win_size: int, sigma: float,
                     data_range: float = 1.0):
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    win = _gaussian_window(win_size, sigma)
    mu_x = _filter2d_separable(x, win)
    mu_y = _filter2d_separable(y, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _filter2d_separable(x * x, win) - mu_xx
    sigma_yy = _filter2d_separable(y * y, win) - mu_yy
    sigma_xy = _filter2d_separable(x * y, win) - mu_xy
    cs = (2.0 * sigma_xy + C2) / (sigma_xx + sigma_yy + C2)
    ssim_map = ((2.0 * mu_xy + C1) / (mu_xx + mu_yy + C1)) * cs
    return ssim_map, cs


def _as_batched(img: jax.Array) -> jax.Array:
    return img[None] if img.ndim == 3 else img


def ssim(x: jax.Array, y: jax.Array, win_size: int = 11, sigma: float = 1.5,
         data_range: float = 1.0) -> jax.Array:
    """Mean SSIM (size_average=True semantics)."""
    x, y = _as_batched(x), _as_batched(y)
    ssim_map, _ = _ssim_components(x, y, win_size, sigma, data_range)
    return jnp.mean(ssim_map)


def _avg_pool2(img: jax.Array) -> jax.Array:
    """2x2 average pooling, pytorch_msssim semantics: odd dims get a zero on
    BOTH sides (F.avg_pool2d(kernel=2, padding=dim%2), count_include_pad=True),
    so edge windows average the pad zeros in."""
    B, H, W, C = img.shape
    ph, pw = H % 2, W % 2
    # symmetric zero pad, but stride-2 windows never reach the trailing pad
    # (floor semantics), so only the leading zero materializes
    img = jnp.pad(img, ((0, 0), (ph, 0), (pw, 0), (0, 0)))
    H2, W2 = img.shape[1] // 2, img.shape[2] // 2
    return img.reshape(B, H2, 2, W2, 2, C).mean(axis=(2, 4))


def ms_ssim(x: jax.Array, y: jax.Array, win_size: int = 11, sigma: float = 1.5,
            data_range: float = 1.0) -> jax.Array:
    """Multi-scale SSIM with the standard 5-scale weights.

    pytorch_msssim refuses images smaller than ``(win-1) * 2^4``; here the
    number of scales auto-truncates instead (weights renormalized) so small
    test images stay finite.
    """
    x, y = _as_batched(x), _as_batched(y)
    smaller = min(x.shape[1], x.shape[2])
    levels = len(MS_SSIM_WEIGHTS)
    while levels > 1 and (smaller // 2 ** (levels - 1)) < win_size:
        levels -= 1
    weights = jnp.asarray(MS_SSIM_WEIGHTS[:levels])
    weights = weights / jnp.sum(weights) * sum(MS_SSIM_WEIGHTS)
    mcs = []
    for i in range(levels):
        ssim_map, cs = _ssim_components(x, y, win_size, sigma, data_range)
        if i < levels - 1:
            mcs.append(jnp.maximum(jnp.mean(cs), 0.0))
            x, y = _avg_pool2(x), _avg_pool2(y)
    ssim_val = jnp.maximum(jnp.mean(ssim_map), 0.0)
    mcs_stack = jnp.stack(mcs + [ssim_val])
    return jnp.prod(mcs_stack ** weights)


def loss_fn(pred: jax.Array, target: jax.Array, loss_type: str = "L2",
            lambda_value: float = 0.7) -> jax.Array:
    """Reference loss dispatch (models/utils.py:60-80)."""
    target = jax.lax.stop_gradient(target)
    l2 = lambda: jnp.mean((pred - target) ** 2)
    l1 = lambda: jnp.mean(jnp.abs(pred - target))
    if loss_type == "L2":
        return l2()
    if loss_type == "L1":
        return l1()
    if loss_type == "SSIM":
        return 1.0 - ssim(pred, target)
    if loss_type == "Fusion1":
        return lambda_value * l2() + (1 - lambda_value) * (1.0 - ssim(pred, target))
    if loss_type == "Fusion2":
        return lambda_value * l1() + (1 - lambda_value) * (1.0 - ssim(pred, target))
    if loss_type == "Fusion3":
        return lambda_value * l2() + (1 - lambda_value) * l1()
    if loss_type == "Fusion4":
        return lambda_value * l1() + (1 - lambda_value) * (1.0 - ms_ssim(pred, target))
    if loss_type == "Fusion_hinerv":
        return lambda_value * l1() + (1 - lambda_value) * (1.0 - ms_ssim(pred, target, win_size=5))
    raise ValueError(f"unknown loss_type {loss_type!r}")
