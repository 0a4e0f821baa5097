"""Quality metrics: PSNR variants and MS-SSIM re-export.

Reference: float-MSE PSNR used in the train loop (train.py:188-189,
``10*log10(1/mse)``) and the clamped-uint8 variants in models/metrics.py:19-46.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .losses import ms_ssim, ssim  # noqa: F401 (re-export)


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def psnr(pred: jax.Array, target: jax.Array) -> jax.Array:
    """10*log10(1 / mse) on float images in [0, 1] (train.py:188-189)."""
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse(pred, target), 1e-12))


def clamped_mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    """MSE after uint8 round-trip (models/metrics.py:19-31 semantics)."""
    p = jnp.round(jnp.clip(pred, 0, 1) * 255.0)
    t = jnp.round(jnp.clip(target, 0, 1) * 255.0)
    return jnp.mean((p - t) ** 2)


def clamped_psnr(pred: jax.Array, target: jax.Array) -> jax.Array:
    return 10.0 * jnp.log10(255.0 ** 2 / jnp.maximum(clamped_mse(pred, target), 1e-12))
