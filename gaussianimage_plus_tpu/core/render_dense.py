"""Dense O(N * H * W) accumulated-sum renderer — the CPU-runnable oracle.

This is the semantic ground truth for the tiled/Pallas renderers and the
small-N fallback. It evaluates every (pixel, Gaussian) pair with exactly the
reference blending rule (``rasterize_sum_plus_forward``,
gsplat/gsplat/cuda/csrc/forward.cu:570-691):

    delta  = xy_g - (px, py)
    sigma  = 0.5*(c1*dx^2 + c3*dy^2) + c2*dx*dy
    alpha  = min(1, opacity * exp(-sigma))
    skip when sigma < 0 or alpha < 1/255
    pixel += color * alpha          (accumulated summation; no depth sort,
                                     no transmittance, background NOT added)

and the model-level clamp to [0, 1]
(models/gaussianimage_covariance.py:210).

Two optional fidelity switches reproduce the reference's tiling artifacts:

- ``tile_mask``: a Gaussian only touches pixels whose 16x16 tile lies inside
  its projected bbox (the binning step, forward.cu:141-206). Without binning a
  Gaussian's tail can reach ~3.33 sigma before the 1/255 alpha cutoff, slightly
  past the 3-sigma bbox, so this mask is required for pixel parity.
- ``tile_cap``: the reference rasterizer processes at most BLOCK_SIZE=256
  Gaussians per tile — `done = true` after the first shared-memory batch
  (forward.cu:673, config.h:1-4). With the cap enabled, only the first
  ``tile_cap`` bbox-hitting Gaussians (in index order) contribute per tile.
  The reference's CUDA sort key is the bare tile id (depths are all zero,
  forward.cu:141-206), so equal keys keep no defined order; index order is the
  deterministic choice and matches the unsorted emission order.

The whole thing is differentiable by plain JAX autodiff; its gradients define
"correct" for the hand-written tiled VJP (which itself mirrors
backward.cu:1168-1350).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# f32-accurate matmuls (MXU default is bf16; see kernels/raster_pallas.py)
from .precision import MM_PRECISION  # single policy home

from .gaussian2d import ALPHA_THRESHOLD, BLOCK_H, BLOCK_W, Projected, tile_bounds_for, tile_bbox


def tile_membership(proj: Projected, H: int, W: int,
                    block_h: int = BLOCK_H, block_w: int = BLOCK_W) -> jax.Array:
    """[T, N] bool — tile t's grid cell lies inside Gaussian n's tile bbox.

    T = tiles_x * tiles_y in row-major (y-major) order, matching the reference
    tile_id = tile_y * tile_bounds.x + tile_x (forward.cu:588-590).
    """
    tb_x, tb_y = tile_bounds_for(H, W, block_h, block_w)
    xmin, xmax, ymin, ymax = tile_bbox(
        proj.xys, proj.radii.astype(jnp.float32), (tb_x, tb_y), block_h, block_w)
    tx = jnp.arange(tb_x, dtype=jnp.int32)
    ty = jnp.arange(tb_y, dtype=jnp.int32)
    in_x = (tx[None, :, None] >= xmin[None, None, :]) & (tx[None, :, None] < xmax[None, None, :])
    in_y = (ty[:, None, None] >= ymin[None, None, :]) & (ty[:, None, None] < ymax[None, None, :])
    member = (in_x & in_y) & proj.valid[None, None, :]
    return member.reshape(tb_y * tb_x, -1)


def tile_cap_mask(member: jax.Array, cap: int) -> jax.Array:
    """Restrict a [T, N] membership matrix to the first ``cap`` members per tile.

    Replicates the one-batch BLOCK_SIZE cap of forward.cu:673 with
    deterministic index-order tie-breaking.
    """
    rank = jnp.cumsum(member.astype(jnp.int32), axis=1) - 1
    return member & (rank < cap)


def _min1_passthrough(x: jax.Array) -> jax.Array:
    """``min(1, x)`` whose gradient is identity even when saturated.

    The reference backward kernel computes ``v_sigma = -opac * vis * v_alpha``
    and ``v_opacity = vis * v_alpha`` unconditionally (backward.cu:1308-1323),
    i.e. it differentiates ``alpha = opac * exp(-sigma)`` while the forward
    used ``alpha = min(1, opac * exp(-sigma))`` — gradient flows through the
    saturated min. We replicate that here so ``jax.grad`` of this oracle
    matches the reference gradients bit-for-bit in the saturated regime.
    """
    return x - jax.lax.stop_gradient(jnp.maximum(x - 1.0, 0.0))


def render_dense(proj: Projected, colors: jax.Array, opacity: jax.Array,
                 H: int, W: int, tile_mask: bool = True,
                 tile_cap: Optional[int] = 256,
                 block_h: int = BLOCK_H, block_w: int = BLOCK_W) -> jax.Array:
    """Render [H, W, 3] by dense accumulation over all Gaussians.

    ``colors`` [N, 3] (already activated), ``opacity`` [N] or [N, 1].
    Output is clamped to [0, 1] (models/gaussianimage_covariance.py:210).
    """
    opacity = opacity.reshape(-1)
    px = jnp.arange(W, dtype=jnp.float32)
    py = jnp.arange(H, dtype=jnp.float32)
    # delta = gaussian_center - pixel (forward.cu:651).
    dx = proj.xys[:, 0][None, None, :] - px[None, :, None]   # [1, W, N]
    dy = proj.xys[:, 1][None, None, :] - py[:, None, None]   # [H, 1, N]
    c1 = proj.conics[:, 0][None, None, :]
    c2 = proj.conics[:, 1][None, None, :]
    c3 = proj.conics[:, 2][None, None, :]
    # The reference rasterizer backward emits HALF the true packed
    # off-diagonal conic cotangent (v_conic.y = 0.5*v_sigma*dx*dy,
    # backward.cu:1313-1315) because the projection VJP doubles it back
    # (helpers.cuh:384-395). Reproduce that convention under autodiff by
    # halving c2's gradient while keeping its value.
    c2 = 0.5 * c2 + jax.lax.stop_gradient(0.5 * c2)
    sigma = 0.5 * (c1 * dx * dx + c3 * dy * dy) + c2 * dx * dy  # [H, W, N]
    alpha = _min1_passthrough(opacity[None, None, :] * jnp.exp(-sigma))
    contrib = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & proj.valid[None, None, :]

    if tile_mask or tile_cap is not None:
        member = tile_membership(proj, H, W, block_h, block_w)  # [T, N]
        if tile_cap is not None:
            member = tile_cap_mask(member, tile_cap)
        tb_x, _ = tile_bounds_for(H, W, block_h, block_w)
        pix_ty = jnp.arange(H, dtype=jnp.int32) // block_h
        pix_tx = jnp.arange(W, dtype=jnp.int32) // block_w
        pix_tile = pix_ty[:, None] * tb_x + pix_tx[None, :]       # [H, W]
        contrib = contrib & member[pix_tile]                      # [H, W, N]

    weights = jnp.where(contrib, alpha, 0.0)
    img = jnp.einsum('hwn,nc->hwc', weights, colors, precision=MM_PRECISION)
    return jnp.clip(img, 0.0, 1.0)
