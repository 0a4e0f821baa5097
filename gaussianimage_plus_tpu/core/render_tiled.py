"""Tile-binned accumulated-sum rasterizer with a hand-written VJP.

TPU-native re-design of the reference CUDA rasterizer pair
(``rasterize_sum_plus_forward`` forward.cu:570-691 and
``rasterize_sum_plus_backward_kernel`` backward.cu:1168-1350). The CUDA code
staggers shared-memory batches of Gaussians against per-pixel threads and
resolves gradient races with warp reductions + atomicAdd; here the same math
is reshaped into **per-tile batched matmuls** so XLA can drive the MXU, and
gradient accumulation becomes a deterministic scatter-add (strictly better
than the reference's non-deterministic float atomics).

Math (identical to the reference, expressed as linear algebra):

- ``sigma[t,p,k] = phi(p) . w(t,k)`` — the Gaussian quadratic form is linear
  in the pixel features ``phi(p) = [px^2, py^2, px*py, px, py, 1]`` (pixel
  coords tile-local for f32 accuracy), with per-Gaussian coefficients ``w``
  derived from conic + center. One [P,6]x[T,6,K] matmul replaces the scalar
  loop of forward.cu:650-655.
- ``alpha = min(1, opacity * exp(-sigma))``; pairs with ``sigma < 0`` or
  ``alpha < 1/255`` are skipped (forward.cu:656-662); pixel color is the
  masked ``alpha @ colors`` matmul (forward.cu:664-668). Background is NOT
  added (forward.cu:686-688); the output is the raw accumulated sum — the
  model layer clamps to [0,1].
- Backward recomputes sigma in-tile (mirroring the reference's recompute,
  backward.cu:1273-1277) and reduces every per-Gaussian gradient to moment
  matmuls of ``v_sigma`` against ``phi``:
    v_rgb    = sum_p alpha * v_out                     (backward.cu:1300)
    v_alpha  = rgb . v_out                             (backward.cu:1304-1307)
    v_sigma  = -opac * vis * v_alpha                   (backward.cu:1310) —
               NOTE: flows through the saturated min(1,.) unconditionally.
    v_conic  = 0.5 * v_sigma * (dx^2, dx*dy, dy^2)     (backward.cu:1313-1315)
               — the packed off-diagonal carries HALF the true packed
               cotangent; the projection VJP doubles it back (-XGX with both
               off-diagonals populated). See gaussian2d._project_cov2d_bwd.
    v_xy     = v_sigma * (c1*dx + c2*dy, c2*dx + c3*dy) (backward.cu:1316-1318)
    v_opac   = vis * v_alpha                           (backward.cu:1320)
- Per-tile per-Gaussian partials are scatter-added over the binned index map
  (replaces warpSum + atomicAdd, backward.cu:1330-1344).

The per-pixel ``final_idx`` bound the reference tracks (forward.cu:677,
backward.cu:1260-1263) is redundant under this formulation: it equals the last
contributing Gaussian of the single 256-batch, and every Gaussian the backward
would skip via the bound already fails the recomputed sigma/alpha test. The
cap itself lives in the binning stage (binning.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .binning import TileBins
from .gaussian2d import ALPHA_THRESHOLD, BLOCK_H, BLOCK_W, tile_bounds_for


# f32-accurate matmuls: the MXU default rounds operands to bf16, and the
# sigma>=0 gate on the catastrophically-cancelling expanded quadratic then
# drops near-center contributions at random (see kernels/raster_pallas.py).
from .precision import MM_PRECISION  # single policy home


def _tile_geometry(H: int, W: int, block_h: int, block_w: int):
    tb_x, tb_y = tile_bounds_for(H, W, block_h, block_w)
    T = tb_x * tb_y
    P = block_h * block_w
    t_idx = jnp.arange(T, dtype=jnp.int32)
    tx0 = ((t_idx % tb_x) * block_w).astype(jnp.float32)  # tile pixel origin
    ty0 = ((t_idx // tb_x) * block_h).astype(jnp.float32)
    ppx = (jnp.arange(P, dtype=jnp.int32) % block_w).astype(jnp.float32)
    ppy = (jnp.arange(P, dtype=jnp.int32) // block_w).astype(jnp.float32)
    return tb_x, tb_y, T, P, tx0, ty0, ppx, ppy


def _pixel_features(ppx: jax.Array, ppy: jax.Array) -> jax.Array:
    """phi(p) = [px^2, py^2, px*py, px, py, 1] — [P, 6]."""
    return jnp.stack(
        [ppx * ppx, ppy * ppy, ppx * ppy, ppx, ppy, jnp.ones_like(ppx)], axis=-1)


def _quad_coeffs(lmx, lmy, c1, c2, c3):
    """Per-Gaussian quadratic coefficients w s.t. sigma = phi(p) . w — [T, K, 6].

    Expansion of 0.5*c1*dx^2 + 0.5*c3*dy^2 + c2*dx*dy with dx = lmx - px.
    """
    w0 = 0.5 * c1
    w1 = 0.5 * c3
    w2 = c2
    w3 = -(c1 * lmx + c2 * lmy)
    w4 = -(c2 * lmx + c3 * lmy)
    w5 = 0.5 * c1 * lmx * lmx + 0.5 * c3 * lmy * lmy + c2 * lmx * lmy
    return jnp.stack([w0, w1, w2, w3, w4, w5], axis=-1)


def _gather(arr, ids):
    return arr[ids]


def _tiles_to_image(tiles: jax.Array, H: int, W: int, tb_x: int, tb_y: int,
                    block_h: int, block_w: int) -> jax.Array:
    """[T, P, C] -> [H, W, C] (crop away tile padding)."""
    C = tiles.shape[-1]
    img = tiles.reshape(tb_y, tb_x, block_h, block_w, C)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tb_y * block_h, tb_x * block_w, C)
    return img[:H, :W]


def _image_to_tiles(img: jax.Array, tb_x: int, tb_y: int,
                    block_h: int, block_w: int) -> jax.Array:
    """[H, W, C] -> [T, P, C] (zero-pad to the tile grid)."""
    H, W, C = img.shape
    Hp, Wp = tb_y * block_h, tb_x * block_w
    img = jnp.pad(img, ((0, Hp - H), (0, Wp - W), (0, 0)))
    tiles = img.reshape(tb_y, block_h, tb_x, block_w, C)
    return tiles.transpose(0, 2, 1, 3, 4).reshape(tb_y * tb_x, block_h * block_w, C)


def _raster_core(xys, conics, colors, opacity, ids, mask,
                 H, W, block_h, block_w):
    """Shared forward computation; returns intermediates for fwd/bwd."""
    tb_x, tb_y, T, P, tx0, ty0, ppx, ppy = _tile_geometry(H, W, block_h, block_w)
    g_xy = _gather(xys, ids)                         # [T, K, 2]
    g_con = _gather(conics, ids)                     # [T, K, 3]
    g_op = _gather(opacity.reshape(-1), ids)         # [T, K]
    lmx = g_xy[..., 0] - tx0[:, None]
    lmy = g_xy[..., 1] - ty0[:, None]
    c1, c2, c3 = g_con[..., 0], g_con[..., 1], g_con[..., 2]
    w = _quad_coeffs(lmx, lmy, c1, c2, c3)           # [T, K, 6]
    phi = _pixel_features(ppx, ppy)                  # [P, 6]
    sigma = jnp.einsum('pf,tkf->tpk', phi, w, precision=MM_PRECISION)        # [T, P, K]
    vis = jnp.exp(-sigma)
    alpha_raw = g_op[:, None, :] * vis
    alpha = jnp.minimum(1.0, alpha_raw)
    contrib = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & mask[:, None, :]
    weights = jnp.where(contrib, alpha, 0.0)
    return (tb_x, tb_y, phi, lmx, lmy, c1, c2, c3, g_op, vis, alpha,
            contrib, weights)


def _raster_fwd_impl(xys, conics, colors, opacity, ids, mask,
                     H, W, block_h, block_w):
    (tb_x, tb_y, _, _, _, _, _, _, _, _, _, _, weights) = _raster_core(
        xys, conics, colors, opacity, ids, mask, H, W, block_h, block_w)
    g_col = _gather(colors, ids)                     # [T, K, 3]
    tiles = jnp.einsum('tpk,tkc->tpc', weights, g_col, precision=MM_PRECISION)
    return _tiles_to_image(tiles, H, W, tb_x, tb_y, block_h, block_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def rasterize_tiled(xys, conics, colors, opacity, ids, mask,
                    H: int, W: int, block_h: int = BLOCK_H, block_w: int = BLOCK_W):
    """Accumulated-sum rasterization of binned 2D Gaussians -> [H, W, 3].

    ``ids``/``mask`` come from :func:`binning.bin_gaussians` (integer plumbing,
    no gradient). Returns the raw accumulated sum (unclamped, no background),
    matching the reference rasterizer output before the model-level clamp.
    """
    return _raster_fwd_impl(xys, conics, colors, opacity, ids, mask,
                            H, W, block_h, block_w)


def _rasterize_fwd(xys, conics, colors, opacity, ids, mask, H, W, block_h, block_w):
    out = _raster_fwd_impl(xys, conics, colors, opacity, ids, mask,
                           H, W, block_h, block_w)
    return out, (xys, conics, colors, opacity, ids, mask)


def _rasterize_bwd(H, W, block_h, block_w, res, v_img):
    xys, conics, colors, opacity, ids, mask = res
    (tb_x, tb_y, phi, lmx, lmy, c1, c2, c3, g_op, vis, alpha,
     contrib, weights) = _raster_core(xys, conics, colors, opacity, ids, mask,
                                      H, W, block_h, block_w)
    g_col = _gather(colors, ids)

    v_out = _image_to_tiles(v_img, tb_x, tb_y, block_h, block_w)   # [T, P, 3]

    # v_alpha[t,p,k] = rgb_k . v_out_p   (backward.cu:1304-1307)
    v_alpha = jnp.einsum('tpc,tkc->tpk', v_out, g_col, precision=MM_PRECISION)
    # v_rgb[t,k] = sum_p contrib * alpha * v_out  (fac = saturated alpha,
    # backward.cu:1297-1300)
    v_rgb_tile = jnp.einsum('tpk,tpc->tkc', weights, v_out, precision=MM_PRECISION)
    # v_sigma flows through the saturated min unconditionally (backward.cu:1310)
    v_sigma = jnp.where(contrib, -(g_op[:, None, :] * vis) * v_alpha, 0.0)
    v_opac_tile = jnp.sum(jnp.where(contrib, vis * v_alpha, 0.0), axis=1)  # [T, K]

    # Moments of v_sigma against the pixel features: [T, K, 6]
    M = jnp.einsum('tpk,pf->tkf', v_sigma, phi, precision=MM_PRECISION)
    Sxx, Syy, Sxy, Sx, Sy, S1 = (M[..., 0], M[..., 1], M[..., 2],
                                 M[..., 3], M[..., 4], M[..., 5])
    # v_conic with the reference's half-off-diagonal convention
    # (backward.cu:1313-1315): sum_p v_sigma * (0.5 dx^2, 0.5 dx dy, 0.5 dy^2)
    v_con_x = 0.5 * (lmx * lmx * S1 - 2.0 * lmx * Sx + Sxx)
    v_con_y = 0.5 * (lmx * lmy * S1 - lmx * Sy - lmy * Sx + Sxy)
    v_con_z = 0.5 * (lmy * lmy * S1 - 2.0 * lmy * Sy + Syy)
    # v_xy = sum_p v_sigma * (c1 dx + c2 dy, c2 dx + c3 dy) (backward.cu:1316-1318)
    mom_x = lmx * S1 - Sx
    mom_y = lmy * S1 - Sy
    v_xy_x = c1 * mom_x + c2 * mom_y
    v_xy_y = c2 * mom_x + c3 * mom_y

    v_xys, v_conics, v_colors, v_opacity = scatter_tile_grads(
        ids, mask, v_xy_x, v_xy_y, v_con_x, v_con_y, v_con_z,
        v_rgb_tile, v_opac_tile, opacity)

    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (v_xys, v_conics, v_colors, v_opacity, f0(ids), f0(mask))


def scatter_tile_grads(ids, mask, v_xy_x, v_xy_y, v_con_x, v_con_y, v_con_z,
                       v_rgb_tile, v_opac_tile, opacity):
    """Deterministic per-Gaussian gradient accumulation — replaces the
    reference's warpSum + atomicAdd (backward.cu:1330-1344).

    All 9 gradient channels ride ONE scatter-add: on TPU a scatter's cost is
    dominated by the row indexing, not the row width, so fusing the four
    scatters (xy, conic, rgb, opacity) into one [T*K, 9] op is ~4x cheaper
    than issuing them separately.
    """
    fmask = mask.astype(v_rgb_tile.dtype)
    C = v_rgb_tile.shape[-1]
    packed = jnp.concatenate([
        jnp.stack([v_xy_x, v_xy_y, v_con_x, v_con_y, v_con_z], axis=-1),
        v_rgb_tile,
        v_opac_tile[..., None],
    ], axis=-1) * fmask[..., None]                       # [T, K, 6+C]
    width = 6 + C
    num = opacity.reshape(-1).shape[0]
    acc = jnp.zeros((num, width), packed.dtype).at[ids.reshape(-1)].add(
        packed.reshape(-1, width))
    v_xys = acc[:, 0:2]
    v_conics = acc[:, 2:5]
    v_colors = acc[:, 5:5 + C]
    v_opacity = acc[:, 5 + C].reshape(opacity.shape)
    return v_xys, v_conics, v_colors, v_opacity


rasterize_tiled.defvjp(_rasterize_fwd, _rasterize_bwd)
