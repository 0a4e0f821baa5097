"""Depth-sorted alpha-compositing rasterizer (legacy 3DGS blend).

Reference: ``rasterize_gaussians`` (gsplat/gsplat/rasterize.py) over the CUDA
``rasterize_forward`` kernel (forward.cu:322-450): front-to-back transmittance
compositing

    alpha = min(0.999, opac * exp(-sigma));  skip alpha < 1/255
    next_T = T * (1 - alpha);  STOP when next_T <= 1e-4 (early-out)
    pix += color * alpha * T;  final += T_final * background

TPU-native formulation: Gaussians are globally argsorted by depth, so the
binner's index-order lists are depth-ordered; per tile the exclusive prefix
product of (1 - alpha) along the member axis gives every T in one
``cumprod`` — no sequential loop. The early-out becomes a mask on
``T > 1e-4`` (identical output: contributions after the stop are exactly the
ones the reference never adds).

XLA implementation (the 3D path is a capability, not a hot path; a Pallas
variant can follow the sum kernel's layout if needed).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# f32-accurate matmuls (MXU default is bf16; see kernels/raster_pallas.py)
from .precision import MM_PRECISION  # single policy home

from .binning import TileBins, bin_gaussians
from .gaussian2d import ALPHA_THRESHOLD, BLOCK_H, BLOCK_W, Projected, tile_bounds_for
from .render_tiled import (
    _image_to_tiles,
    _pixel_features,
    _quad_coeffs,
    _tile_geometry,
    _tiles_to_image,
)


def depth_order_projection(proj: Projected, depths: jax.Array):
    """Permute a projection into ascending-depth order so index-order binning
    becomes depth-order binning (replaces the reference's isect-id sort by
    ``tile << 32 | depth_bits``, forward.cu:141-206)."""
    order = jnp.argsort(jnp.where(proj.valid, depths, jnp.inf), stable=True)
    perm = lambda a: a[order]
    return Projected(xys=perm(proj.xys), conics=perm(proj.conics),
                     radii=perm(proj.radii),
                     num_tiles_hit=perm(proj.num_tiles_hit),
                     valid=perm(proj.valid)), order


def rasterize_alpha_tiled(proj_sorted: Projected, colors_sorted: jax.Array,
                          opacity_sorted: jax.Array, H: int, W: int,
                          background: Optional[jax.Array] = None,
                          tile_cap: int = 256,
                          block_h: int = BLOCK_H, block_w: int = BLOCK_W,
                          return_alpha: bool = False):
    """Render [H, W, 3] with true alpha compositing. Inputs must already be
    depth-ordered (see :func:`depth_order_projection`)."""
    if background is None:
        background = jnp.ones((3,), jnp.float32)
    bins = bin_gaussians(proj_sorted, H, W, cap=tile_cap,
                         block_h=block_h, block_w=block_w)
    tb_x, tb_y, T, P, tx0, ty0, ppx, ppy = _tile_geometry(H, W, block_h, block_w)
    ids, mask = bins.ids, bins.mask
    g_xy = proj_sorted.xys[ids]
    g_con = proj_sorted.conics[ids]
    g_col = colors_sorted[ids]
    g_op = opacity_sorted.reshape(-1)[ids]
    lmx = g_xy[..., 0] - tx0[:, None]
    lmy = g_xy[..., 1] - ty0[:, None]
    w = _quad_coeffs(lmx, lmy, g_con[..., 0], g_con[..., 1], g_con[..., 2])
    phi = _pixel_features(ppx, ppy)
    sigma = jnp.einsum('pf,tkf->tpk', phi, w, precision=MM_PRECISION)              # [T, P, K]
    # reference alpha clamp at 0.999 (forward.cu:399) and 1/255 skip (:401)
    alpha = jnp.minimum(0.999, g_op[:, None, :] * jnp.exp(-sigma))
    alpha = jnp.where((alpha >= ALPHA_THRESHOLD) & mask[:, None, :], alpha, 0.0)
    # exclusive prefix transmittance along the (depth-ordered) member axis
    one_minus = 1.0 - alpha
    T_incl = jnp.cumprod(one_minus, axis=-1)
    T_excl = jnp.concatenate(
        [jnp.ones_like(T_incl[..., :1]), T_incl[..., :-1]], axis=-1)
    # early-out: the reference stops BEFORE compositing a gaussian whose
    # next_T <= 1e-4 (forward.cu:414-419): contribution allowed iff T > 1e-4
    # after the blend would still proceed — i.e. contribute while
    # T_excl * (1-alpha) > 1e-4.
    live = (T_excl * one_minus) > 1e-4
    weights = jnp.where(live, alpha * T_excl, 0.0)         # [T, P, K]
    tiles = jnp.einsum('tpk,tkc->tpc', weights, g_col, precision=MM_PRECISION)
    # T after the last composited gaussian: product over live entries only
    T_final = jnp.prod(jnp.where(live, one_minus, 1.0), axis=-1)
    tiles = tiles + T_final[..., None] * background[None, None, :]
    img = _tiles_to_image(tiles, H, W, tb_x, tb_y, block_h, block_w)
    if return_alpha:
        alpha_img = _tiles_to_image((1.0 - T_final)[..., None], H, W,
                                    tb_x, tb_y, block_h, block_w)[..., 0]
        return img, alpha_img
    return img
