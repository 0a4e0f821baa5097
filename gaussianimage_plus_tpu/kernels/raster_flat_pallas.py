"""Flattened forward-only Pallas rasterizer: the decode-FPS kernel.

The chunked kernel in ``raster_pallas.py`` predicates per-tile work with
``pl.when`` inside a Python loop over the tile block — correct, and right for
training where chunk-skipping pays, but the predicated mini-ops serialize:
at decode occupancy (cap ~32 after trim) the kernel is scalar-overhead-bound
(~0.78 ms/frame measured on one v5e core, ~25x off speed-of-light).

Decode renders a STATIC prepared stream (see ``raster_pallas.Prepared``), so
this kernel drops all predication and flattens the whole tile block into one
dense batch:

- ``raw`` block [tb, K, COLS] is viewed as [tb*K, COLS]; per-row tile origins
  come from an iota — every Gaussian row of every tile in the block is one
  sublane row.
- sigma for ALL rows against the 256 tile-local pixels is a single
  [tb*K, 8] @ [8, P] MXU matmul (the phi trick of core/render_tiled.py).
- the per-tile color accumulation is a reshape [tb, K, P] + sum over K on the
  VPU — no matmul loop, no predication; empty slots carry the zero sentinel
  row (valid=0) and contribute exactly 0.

Same blending math as the reference rasterizer (forward.cu:650-672): this is
bit-identical to ``raster_pallas`` forward output (both accumulate per tile
in slot order on f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..core.gaussian2d import ALPHA_THRESHOLD, BLOCK_H, BLOCK_W, tile_bounds_for
from ..core.render_tiled import _tiles_to_image
from .raster_pallas import COLS, MM_PRECISION, _interpret, _phi_block


def _make_flat_fwd_kernel(tb_x: int, block_h: int, block_w: int,
                          K: int, tb: int):
    def kernel(raw_ref, phi_ref, out_ref):
        pid = pl.program_id(0)
        raw = raw_ref[...].reshape(tb * K, COLS)
        phi = phi_ref[...]                                   # [8, P]
        rows = jax.lax.broadcasted_iota(jnp.int32, (tb * K, 1), 0)
        t = pid * tb + rows // K
        tx0 = ((t % tb_x) * block_w).astype(jnp.float32)
        ty0 = ((t // tb_x) * block_h).astype(jnp.float32)
        c1 = raw[:, 0:1]
        c2 = raw[:, 1:2]
        c3 = raw[:, 2:3]
        lmx = raw[:, 3:4] - tx0
        lmy = raw[:, 4:5] - ty0
        opac = raw[:, 8:9]
        valid = raw[:, COLS - 1:COLS]
        w = jnp.concatenate([
            0.5 * c1, 0.5 * c3, c2,
            -(c1 * lmx + c2 * lmy),
            -(c2 * lmx + c3 * lmy),
            0.5 * c1 * lmx * lmx + 0.5 * c3 * lmy * lmy + c2 * lmx * lmy,
            jnp.zeros_like(c1), jnp.zeros_like(c1),
        ], axis=1)                                           # [tb*K, 8]
        sigma = jax.lax.dot_general(                         # [tb*K, P]
            w, phi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=MM_PRECISION)
        vis = jnp.exp(-sigma)
        alpha = jnp.minimum(1.0, opac * vis)
        contrib = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & (valid > 0.0)
        weights = jnp.where(contrib, alpha, 0.0)             # [tb*K, P]
        P = phi.shape[1]
        chans = [(weights * raw[:, 5 + c:6 + c]).reshape(tb, K, P).sum(axis=1)
                 for c in range(3)]                          # 3 x [tb, P]
        out = jnp.stack(chans, axis=1)                       # [tb, 3, P]
        out_ref[...] = jnp.concatenate(
            [out, jnp.zeros((tb, 5, P), out.dtype)], axis=1)

    return kernel


def rasterize_prepared_flat(prep, H: int, W: int,
                            block_h: int = BLOCK_H, block_w: int = BLOCK_W,
                            tiles_per_step: int = 32) -> jax.Array:
    """Forward render from a ``Prepared`` block table (decode fast path).

    ``tiles_per_step``: tiles per grid step; 8-64 all measure within ~10% on
    a v5e (3.7k FPS at the Kodak point, cap 32); larger blocks risk the
    scoped-VMEM limit. Falls back to the largest divisor of T."""
    raw, _counts = prep
    T, K, _ = raw.shape
    tb_x, tb_y = tile_bounds_for(H, W, block_h, block_w)
    P = block_h * block_w
    tb = next(d for d in range(min(tiles_per_step, T), 0, -1) if T % d == 0)
    phi = _phi_block(block_h, block_w)
    out = pl.pallas_call(
        _make_flat_fwd_kernel(tb_x, block_h, block_w, K, tb),
        grid=(T // tb,),
        in_specs=[
            pl.BlockSpec((tb, K, COLS), lambda i: (i, 0, 0)),
            pl.BlockSpec((8, P), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, 8, P), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
        interpret=_interpret(),
    )(raw, phi)
    tiles = jnp.swapaxes(out[:, 0:3, :], 1, 2)
    return _tiles_to_image(tiles, H, W, tb_x, tb_y, block_h, block_w)
