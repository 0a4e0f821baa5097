"""Dense (binning-free) Pallas forward renderer — the decode/eval fast path.

The binned rasterizer needs a per-step selection (top_k over [T, N]) before
it can gather; for *forward-only* workloads (codec decode, eval FPS) that
selection is pure overhead. This kernel instead sweeps ALL Gaussian chunks
for every tile, testing the projected tile bbox in-kernel:

    member = tile inside bbox_k  (same coverage as the binner)
    sigma  = w_k . phi(p)        (tile-local quadratic, as raster_pallas)
    out   += rgb^T @ where(member & sigma>=0 & alpha>=1/255, alpha, 0)

Inputs are the SAME [N+1, COLS] attribute table as raster_pallas plus the
[N, 4] tile-space bbox — both resident in VMEM and shared by every tile, so
there is no gather at all. Work is O(T * N) but MXU-shaped; at Kodak scale
(1536 tiles x 5120 slots) that is ~8 GFLOP ≈ sub-millisecond, beating
binning + gather + capped kernel for forward-only use.

Pixel output is bit-comparable to the binned renderer whenever no tile
overflows the binned path's cap (the dense path has NO cap — it blends every
member, i.e. the "quality mode" semantics; under the reference's 256-cap
parity mode results differ only in overflowing tiles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# f32-accurate matmuls (MXU default rounds to bf16; see kernels/raster_pallas.py)
from ..core.precision import MM_PRECISION  # single policy home
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.gaussian2d import ALPHA_THRESHOLD, BLOCK_H, BLOCK_W, Projected, tile_bbox, tile_bounds_for
from ..core.render_tiled import _image_to_tiles, _tiles_to_image
from .raster_pallas import COLS, _build_table, _phi_block

KC = 128   # gaussian slots per chunk
TB = 8     # tiles per grid step


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _make_kernel(tb_x: int, block_h: int, block_w: int, tb: int):
    def kernel(table_ref, bbox_ref, phi_ref, out_ref):
        tblk = pl.program_id(0)
        c = pl.program_id(1)
        raw = table_ref[pl.ds(c * KC, KC), :]              # [KC, COLS]
        bbox = bbox_ref[pl.ds(c * KC, KC), :]              # [KC, 4]
        phi = phi_ref[...]                                 # [8, P]

        c1 = raw[:, 0:1]
        c2 = raw[:, 1:2]
        c3 = raw[:, 2:3]
        opac = raw[:, 8:9]
        valid = raw[:, COLS - 1:COLS]

        for i in range(tb):
            t = tblk * tb + i

            @pl.when(c == 0)
            def _(i=i):
                out_ref[i] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

            tx = (t % tb_x).astype(jnp.float32)
            ty = (t // tb_x).astype(jnp.float32)
            member = ((tx >= bbox[:, 0:1]) & (tx < bbox[:, 1:2]) &
                      (ty >= bbox[:, 2:3]) & (ty < bbox[:, 3:4]) &
                      (valid > 0.0))                       # [KC, 1]
            tx0 = tx * block_w
            ty0 = ty * block_h
            lmx = raw[:, 3:4] - tx0
            lmy = raw[:, 4:5] - ty0
            w = jnp.concatenate([
                0.5 * c1, 0.5 * c3, c2,
                -(c1 * lmx + c2 * lmy),
                -(c2 * lmx + c3 * lmy),
                0.5 * c1 * lmx * lmx + 0.5 * c3 * lmy * lmy + c2 * lmx * lmy,
                jnp.zeros_like(c1), jnp.zeros_like(c1),
            ], axis=1)                                     # [KC, 8]
            sigma = jax.lax.dot_general(
                w, phi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=MM_PRECISION)        # [KC, P]
            alpha = jnp.minimum(1.0, opac * jnp.exp(-sigma))
            contrib = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & member
            weights = jnp.where(contrib, alpha, 0.0)
            rgb8 = jnp.concatenate(
                [raw[:, 5:8], jnp.zeros((raw.shape[0], 5), raw.dtype)], axis=1)
            out_ref[i] += jax.lax.dot_general(
                rgb8, weights, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=MM_PRECISION)        # [8, P]

    return kernel


def _make_bwd_kernel(tb_x: int, block_h: int, block_w: int, tb: int):
    """Dense backward: grid (chunks, tile_blocks) with tiles INNER, so each
    Gaussian chunk's gradient payload accumulates across tiles directly in
    its output block — per-Gaussian gradients with NO scatter at all."""

    def kernel(table_ref, bbox_ref, phi_ref, vout_ref, out_ref):
        c = pl.program_id(0)
        tblk = pl.program_id(1)
        raw = table_ref[pl.ds(c * KC, KC), :]              # [KC, COLS]
        bbox = bbox_ref[pl.ds(c * KC, KC), :]              # [KC, 4]
        phi = phi_ref[...]                                 # [8, P]

        c1 = raw[:, 0:1]
        c2 = raw[:, 1:2]
        c3 = raw[:, 2:3]
        opac = raw[:, 8:9]
        valid = raw[:, COLS - 1:COLS]
        rgb = raw[:, 5:8]                                  # [KC, 3]

        @pl.when(tblk == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        acc = jnp.zeros((raw.shape[0], COLS), jnp.float32)
        for i in range(tb):
            t = tblk * tb + i
            tx = (t % tb_x).astype(jnp.float32)
            ty = (t // tb_x).astype(jnp.float32)
            member = ((tx >= bbox[:, 0:1]) & (tx < bbox[:, 1:2]) &
                      (ty >= bbox[:, 2:3]) & (ty < bbox[:, 3:4]) &
                      (valid > 0.0))
            lmx = raw[:, 3:4] - tx * block_w
            lmy = raw[:, 4:5] - ty * block_h
            w = jnp.concatenate([
                0.5 * c1, 0.5 * c3, c2,
                -(c1 * lmx + c2 * lmy),
                -(c2 * lmx + c3 * lmy),
                0.5 * c1 * lmx * lmx + 0.5 * c3 * lmy * lmy + c2 * lmx * lmy,
                jnp.zeros_like(c1), jnp.zeros_like(c1),
            ], axis=1)
            sigma = jax.lax.dot_general(
                w, phi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=MM_PRECISION)
            vis = jnp.exp(-sigma)
            alpha = jnp.minimum(1.0, opac * vis)
            contrib = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & member
            weights = jnp.where(contrib, alpha, 0.0)       # [KC, P]
            v_out = vout_ref[i]                            # [8, P] rows 0..2 live
            # v_alpha[k,p] = rgb_k . v_out_p
            v_alpha = jax.lax.dot_general(
                rgb, v_out[0:3, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=MM_PRECISION)
            v_rgb = jax.lax.dot_general(
                weights, v_out, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=MM_PRECISION)        # [KC, 8] cols 0..2
            v_sigma = jnp.where(contrib, -(opac * vis) * v_alpha, 0.0)
            v_opac = jnp.sum(jnp.where(contrib, vis * v_alpha, 0.0),
                             axis=1, keepdims=True)
            M = jax.lax.dot_general(
                v_sigma, phi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=MM_PRECISION)        # [KC, 8]
            Sxx = M[:, 0:1]; Syy = M[:, 1:2]; Sxy = M[:, 2:3]
            Sx = M[:, 3:4]; Sy = M[:, 4:5]; S1 = M[:, 5:6]
            v_con_x = 0.5 * (lmx * lmx * S1 - 2.0 * lmx * Sx + Sxx)
            v_con_y = 0.5 * (lmx * lmy * S1 - lmx * Sy - lmy * Sx + Sxy)
            v_con_z = 0.5 * (lmy * lmy * S1 - 2.0 * lmy * Sy + Syy)
            mom_x = lmx * S1 - Sx
            mom_y = lmy * S1 - Sy
            v_xy_x = c1 * mom_x + c2 * mom_y
            v_xy_y = c2 * mom_x + c3 * mom_y
            zeros7 = jnp.zeros((raw.shape[0], 7), raw.dtype)
            acc += jnp.concatenate([
                v_xy_x, v_xy_y, v_con_x, v_con_y, v_con_z,
                v_rgb[:, 0:3], v_opac, zeros7,
            ], axis=1)                                     # [KC, COLS]
        out_ref[...] += acc

    return kernel


def _make_sweep_bwd_kernel(tb_x: int, block_h: int, block_w: int, tb: int):
    """Sweep backward: the dense backward (per-chunk gradient accumulation,
    zero scatter) plus the chunk-skip member test — (tile, chunk) pairs with
    no bbox member skip all transcendental/matmul work. With a Morton-kept
    stream this drops the dense backward's O(T*N*P) wall to ~O(members*P),
    making it the fastest exact backward at full N (the binned backward
    pays ~3.5 ms top_k + ~3.6 ms gradient scatter per step at the Kodak
    point)."""

    def kernel(table_ref, bbox_ref, phi_ref, vout_ref, out_ref):
        c = pl.program_id(0)
        tblk = pl.program_id(1)
        raw = table_ref[pl.ds(c * KC, KC), :]              # [KC, COLS]
        bbox = bbox_ref[pl.ds(c * KC, KC), :]              # [KC, 4]
        phi = phi_ref[...]                                 # [8, P]

        c1 = raw[:, 0:1]
        c2 = raw[:, 1:2]
        c3 = raw[:, 2:3]
        opac = raw[:, 8:9]
        valid = raw[:, COLS - 1:COLS]
        rgb = raw[:, 5:8]                                  # [KC, 3]

        @pl.when(tblk == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        for i in range(tb):
            t = tblk * tb + i
            tx = (t % tb_x).astype(jnp.float32)
            ty = (t // tb_x).astype(jnp.float32)
            member = ((tx >= bbox[:, 0:1]) & (tx < bbox[:, 1:2]) &
                      (ty >= bbox[:, 2:3]) & (ty < bbox[:, 3:4]) &
                      (valid > 0.0))

            @pl.when(jnp.any(member))
            def _(i=i, tx=tx, ty=ty, member=member):
                lmx = raw[:, 3:4] - tx * block_w
                lmy = raw[:, 4:5] - ty * block_h
                w = jnp.concatenate([
                    0.5 * c1, 0.5 * c3, c2,
                    -(c1 * lmx + c2 * lmy),
                    -(c2 * lmx + c3 * lmy),
                    0.5 * c1 * lmx * lmx + 0.5 * c3 * lmy * lmy
                    + c2 * lmx * lmy,
                    jnp.zeros_like(c1), jnp.zeros_like(c1),
                ], axis=1)
                sigma = jax.lax.dot_general(
                    w, phi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)
                vis = jnp.exp(-sigma)
                alpha = jnp.minimum(1.0, opac * vis)
                contrib = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & member
                weights = jnp.where(contrib, alpha, 0.0)   # [KC, P]
                v_out = vout_ref[i]                        # [8, P] rows 0..2 live
                v_alpha = jax.lax.dot_general(
                    rgb, v_out[0:3, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)
                v_rgb = jax.lax.dot_general(
                    weights, v_out, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)                # [KC, 8] cols 0..2
                v_sigma = jnp.where(contrib, -(opac * vis) * v_alpha, 0.0)
                v_opac = jnp.sum(jnp.where(contrib, vis * v_alpha, 0.0),
                                 axis=1, keepdims=True)
                M = jax.lax.dot_general(
                    v_sigma, phi, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)                # [KC, 8]
                Sxx = M[:, 0:1]; Syy = M[:, 1:2]; Sxy = M[:, 2:3]
                Sx = M[:, 3:4]; Sy = M[:, 4:5]; S1 = M[:, 5:6]
                v_con_x = 0.5 * (lmx * lmx * S1 - 2.0 * lmx * Sx + Sxx)
                v_con_y = 0.5 * (lmx * lmy * S1 - lmx * Sy - lmy * Sx + Sxy)
                v_con_z = 0.5 * (lmy * lmy * S1 - 2.0 * lmy * Sy + Syy)
                mom_x = lmx * S1 - Sx
                mom_y = lmy * S1 - Sy
                v_xy_x = c1 * mom_x + c2 * mom_y
                v_xy_y = c2 * mom_x + c3 * mom_y
                zeros7 = jnp.zeros((raw.shape[0], 7), raw.dtype)
                out_ref[...] += jnp.concatenate([
                    v_xy_x, v_xy_y, v_con_x, v_con_y, v_con_z,
                    v_rgb[:, 0:3], v_opac, zeros7,
                ], axis=1)                                 # [KC, COLS]

    return kernel


def _dense_prepare(proj, colors, opacity, H, W, block_h, block_w):
    tb_x, tb_y = tile_bounds_for(H, W, block_h, block_w)
    T = tb_x * tb_y
    N = proj.xys.shape[0]
    table = _build_table(proj.xys, proj.conics, colors, opacity)
    table = table.at[:N, COLS - 1].set(proj.valid.astype(jnp.float32))
    xmin, xmax, ymin, ymax = tile_bbox(
        proj.xys, proj.radii.astype(jnp.float32), (tb_x, tb_y), block_h, block_w)
    bbox = jnp.stack([xmin, xmax, ymin, ymax], axis=-1).astype(jnp.float32)
    bbox = jnp.concatenate([bbox, jnp.zeros((1, 4), jnp.float32)], axis=0)
    Np = -(-(N + 1) // KC) * KC
    if Np != N + 1:
        table = jnp.pad(table, ((0, Np - N - 1), (0, 0)))
        bbox = jnp.pad(bbox, ((0, Np - N - 1), (0, 0)))
    tb = TB if T % TB == 0 else 1
    return table, bbox, tb_x, tb_y, T, Np, tb


def dense_backward(proj: Projected, colors: jax.Array, opacity: jax.Array,
                   v_img: jax.Array, H: int, W: int,
                   block_h: int = BLOCK_H, block_w: int = BLOCK_W):
    """Per-Gaussian gradients (v_xys, v_conics, v_colors, v_opacity) for the
    dense renderer — identical math/conventions to raster_pallas's backward
    but with zero scatter."""
    table, bbox, tb_x, tb_y, T, Np, tb = _dense_prepare(
        proj, colors, opacity, H, W, block_h, block_w)
    P = block_h * block_w
    vout_t = jnp.swapaxes(_image_to_tiles(v_img, tb_x, tb_y, block_h, block_w), 1, 2)
    vout_pad = jnp.zeros((T, 8, P), jnp.float32).at[:, 0:3, :].set(vout_t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Np // KC, T // tb),
        in_specs=[
            pl.BlockSpec((Np, COLS), lambda c, tb_i: (0, 0)),
            pl.BlockSpec((Np, 4), lambda c, tb_i: (0, 0)),
            pl.BlockSpec((8, P), lambda c, tb_i: (0, 0)),
            pl.BlockSpec((tb, 8, P), lambda c, tb_i: (tb_i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((KC, COLS), lambda c, tb_i: (c, 0)),
    )
    payload = pl.pallas_call(
        _make_bwd_kernel(tb_x, block_h, block_w, tb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Np, COLS), jnp.float32),
        interpret=_interpret(),
    )(table, bbox, _phi_block(block_h, block_w), vout_pad)

    N = proj.xys.shape[0]
    v_xys = payload[:N, 0:2]
    v_conics = payload[:N, 2:5]
    v_colors = payload[:N, 5:8]
    v_opacity = payload[:N, 8].reshape(opacity.shape)
    return v_xys, v_conics, v_colors, v_opacity


def sweep_backward(proj: Projected, colors: jax.Array, opacity: jax.Array,
                   v_img: jax.Array, H: int, W: int,
                   block_h: int = BLOCK_H, block_w: int = BLOCK_W):
    """Per-Gaussian gradients via the chunk-skip sweep backward — identical
    math/conventions to ``dense_backward`` (zero scatter), with the member
    skip bounding the work by actual coverage."""
    table, bbox, tb_x, tb_y, T, Np, tb = _dense_prepare(
        proj, colors, opacity, H, W, block_h, block_w)
    P = block_h * block_w
    vout_t = jnp.swapaxes(_image_to_tiles(v_img, tb_x, tb_y, block_h, block_w), 1, 2)
    vout_pad = jnp.zeros((T, 8, P), jnp.float32).at[:, 0:3, :].set(vout_t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Np // KC, T // tb),
        in_specs=[
            pl.BlockSpec((Np, COLS), lambda c, tb_i: (0, 0)),
            pl.BlockSpec((Np, 4), lambda c, tb_i: (0, 0)),
            pl.BlockSpec((8, P), lambda c, tb_i: (0, 0)),
            pl.BlockSpec((tb, 8, P), lambda c, tb_i: (tb_i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((KC, COLS), lambda c, tb_i: (c, 0)),
    )
    payload = pl.pallas_call(
        _make_sweep_bwd_kernel(tb_x, block_h, block_w, tb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Np, COLS), jnp.float32),
        interpret=_interpret(),
    )(table, bbox, _phi_block(block_h, block_w), vout_pad)

    N = proj.xys.shape[0]
    v_xys = payload[:N, 0:2]
    v_conics = payload[:N, 2:5]
    v_colors = payload[:N, 5:8]
    v_opacity = payload[:N, 8].reshape(opacity.shape)
    return v_xys, v_conics, v_colors, v_opacity


def rasterize_dense_pallas(proj: Projected, colors: jax.Array,
                           opacity: jax.Array, H: int, W: int,
                           block_h: int = BLOCK_H, block_w: int = BLOCK_W) -> jax.Array:
    """Forward-only dense render -> [H, W, 3] (unclamped accumulated sum)."""
    tb_x, tb_y = tile_bounds_for(H, W, block_h, block_w)
    T = tb_x * tb_y
    N = proj.xys.shape[0]
    P = block_h * block_w

    table = _build_table(proj.xys, proj.conics, colors, opacity)  # [N+1, COLS]
    # mark invalid gaussians in the table's valid column
    table = table.at[:N, COLS - 1].set(proj.valid.astype(jnp.float32))
    xmin, xmax, ymin, ymax = tile_bbox(
        proj.xys, proj.radii.astype(jnp.float32), (tb_x, tb_y), block_h, block_w)
    bbox = jnp.stack([xmin, xmax, ymin, ymax], axis=-1).astype(jnp.float32)
    bbox = jnp.concatenate([bbox, jnp.zeros((1, 4), jnp.float32)], axis=0)

    Np = -(-(N + 1) // KC) * KC
    if Np != N + 1:
        table = jnp.pad(table, ((0, Np - N - 1), (0, 0)))
        bbox = jnp.pad(bbox, ((0, Np - N - 1), (0, 0)))
    tb = TB if T % TB == 0 else 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(T // tb, Np // KC),
        in_specs=[
            pl.BlockSpec((Np, COLS), lambda tb_i, c: (0, 0)),
            pl.BlockSpec((Np, 4), lambda tb_i, c: (0, 0)),
            pl.BlockSpec((8, P), lambda tb_i, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, 8, P), lambda tb_i, c: (tb_i, 0, 0)),
    )
    out = pl.pallas_call(
        _make_kernel(tb_x, block_h, block_w, tb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
        interpret=_interpret(),
    )(table, bbox, _phi_block(block_h, block_w))
    tiles = jnp.swapaxes(out[:, 0:3, :], 1, 2)
    return _tiles_to_image(tiles, H, W, tb_x, tb_y, block_h, block_w)


def _make_sweep_kernel(tb_x: int, block_h: int, block_w: int, tb: int,
                       kc: int, n_chunks: int):
    """Chunk-skip sweep: one grid step per tile block; an in-kernel loop
    walks the Gaussian chunks and SKIPS the sigma/exp/blend work for every
    (tile, chunk) pair with no member (a 4-compare bbox test + an any()
    decides). With a spatially-ordered stream (``morton_perm``) a tile's
    members concentrate in a few chunks, so the transcendental work drops
    from O(T*N*P) to ~O(members*P) — the dense kernel's wall — while the
    per-frame protocol (decode everything from codes, no reuse across
    frames) stays intact: stream order is an encoder-side layout choice,
    exactly like any codec's payload ordering."""

    def kernel(table_ref, bbox_ref, phi_ref, out_ref):
        tblk = pl.program_id(0)
        phi = phi_ref[...]                                 # [8, P]

        for i in range(tb):
            out_ref[i] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

        def body(c, _):
            raw = table_ref[pl.ds(c * kc, kc), :]          # [kc, COLS]
            bbox = bbox_ref[pl.ds(c * kc, kc), :]          # [kc, 4]
            c1 = raw[:, 0:1]
            c2 = raw[:, 1:2]
            c3 = raw[:, 2:3]
            opac = raw[:, 8:9]
            valid = raw[:, COLS - 1:COLS]
            for i in range(tb):
                t = tblk * tb + i
                tx = (t % tb_x).astype(jnp.float32)
                ty = (t // tb_x).astype(jnp.float32)
                member = ((tx >= bbox[:, 0:1]) & (tx < bbox[:, 1:2]) &
                          (ty >= bbox[:, 2:3]) & (ty < bbox[:, 3:4]) &
                          (valid > 0.0))                   # [kc, 1]

                @pl.when(jnp.any(member))
                def _(i=i, tx=tx, ty=ty, member=member):
                    lmx = raw[:, 3:4] - tx * block_w
                    lmy = raw[:, 4:5] - ty * block_h
                    w = jnp.concatenate([
                        0.5 * c1, 0.5 * c3, c2,
                        -(c1 * lmx + c2 * lmy),
                        -(c2 * lmx + c3 * lmy),
                        0.5 * c1 * lmx * lmx + 0.5 * c3 * lmy * lmy
                        + c2 * lmx * lmy,
                        jnp.zeros_like(c1), jnp.zeros_like(c1),
                    ], axis=1)                             # [kc, 8]
                    sigma = jax.lax.dot_general(
                        w, phi, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=MM_PRECISION)            # [kc, P]
                    alpha = jnp.minimum(1.0, opac * jnp.exp(-sigma))
                    contrib = ((sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD)
                               & member)
                    weights = jnp.where(contrib, alpha, 0.0)
                    rgb8 = jnp.concatenate(
                        [raw[:, 5:8], jnp.zeros((raw.shape[0], 5), raw.dtype)],
                        axis=1)
                    out_ref[i] += jax.lax.dot_general(
                        rgb8, weights, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=MM_PRECISION)            # [8, P]

            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    return kernel


def rasterize_sweep_pallas(proj: Projected, colors: jax.Array,
                           opacity: jax.Array, H: int, W: int,
                           block_h: int = BLOCK_H, block_w: int = BLOCK_W,
                           kc: int = 64) -> jax.Array:
    """Forward-only chunk-skip sweep render -> [H, W, 3] (unclamped).

    Same semantics as ``rasterize_dense_pallas`` (cap-free, exact member
    coverage); built for the per-frame codec decode where the binned path's
    per-frame top_k costs ~3.5 ms. Fastest when the Gaussian stream is
    spatially ordered (``core.binning.morton_perm``)."""
    tb_x, tb_y = tile_bounds_for(H, W, block_h, block_w)
    T = tb_x * tb_y
    N = proj.xys.shape[0]
    P = block_h * block_w

    table = _build_table(proj.xys, proj.conics, colors, opacity)
    table = table.at[:N, COLS - 1].set(proj.valid.astype(jnp.float32))
    xmin, xmax, ymin, ymax = tile_bbox(
        proj.xys, proj.radii.astype(jnp.float32), (tb_x, tb_y), block_h, block_w)
    bbox = jnp.stack([xmin, xmax, ymin, ymax], axis=-1).astype(jnp.float32)
    bbox = jnp.concatenate([bbox, jnp.zeros((1, 4), jnp.float32)], axis=0)

    Np = -(-(N + 1) // kc) * kc
    if Np != N + 1:
        table = jnp.pad(table, ((0, Np - N - 1), (0, 0)))
        bbox = jnp.pad(bbox, ((0, Np - N - 1), (0, 0)))
    tb = TB if T % TB == 0 else 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(T // tb,),
        in_specs=[
            pl.BlockSpec((Np, COLS), lambda tb_i: (0, 0)),
            pl.BlockSpec((Np, 4), lambda tb_i: (0, 0)),
            pl.BlockSpec((8, P), lambda tb_i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, 8, P), lambda tb_i: (tb_i, 0, 0)),
    )
    out = pl.pallas_call(
        _make_sweep_kernel(tb_x, block_h, block_w, tb, kc, Np // kc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
        interpret=_interpret(),
    )(table, bbox, _phi_block(block_h, block_w))
    tiles = jnp.swapaxes(out[:, 0:3, :], 1, 2)
    return _tiles_to_image(tiles, H, W, tb_x, tb_y, block_h, block_w)


def _make_range_kernel(tb_x: int, block_h: int, block_w: int, tb: int,
                       kc: int):
    """Chunk-RANGE sweep: like the chunk-skip sweep but with the skip
    decision hoisted OUT of the kernel — per-tile [lo, hi) chunk bounds
    arrive via scalar prefetch (computed in XLA as a masked min/max over
    member ids, no top_k), and each tile fori's only its own range. The
    in-range member test still runs (ranges are conservative), but the
    per-(tile, chunk) any()+branch that made the plain sweep lose 6x on
    v5e (EXPERIMENTS round 4) is gone: visits ~= members' chunk span
    instead of all N/kc chunks."""

    def kernel(lo_ref, hi_ref, table_ref, bbox_ref, phi_ref, out_ref):
        tblk = pl.program_id(0)
        phi = phi_ref[...]                                 # [8, P]

        for i in range(tb):
            t = tblk * tb + i
            out_ref[i] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)
            tx = (t % tb_x).astype(jnp.float32)
            ty = (t // tb_x).astype(jnp.float32)

            def body(c, _, i=i, tx=tx, ty=ty):
                raw = table_ref[pl.ds(c * kc, kc), :]      # [kc, COLS]
                bbox = bbox_ref[pl.ds(c * kc, kc), :]      # [kc, 4]
                c1 = raw[:, 0:1]
                c2 = raw[:, 1:2]
                c3 = raw[:, 2:3]
                opac = raw[:, 8:9]
                valid = raw[:, COLS - 1:COLS]
                member = ((tx >= bbox[:, 0:1]) & (tx < bbox[:, 1:2]) &
                          (ty >= bbox[:, 2:3]) & (ty < bbox[:, 3:4]) &
                          (valid > 0.0))                   # [kc, 1]
                lmx = raw[:, 3:4] - tx * block_w
                lmy = raw[:, 4:5] - ty * block_h
                w = jnp.concatenate([
                    0.5 * c1, 0.5 * c3, c2,
                    -(c1 * lmx + c2 * lmy),
                    -(c2 * lmx + c3 * lmy),
                    0.5 * c1 * lmx * lmx + 0.5 * c3 * lmy * lmy
                    + c2 * lmx * lmy,
                    jnp.zeros_like(c1), jnp.zeros_like(c1),
                ], axis=1)                                 # [kc, 8]
                sigma = jax.lax.dot_general(
                    w, phi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)                # [kc, P]
                alpha = jnp.minimum(1.0, opac * jnp.exp(-sigma))
                contrib = ((sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD)
                           & member)
                weights = jnp.where(contrib, alpha, 0.0)
                rgb8 = jnp.concatenate(
                    [raw[:, 5:8], jnp.zeros((raw.shape[0], 5), raw.dtype)],
                    axis=1)
                out_ref[i] += jax.lax.dot_general(
                    rgb8, weights, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)                # [8, P]
                return 0

            jax.lax.fori_loop(lo_ref[t], hi_ref[t], body, 0)

    return kernel


def rasterize_range_pallas(proj: Projected, colors: jax.Array,
                           opacity: jax.Array, H: int, W: int,
                           block_h: int = BLOCK_H, block_w: int = BLOCK_W,
                           kc: int = 64) -> jax.Array:
    """Forward-only chunk-range sweep render -> [H, W, 3] (unclamped).

    Exact for any stream order (the range is a conservative superset and
    the kernel re-tests membership); fastest when the stream is
    Morton-ordered (``core.binning.morton_perm``) so each tile's member ids
    are nearly contiguous and [lo, hi) spans a handful of chunks."""
    tb_x, tb_y = tile_bounds_for(H, W, block_h, block_w)
    T = tb_x * tb_y
    N = proj.xys.shape[0]
    P = block_h * block_w

    table = _build_table(proj.xys, proj.conics, colors, opacity)
    table = table.at[:N, COLS - 1].set(proj.valid.astype(jnp.float32))
    xmin, xmax, ymin, ymax = tile_bbox(
        proj.xys, proj.radii.astype(jnp.float32), (tb_x, tb_y), block_h, block_w)
    bbox = jnp.stack([xmin, xmax, ymin, ymax], axis=-1).astype(jnp.float32)
    bbox = jnp.concatenate([bbox, jnp.zeros((1, 4), jnp.float32)], axis=0)

    # per-tile member-id ranges in XLA: a [T, N] bool + masked min/max
    # reduces — O(T*N) fused elementwise, no top_k, no sort
    tx = jnp.arange(tb_x, dtype=jnp.float32)
    ty = jnp.arange(tb_y, dtype=jnp.float32)
    in_x = (tx[None, :, None] >= xmin[None, None, :]) & \
           (tx[None, :, None] < xmax[None, None, :])
    in_y = (ty[:, None, None] >= ymin[None, None, :]) & \
           (ty[:, None, None] < ymax[None, None, :])
    member = (in_x & in_y & proj.valid[None, None, :]).reshape(T, N)
    ids = jnp.arange(N, dtype=jnp.int32)[None, :]
    idx_min = jnp.min(jnp.where(member, ids, N), axis=1)        # [T]
    idx_max = jnp.max(jnp.where(member, ids, -1), axis=1)       # [T]
    lo = jnp.where(idx_max >= 0, idx_min // kc, 0).astype(jnp.int32)
    hi = jnp.where(idx_max >= 0, idx_max // kc + 1, 0).astype(jnp.int32)

    Np = -(-(N + 1) // kc) * kc
    if Np != N + 1:
        table = jnp.pad(table, ((0, Np - N - 1), (0, 0)))
        bbox = jnp.pad(bbox, ((0, Np - N - 1), (0, 0)))
    tb = TB if T % TB == 0 else 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T // tb,),
        in_specs=[
            pl.BlockSpec((Np, COLS), lambda tb_i, lo, hi: (0, 0)),
            pl.BlockSpec((Np, 4), lambda tb_i, lo, hi: (0, 0)),
            pl.BlockSpec((8, P), lambda tb_i, lo, hi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, 8, P), lambda tb_i, lo, hi: (tb_i, 0, 0)),
    )
    out = pl.pallas_call(
        _make_range_kernel(tb_x, block_h, block_w, tb, kc),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
        interpret=_interpret(),
    )(lo, hi, table, bbox, _phi_block(block_h, block_w))
    tiles = jnp.swapaxes(out[:, 0:3, :], 1, 2)
    return _tiles_to_image(tiles, H, W, tb_x, tb_y, block_h, block_w)


def _mk_proj(xys, conics, radii, valid):
    return Projected(xys=xys, conics=conics, radii=radii,
                     num_tiles_hit=jnp.zeros_like(radii), valid=valid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def rasterize_dense(xys, conics, colors, opacity, radii, valid,
                    H: int, W: int, block_h: int = BLOCK_H, block_w: int = BLOCK_W):
    """Differentiable dense rasterization (no binning, no per-tile cap).

    Same gradient conventions as rasterize_pallas/rasterize_tiled (reference
    pass-through min and half-off-diagonal v_conic); per-Gaussian gradients
    accumulate in-kernel with no scatter. ``radii``/``valid`` are integer/bool
    plumbing from the projection (no gradient).
    """
    return rasterize_dense_pallas(_mk_proj(xys, conics, radii, valid),
                                  colors, opacity, H, W, block_h, block_w)


def _rd_fwd(xys, conics, colors, opacity, radii, valid, H, W, block_h, block_w):
    out = rasterize_dense_pallas(_mk_proj(xys, conics, radii, valid),
                                 colors, opacity, H, W, block_h, block_w)
    return out, (xys, conics, colors, opacity, radii, valid)


def _rd_bwd(H, W, block_h, block_w, res, v_img):
    import numpy as np

    xys, conics, colors, opacity, radii, valid = res
    v_xys, v_conics, v_colors, v_opacity = dense_backward(
        _mk_proj(xys, conics, radii, valid), colors, opacity, v_img,
        H, W, block_h, block_w)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (v_xys, v_conics, v_colors, v_opacity, f0(radii), f0(valid))


rasterize_dense.defvjp(_rd_fwd, _rd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def rasterize_sweep(xys, conics, colors, opacity, radii, valid,
                    H: int, W: int, block_h: int = BLOCK_H, block_w: int = BLOCK_W):
    """Differentiable chunk-skip sweep rasterization.

    Semantics identical to ``rasterize_dense`` (cap-free exact member
    coverage, reference gradient conventions); both directions skip
    (tile, chunk) pairs with no member, so fwd+bwd cost tracks actual
    coverage instead of T*N — no binning, no gather, no gradient scatter.
    Keep the stream Morton-ordered (``core.binning.morton_perm``) for the
    fast path; any order is correct."""
    return rasterize_sweep_pallas(_mk_proj(xys, conics, radii, valid),
                                  colors, opacity, H, W, block_h, block_w)


def _rs_fwd(xys, conics, colors, opacity, radii, valid, H, W, block_h, block_w):
    out = rasterize_sweep_pallas(_mk_proj(xys, conics, radii, valid),
                                 colors, opacity, H, W, block_h, block_w)
    return out, (xys, conics, colors, opacity, radii, valid)


def _rs_bwd(H, W, block_h, block_w, res, v_img):
    import numpy as np

    xys, conics, colors, opacity, radii, valid = res
    v_xys, v_conics, v_colors, v_opacity = sweep_backward(
        _mk_proj(xys, conics, radii, valid), colors, opacity, v_img,
        H, W, block_h, block_w)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (v_xys, v_conics, v_colors, v_opacity, f0(radii), f0(valid))


rasterize_sweep.defvjp(_rs_fwd, _rs_bwd)
