"""Chunk-LIST Pallas rasterizer pair — selection-free fwd+bwd at member cost.

The round-4/5 kernel family progression (EXPERIMENTS rounds 3-5):

- binned (default): exact, but pays ~3.5 ms ``lax.top_k`` + ~3.6 ms gradient
  scatter per step at the Kodak point — ~70% of the step is selection
  machinery, not rendering.
- sweep: in-kernel per-(tile, chunk) member test — the any()+branch per
  visit loses 6x on v5e.
- range: per-tile single interval [lo, hi) of chunk ids via scalar
  prefetch — no in-kernel branching, but ONE interval over Morton ids is
  conservative: measured ~2.4x more chunk visits than actual member chunks
  (935 candidate rows/tile vs 58.5 members on kodim01).

This module replaces the interval with the exact per-tile member-chunk
LIST:

  forward   grid (T/tb,): tile t fori's j in [0, cnt[t]) over its own
            compacted chunk-id list (scalar prefetch) — visits == member
            chunks. The list is computed in XLA by a top_k over the
            [T, n_chunks] chunk-membership matrix — n_chunks = N/kc is
            ~64-80x narrower than the [T, N] matrix the binned path top_k's
            over, so selection cost all but vanishes. A residual interval
            [lo2, hi2) (chunks past a static list width LMAX) keeps the
            kernel exact for ANY occupancy; it is empty in practice.

  backward  grid (n_chunks, MTB): chunk c's gradient payload accumulates
            across the tile-BLOCKS that intersect it — the per-chunk
            tile-block list arrives via scalar prefetch and indexes the
            v_out BLOCK SPEC directly (prefetch-indexed index_map), so the
            cotangent image streams block-by-block with no full-image VMEM
            residency and the per-Gaussian gradients need no scatter at
            all. Steps past the list clamp to the last block (no refetch)
            and skip compute. If any chunk's tile-block count exceeds the
            static MTB, the whole call falls back to the O(T*N)
            ``dense_backward`` via ``lax.cond`` — exactness is
            unconditional; the fallback never fires at sane widths.

Membership semantics, blending math, and gradient conventions are identical
to kernels/raster_pallas.py (reference forward.cu:570-691 /
backward.cu:1168-1350 semantics, cap-free "quality mode" like the dense
family). Fastest when the stream is Morton-ordered
(``core.binning.morton_perm``) so member chunks per tile stay few; exact in
any order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.precision import MM_PRECISION  # single policy home
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.gaussian2d import (ALPHA_THRESHOLD, BLOCK_H, BLOCK_W, Projected,
                               tile_bbox, tile_bounds_for)
from ..core.render_tiled import _image_to_tiles, _tiles_to_image
from .raster_pallas import COLS, _build_table, _phi_block
from .raster_dense_pallas import dense_backward

KC = 64     # gaussian slots per chunk
KC_T = 128  # chunk slots for the lane-major (list_t) layout: full vreg width
TB = 8      # tiles per fwd grid step
TB_T = 16   # tiles per grid step, lane-major fwd (measured best at Kodak:
            # 1.43 ms full decode vs 2.25 at tb=8 — r5_perf 2026-08-20)
LMAX = 16   # static per-tile chunk-list width (residual interval beyond)
MTB = 64    # static per-chunk tile-block-list width (cond fallback beyond)
LMAX_BIG = 8   # list width for big tile grids (see _default_lmax)
BIG_T = 4096   # tile-count threshold between the two lmax defaults


def _default_lmax(H, W, block_h, block_w):
    """Grid-aware default list width: 16 at Kodak-like grids, 8 for big
    grids (T >= 4096) — keeps the flat SMEM prefetch lists ~0.5 MB at the
    2K point (T=10752) and matches the hardware-verified 2K config
    (train_list_t_2k 51.46 ms, r5_perf 2026-08-20). The residual interval
    keeps any width exact."""
    tb_x, tb_y = tile_bounds_for(H, W, block_h, block_w)
    return LMAX_BIG if tb_x * tb_y >= BIG_T else LMAX


VMEM_LIMIT = 64 * 1024 * 1024  # Mosaic per-kernel VMEM budget (headroom for
#   big-point forwards, which hold the whole [Np, COLS] table in VMEM; v5e
#   has 128 MiB). NOTE this does NOT govern XLA's separate 16 MiB
#   scoped-vmem STACK cap: at the 2K point (T=10752) the row-major list
#   bwd's [Np, COLS=16] output pads 16 -> 128 lanes under T(8,128) and blows
#   that cap (17.16 MiB, measured r5) — use the lane-major list_t backend
#   there, whose [nch, COLS, kc=128] output has a native 128 minor dim.


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _cparams():
    """Mosaic compiler params (None under CPU interpret mode)."""
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


def _table_bbox(proj, colors, opacity, H, W, block_h, block_w, kc):
    """Shared attribute-table + tile-space-bbox prep, padded to a chunk
    multiple (same construction as the dense/sweep/range family)."""
    tb_x, tb_y = tile_bounds_for(H, W, block_h, block_w)
    T = tb_x * tb_y
    N = proj.xys.shape[0]
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
    member = _member_matrix(xmin, xmax, ymin, ymax, proj.valid, tb_x, tb_y)
    return table, bbox, member, tb_x, tb_y, T, N, Np


def _member_matrix(xmin, xmax, ymin, ymax, valid, tb_x, tb_y):
    """[T, N] tile-membership bools — cheap fused compare/reduce, no sort.

    Row t = ty * tb_x + tx, matching the kernels' tile decomposition."""
    tx = jnp.arange(tb_x, dtype=jnp.float32)
    ty = jnp.arange(tb_y, dtype=jnp.float32)
    in_x = (tx[None, :, None] >= xmin[None, None, :]) & \
           (tx[None, :, None] < xmax[None, None, :])
    in_y = (ty[:, None, None] >= ymin[None, None, :]) & \
           (ty[:, None, None] < ymax[None, None, :])
    return (in_x & in_y & valid[None, None, :]).reshape(tb_x * tb_y, -1)


def _chunk_lists(member, N, Np, kc, lmax):
    """Per-tile compacted member-chunk lists + residual interval.

    Returns (lst [T, lmax] int32, cnt [T], lo2 [T], hi2 [T]): tile t's
    member chunks are exactly lst[t, :cnt[t]] ∪ {c in [lo2[t], hi2[t])
    with a member} — the interval is nonempty only when the tile has more
    than lmax member chunks (kernel re-tests membership, so conservative
    interval chunks are exact)."""
    T = member.shape[0]
    nch = Np // kc
    if member.shape[1] != Np:
        member = jnp.pad(member, ((0, 0), (0, Np - member.shape[1])))
    mc = member.reshape(T, nch, kc).any(-1)                # [T, nch]
    ids_c = jnp.arange(nch, dtype=jnp.int32)
    cnt_full = jnp.sum(mc, axis=-1, dtype=jnp.int32)
    k_sel = min(lmax + 1, nch)
    topv, _ = jax.lax.top_k(jnp.where(mc, nch - ids_c, 0), k_sel)
    lids = jnp.where(topv > 0, nch - topv, 0).astype(jnp.int32)  # ascending
    lst = lids[:, :lmax]
    if lst.shape[1] < lmax:
        lst = jnp.pad(lst, ((0, 0), (0, lmax - lst.shape[1])))
    cnt = jnp.minimum(cnt_full, lmax)
    over = cnt_full > lmax
    if k_sel == lmax + 1:
        lo2 = jnp.where(over, lids[:, lmax], 0)
    else:  # lmax >= nch: a tile can never overflow the list
        lo2 = jnp.zeros((T,), jnp.int32)
    hi2 = jnp.where(over, jnp.max(jnp.where(mc, ids_c, -1), axis=-1) + 1, 0)
    return lst, cnt, lo2.astype(jnp.int32), hi2.astype(jnp.int32)


def _fwd_body(raw, bbox, phi, tx, ty, block_h, block_w):
    """One (tile, chunk) forward contribution [8, P] — identical blending
    math to the dense/sweep/range kernels (reference forward.cu:570-691)."""
    c1 = raw[:, 0:1]
    c2 = raw[:, 1:2]
    c3 = raw[:, 2:3]
    opac = raw[:, 8:9]
    valid = raw[:, COLS - 1:COLS]
    member = ((tx >= bbox[:, 0:1]) & (tx < bbox[:, 1:2]) &
              (ty >= bbox[:, 2:3]) & (ty < bbox[:, 3:4]) &
              (valid > 0.0))                               # [kc, 1]
    lmx = raw[:, 3:4] - tx * block_w
    lmy = raw[:, 4:5] - ty * block_h
    w = jnp.concatenate([
        0.5 * c1, 0.5 * c3, c2,
        -(c1 * lmx + c2 * lmy),
        -(c2 * lmx + c3 * lmy),
        0.5 * c1 * lmx * lmx + 0.5 * c3 * lmy * lmy + c2 * lmx * lmy,
        jnp.zeros_like(c1), jnp.zeros_like(c1),
    ], axis=1)                                             # [kc, 8]
    sigma = jax.lax.dot_general(
        w, phi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=MM_PRECISION)                            # [kc, P]
    alpha = jnp.minimum(1.0, opac * jnp.exp(-sigma))
    contrib = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & member
    weights = jnp.where(contrib, alpha, 0.0)
    rgb8 = jnp.concatenate(
        [raw[:, 5:8], jnp.zeros((raw.shape[0], 5), raw.dtype)], axis=1)
    return jax.lax.dot_general(
        rgb8, weights, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=MM_PRECISION)                            # [8, P]


# SMEM is 1.0 MB and 2D SMEM prefetch arrays pad their minor dimension to
# 128 elements (512 B per row — measured: s32[2048,16] allocated 1.00 MB
# and broke every 2K-point forward compile). All prefetch LISTS are
# therefore passed FLAT (1D, unpadded) with the flat index computed in the
# kernel; striping remains as a safety valve for truly huge tile counts.
SMEM_LIST_ELEMS = 98304  # 384 KB of flat s32 per stripe


def _stripe_tiles(T: int, tbs: int, lmax: int) -> int:
    per = max(1, SMEM_LIST_ELEMS // max(lmax, 1))
    per = max(tbs, (per // tbs) * tbs)
    return min(T, per)


def _make_list_kernel(tb_x: int, block_h: int, block_w: int, tb: int,
                      kc: int, lmax: int, t0: int = 0):
    def kernel(lst_ref, cnt_ref, lo2_ref, hi2_ref,
               table_ref, bbox_ref, phi_ref, out_ref):
        tblk = pl.program_id(0)
        phi = phi_ref[...]                                 # [8, P]

        for i in range(tb):
            t = tblk * tb + i                              # stripe-local
            tg = t + t0                                    # global tile id
            out_ref[i] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)
            tx = (tg % tb_x).astype(jnp.float32)
            ty = (tg // tb_x).astype(jnp.float32)

            def visit(c, i=i, tx=tx, ty=ty):
                raw = table_ref[pl.ds(c * kc, kc), :]      # [kc, COLS]
                bbox = bbox_ref[pl.ds(c * kc, kc), :]      # [kc, 4]
                out_ref[i] += _fwd_body(raw, bbox, phi, tx, ty,
                                        block_h, block_w)

            def body_list(j, _, t=t, visit=visit):
                visit(lst_ref[t * lmax + j])               # flat 1D list
                return 0

            def body_rng(c, _, visit=visit):
                visit(c)
                return 0

            jax.lax.fori_loop(0, cnt_ref[t], body_list, 0)
            jax.lax.fori_loop(lo2_ref[t], hi2_ref[t], body_rng, 0)

    return kernel


def rasterize_list_pallas(proj: Projected, colors: jax.Array,
                          opacity: jax.Array, H: int, W: int,
                          block_h: int = BLOCK_H, block_w: int = BLOCK_W,
                          kc: int = None, lmax: int = None,
                          tb: int = None) -> jax.Array:
    """Forward-only chunk-list render -> [H, W, 3] (unclamped).

    Exact for any stream order and any occupancy (residual interval);
    fastest when the stream is Morton-ordered so per-tile member chunks
    stay few. Selection cost is a top_k over [T, N/kc] — negligible next
    to the binned path's [T, N] one. ``kc``/``lmax``/``tb`` default to the
    module knobs KC/LMAX/TB (resolved at call time so shape sweeps can
    retune them)."""
    kc = KC if kc is None else kc
    lmax = _default_lmax(H, W, block_h, block_w) if lmax is None else lmax
    tb = TB if tb is None else tb
    table, bbox, member, tb_x, tb_y, T, N, Np = _table_bbox(
        proj, colors, opacity, H, W, block_h, block_w, kc)
    P = block_h * block_w
    lst, cnt, lo2, hi2 = _chunk_lists(member, N, Np, kc, lmax)
    tbs = tb if T % tb == 0 else 1
    phi = _phi_block(block_h, block_w)

    stripe = _stripe_tiles(T, tbs, lmax)
    outs = []
    for s0 in range(0, T, stripe):
        Ts = min(stripe, T - s0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(Ts // tbs,),
            in_specs=[
                pl.BlockSpec((Np, COLS), lambda tb_i, *_: (0, 0)),
                pl.BlockSpec((Np, 4), lambda tb_i, *_: (0, 0)),
                pl.BlockSpec((8, P), lambda tb_i, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tbs, 8, P),
                                   lambda tb_i, *_: (tb_i, 0, 0)),
        )
        outs.append(pl.pallas_call(
            _make_list_kernel(tb_x, block_h, block_w, tbs, kc, lmax, t0=s0),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Ts, 8, P), jnp.float32),
            compiler_params=_cparams(),
            interpret=_interpret(),
        )(lst[s0:s0 + Ts].reshape(-1), cnt[s0:s0 + Ts], lo2[s0:s0 + Ts],
          hi2[s0:s0 + Ts], table, bbox, phi))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    tiles = jnp.swapaxes(out[:, 0:3, :], 1, 2)
    return _tiles_to_image(tiles, H, W, tb_x, tb_y, block_h, block_w)


def _make_list_t_kernel(tb_x: int, block_h: int, block_w: int, tb: int,
                        kc: int, lmax: int, t0: int = 0):
    """Lane-major list forward: the chunked attribute table arrives as
    [nch, COLS, kc] (gaussians on the LANE axis), so every per-gaussian
    scalar expression is a [1, kc] full-lane op instead of a [kc, 1]
    one-lane-per-sublane op — the v1 body spends roughly half its VPU
    instructions on that narrow column math. sigma is computed transposed
    ([P, kc]) so the opacity/member broadcasts stay lane-major with no
    in-kernel transposes; blending math identical to _fwd_body."""

    def kernel(lst_ref, cnt_ref, lo2_ref, hi2_ref,
               table_ref, bbox_ref, phi_ref, out_ref):
        tblk = pl.program_id(0)
        phi = phi_ref[...]                                 # [8, P]

        for i in range(tb):
            t = tblk * tb + i                              # stripe-local
            tg = t + t0                                    # global tile id
            out_ref[i] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)
            tx = (tg % tb_x).astype(jnp.float32)
            ty = (tg // tb_x).astype(jnp.float32)

            def visit(c, i=i, tx=tx, ty=ty):
                raw = table_ref[c]                         # [COLS, kc]
                bbx = bbox_ref[c]                          # [4, kc]
                c1 = raw[0:1]
                c2 = raw[1:2]
                c3 = raw[2:3]
                opac = raw[8:9]
                valid = raw[COLS - 1:COLS]
                member = ((tx >= bbx[0:1]) & (tx < bbx[1:2]) &
                          (ty >= bbx[2:3]) & (ty < bbx[3:4]) &
                          (valid > 0.0))                   # [1, kc]
                lmx = raw[3:4] - tx * block_w
                lmy = raw[4:5] - ty * block_h
                w = jnp.concatenate([
                    0.5 * c1, 0.5 * c3, c2,
                    -(c1 * lmx + c2 * lmy),
                    -(c2 * lmx + c3 * lmy),
                    0.5 * c1 * lmx * lmx + 0.5 * c3 * lmy * lmy
                    + c2 * lmx * lmy,
                    jnp.zeros_like(c1), jnp.zeros_like(c1),
                ], axis=0)                                 # [8, kc]
                sigma_t = jax.lax.dot_general(
                    phi, w, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)                # [P, kc]
                alpha = jnp.minimum(1.0, opac * jnp.exp(-sigma_t))
                contrib = ((sigma_t >= 0.0) & (alpha >= ALPHA_THRESHOLD)
                           & member)
                weights = jnp.where(contrib, alpha, 0.0)   # [P, kc]
                rgb8 = jnp.concatenate(
                    [raw[5:8], jnp.zeros((5, raw.shape[1]), raw.dtype)],
                    axis=0)                                # [8, kc]
                out_ref[i] += jax.lax.dot_general(
                    rgb8, weights, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)                # [8, P]

            def body_list(j, _, t=t, visit=visit):
                visit(lst_ref[t * lmax + j])               # flat 1D list
                return 0

            def body_rng(c, _, visit=visit):
                visit(c)
                return 0

            jax.lax.fori_loop(0, cnt_ref[t], body_list, 0)
            jax.lax.fori_loop(lo2_ref[t], hi2_ref[t], body_rng, 0)

    return kernel


def rasterize_list_t_pallas(proj: Projected, colors: jax.Array,
                            opacity: jax.Array, H: int, W: int,
                            block_h: int = BLOCK_H, block_w: int = BLOCK_W,
                            kc: int = None, lmax: int = None,
                            tb: int = None) -> jax.Array:
    """Forward-only lane-major chunk-list render -> [H, W, 3] (unclamped).

    Same selection/coverage/exactness story as ``rasterize_list_pallas``;
    the kernel body works in the transposed [*, kc] layout (see
    _make_list_t_kernel). kc defaults to 128: at full vreg lane width the
    [P, kc] chain matches the row-major body's instruction count while the
    narrow per-gaussian math all but disappears."""
    kc = KC_T if kc is None else kc
    lmax = _default_lmax(H, W, block_h, block_w) if lmax is None else lmax
    tb = TB_T if tb is None else tb
    table, bbox, member, tb_x, tb_y, T, N, Np = _table_bbox(
        proj, colors, opacity, H, W, block_h, block_w, kc)
    P = block_h * block_w
    nch = Np // kc
    lst, cnt, lo2, hi2 = _chunk_lists(member, N, Np, kc, lmax)
    table3 = jnp.swapaxes(table.reshape(nch, kc, COLS), 1, 2)  # [nch, COLS, kc]
    bbox3 = jnp.swapaxes(bbox.reshape(nch, kc, 4), 1, 2)       # [nch, 4, kc]
    tbs = tb if T % tb == 0 else 1
    phi = _phi_block(block_h, block_w)

    stripe = _stripe_tiles(T, tbs, lmax)
    outs = []
    for s0 in range(0, T, stripe):
        Ts = min(stripe, T - s0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(Ts // tbs,),
            in_specs=[
                pl.BlockSpec((nch, COLS, kc), lambda tb_i, *_: (0, 0, 0)),
                pl.BlockSpec((nch, 4, kc), lambda tb_i, *_: (0, 0, 0)),
                pl.BlockSpec((8, P), lambda tb_i, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((tbs, 8, P),
                                   lambda tb_i, *_: (tb_i, 0, 0)),
        )
        outs.append(pl.pallas_call(
            _make_list_t_kernel(tb_x, block_h, block_w, tbs, kc, lmax, t0=s0),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Ts, 8, P), jnp.float32),
            compiler_params=_cparams(),
            interpret=_interpret(),
        )(lst[s0:s0 + Ts].reshape(-1), cnt[s0:s0 + Ts], lo2[s0:s0 + Ts],
          hi2[s0:s0 + Ts], table3, bbox3, phi))
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    tiles = jnp.swapaxes(out[:, 0:3, :], 1, 2)
    return _tiles_to_image(tiles, H, W, tb_x, tb_y, block_h, block_w)


def _make_list_bwd_kernel(tb_x: int, block_h: int, block_w: int, tb: int,
                          kc: int, mtb: int):
    """Per-chunk gradient payload over the chunk's tile-block list.

    Grid (n_chunks, MTB); v_out blocks stream in via the prefetch-indexed
    index_map (clamped past the list — same block, no refetch); the payload
    block [kc, COLS] for chunk c accumulates across consecutive j steps.
    Gradient math identical to raster_dense_pallas._make_bwd_kernel."""

    def kernel(tlst_ref, tcnt_ref, table_ref, bbox_ref, phi_ref, vout_ref,
               out_ref):
        c = pl.program_id(0)
        j = pl.program_id(1)
        phi = phi_ref[...]                                 # [8, P]

        @pl.when(j == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        @pl.when(j < tcnt_ref[c])
        def _():
            raw = table_ref[...]                           # [kc, COLS]
            bbox = bbox_ref[...]                           # [kc, 4]
            c1 = raw[:, 0:1]
            c2 = raw[:, 1:2]
            c3 = raw[:, 2:3]
            opac = raw[:, 8:9]
            valid = raw[:, COLS - 1:COLS]
            rgb = raw[:, 5:8]                              # [kc, 3]
            tbi = tlst_ref[c * mtb + j]                # flat 1D list

            acc = jnp.zeros((raw.shape[0], COLS), jnp.float32)
            for i in range(tb):
                t = tbi * tb + i
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
                weights = jnp.where(contrib, alpha, 0.0)   # [kc, P]
                v_out = vout_ref[i]                        # [8, P] rows 0..2
                v_alpha = jax.lax.dot_general(
                    rgb, v_out[0:3, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)
                v_rgb = jax.lax.dot_general(
                    weights, v_out, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)                # [kc, 8] cols 0..2
                v_sigma = jnp.where(contrib, -(opac * vis) * v_alpha, 0.0)
                v_opac = jnp.sum(jnp.where(contrib, vis * v_alpha, 0.0),
                                 axis=1, keepdims=True)
                M = jax.lax.dot_general(
                    v_sigma, phi, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)                # [kc, 8]
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
                ], axis=1)                                 # [kc, COLS]
            out_ref[...] += acc

    return kernel


def _make_list_t_bwd_kernel(tb_x: int, block_h: int, block_w: int, tb: int,
                            kc: int, mtb: int):
    """Lane-major list backward: same per-chunk tile-block streaming as
    _make_list_bwd_kernel, with the whole gradient chain in the transposed
    [*, kc] layout ([P, kc] pixel terms, [1, kc]/[8, kc] per-gaussian
    terms) — the row-major bwd body spends most of its VPU instructions on
    ~40 [kc, 1] column ops per tile visit; here they are full-lane.
    Payload accumulates as [COLS, kc] per chunk (transposed back in XLA)."""

    def kernel(tlst_ref, tcnt_ref, table_ref, bbox_ref, phi_ref, vout_ref,
               out_ref):
        c = pl.program_id(0)
        j = pl.program_id(1)
        phi = phi_ref[...]                                 # [8, P]

        @pl.when(j == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        @pl.when(j < tcnt_ref[c])
        def _():
            raw = table_ref[0]                             # [COLS, kc]
            bbx = bbox_ref[0]                              # [4, kc]
            c1 = raw[0:1]
            c2 = raw[1:2]
            c3 = raw[2:3]
            opac = raw[8:9]
            valid = raw[COLS - 1:COLS]
            rgb8 = jnp.concatenate(
                [raw[5:8], jnp.zeros((5, raw.shape[1]), raw.dtype)],
                axis=0)                                    # [8, kc] rows 0..2
            tbi = tlst_ref[c * mtb + j]                # flat 1D list

            acc = jnp.zeros((COLS, raw.shape[1]), jnp.float32)
            for i in range(tb):
                t = tbi * tb + i
                tx = (t % tb_x).astype(jnp.float32)
                ty = (t // tb_x).astype(jnp.float32)
                member = ((tx >= bbx[0:1]) & (tx < bbx[1:2]) &
                          (ty >= bbx[2:3]) & (ty < bbx[3:4]) &
                          (valid > 0.0))                   # [1, kc]
                lmx = raw[3:4] - tx * block_w
                lmy = raw[4:5] - ty * block_h
                w = jnp.concatenate([
                    0.5 * c1, 0.5 * c3, c2,
                    -(c1 * lmx + c2 * lmy),
                    -(c2 * lmx + c3 * lmy),
                    0.5 * c1 * lmx * lmx + 0.5 * c3 * lmy * lmy
                    + c2 * lmx * lmy,
                    jnp.zeros_like(c1), jnp.zeros_like(c1),
                ], axis=0)                                 # [8, kc]
                sigma_t = jax.lax.dot_general(
                    phi, w, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)                # [P, kc]
                vis = jnp.exp(-sigma_t)
                alpha = jnp.minimum(1.0, opac * vis)
                contrib = ((sigma_t >= 0.0) & (alpha >= ALPHA_THRESHOLD)
                           & member)
                weights = jnp.where(contrib, alpha, 0.0)   # [P, kc]
                v_out = vout_ref[i]                        # [8, P] rows 0..2
                # v_alpha_t[p, k] = rgb_k . v_out_p (rows 3..7 both zero)
                v_alpha = jax.lax.dot_general(
                    v_out, rgb8, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)                # [P, kc]
                v_rgb = jax.lax.dot_general(
                    v_out, weights, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)                # [8, kc] rows 0..2
                v_sigma = jnp.where(contrib, -(opac * vis) * v_alpha, 0.0)
                v_opac = jnp.sum(jnp.where(contrib, vis * v_alpha, 0.0),
                                 axis=0, keepdims=True)    # [1, kc]
                M = jax.lax.dot_general(
                    phi, v_sigma, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)                # [8, kc]
                Sxx = M[0:1]; Syy = M[1:2]; Sxy = M[2:3]
                Sx = M[3:4]; Sy = M[4:5]; S1 = M[5:6]
                v_con_x = 0.5 * (lmx * lmx * S1 - 2.0 * lmx * Sx + Sxx)
                v_con_y = 0.5 * (lmx * lmy * S1 - lmx * Sy - lmy * Sx + Sxy)
                v_con_z = 0.5 * (lmy * lmy * S1 - 2.0 * lmy * Sy + Syy)
                mom_x = lmx * S1 - Sx
                mom_y = lmy * S1 - Sy
                v_xy_x = c1 * mom_x + c2 * mom_y
                v_xy_y = c2 * mom_x + c3 * mom_y
                zeros7 = jnp.zeros((7, raw.shape[1]), raw.dtype)
                acc += jnp.concatenate([
                    v_xy_x, v_xy_y, v_con_x, v_con_y, v_con_z,
                    v_rgb[0:3], v_opac, zeros7,
                ], axis=0)                                 # [COLS, kc]
            out_ref[0] += acc

    return kernel


def list_backward(proj: Projected, colors: jax.Array, opacity: jax.Array,
                  v_img: jax.Array, H: int, W: int,
                  block_h: int = BLOCK_H, block_w: int = BLOCK_W,
                  kc: int = None, mtb: int = None, tb: int = None,
                  layout: str = "rows"):
    """Per-Gaussian gradients via per-chunk tile-block lists — zero scatter,
    v_out streamed block-by-block (no full-image VMEM residency). Falls back
    to ``dense_backward`` (exact, O(T*N)) via lax.cond if any chunk
    intersects more than ``mtb`` tile blocks. Knobs default to KC/MTB/TB at
    call time; ``layout='lanes'`` selects the lane-major kernel body
    (gaussians on the lane axis, kc default KC_T)."""
    kc = (KC_T if layout == "lanes" else KC) if kc is None else kc
    mtb = MTB if mtb is None else mtb
    tb = TB if tb is None else tb
    table, bbox, member, tb_x, tb_y, T, N, Np = _table_bbox(
        proj, colors, opacity, H, W, block_h, block_w, kc)
    P = block_h * block_w
    nch = Np // kc
    tbs = tb if T % tb == 0 else 1
    n_tblk = T // tbs

    # per-chunk tile-block lists from the [T, N] membership
    mc = member if member.shape[1] == Np else jnp.pad(
        member, ((0, 0), (0, Np - member.shape[1])))
    mtb_mat = mc.reshape(n_tblk, tbs, nch, kc).any(axis=(1, 3)).T  # [nch, n_tblk]
    ids_t = jnp.arange(n_tblk, dtype=jnp.int32)
    cnt_full = jnp.sum(mtb_mat, axis=-1, dtype=jnp.int32)
    k_sel = min(mtb, n_tblk)
    topv, _ = jax.lax.top_k(jnp.where(mtb_mat, n_tblk - ids_t, 0), k_sel)
    tlst = jnp.where(topv > 0, n_tblk - topv, 0).astype(jnp.int32)
    if tlst.shape[1] < mtb:
        tlst = jnp.pad(tlst, ((0, 0), (0, mtb - tlst.shape[1])))
    tcnt = jnp.minimum(cnt_full, mtb)
    overflow = jnp.any(cnt_full > mtb)
    # pad past-the-count entries with the chunk's LAST live tile block so the
    # v_out index_map is a plain ref read (same block -> no refetch, compute
    # skipped by the j < tcnt guard; keeps index_map free of arithmetic)
    last = jnp.take_along_axis(
        tlst, jnp.maximum(tcnt - 1, 0)[:, None], axis=1)   # [nch, 1]
    j_ids = jnp.arange(mtb, dtype=jnp.int32)[None, :]
    tlst = jnp.where(j_ids < jnp.maximum(tcnt, 1)[:, None], tlst, last)

    vout_t = jnp.swapaxes(_image_to_tiles(v_img, tb_x, tb_y, block_h, block_w), 1, 2)
    vout_pad = jnp.zeros((T, 8, P), jnp.float32).at[:, 0:3, :].set(vout_t)

    def _list_impl(_):
        vout_spec = pl.BlockSpec(
            (tbs, 8, P),
            lambda c, j, tlst, tcnt: (tlst[c * mtb + j], 0, 0))
        if layout == "lanes":
            table3 = jnp.swapaxes(table.reshape(nch, kc, COLS), 1, 2)
            bbox3 = jnp.swapaxes(bbox.reshape(nch, kc, 4), 1, 2)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(nch, mtb),
                in_specs=[
                    pl.BlockSpec((1, COLS, kc), lambda c, j, *_: (c, 0, 0)),
                    pl.BlockSpec((1, 4, kc), lambda c, j, *_: (c, 0, 0)),
                    pl.BlockSpec((8, P), lambda c, j, *_: (0, 0)),
                    vout_spec,
                ],
                out_specs=pl.BlockSpec((1, COLS, kc),
                                       lambda c, j, *_: (c, 0, 0)),
            )
            payload3 = pl.pallas_call(
                _make_list_t_bwd_kernel(tb_x, block_h, block_w, tbs, kc, mtb),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((nch, COLS, kc), jnp.float32),
                compiler_params=_cparams(),
                interpret=_interpret(),
            )(tlst.reshape(-1), tcnt, table3, bbox3,
              _phi_block(block_h, block_w), vout_pad)
            return jnp.swapaxes(payload3, 1, 2).reshape(Np, COLS)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nch, mtb),
            in_specs=[
                pl.BlockSpec((kc, COLS), lambda c, j, *_: (c, 0)),
                pl.BlockSpec((kc, 4), lambda c, j, *_: (c, 0)),
                pl.BlockSpec((8, P), lambda c, j, *_: (0, 0)),
                vout_spec,
            ],
            out_specs=pl.BlockSpec((kc, COLS), lambda c, j, *_: (c, 0)),
        )
        return pl.pallas_call(
            _make_list_bwd_kernel(tb_x, block_h, block_w, tbs, kc, mtb),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Np, COLS), jnp.float32),
            compiler_params=_cparams(),
            interpret=_interpret(),
        )(tlst.reshape(-1), tcnt, table, bbox,
          _phi_block(block_h, block_w), vout_pad)

    def _dense_impl(_):
        v_xys, v_conics, v_colors, v_opacity = dense_backward(
            proj, colors, opacity, v_img, H, W, block_h, block_w)
        payload = jnp.zeros((Np, COLS), jnp.float32)
        payload = payload.at[:N, 0:2].set(v_xys)
        payload = payload.at[:N, 2:5].set(v_conics)
        payload = payload.at[:N, 5:8].set(v_colors)
        payload = payload.at[:N, 8].set(v_opacity.reshape(-1))
        return payload

    payload = jax.lax.cond(overflow, _dense_impl, _list_impl, 0)
    v_xys = payload[:N, 0:2]
    v_conics = payload[:N, 2:5]
    v_colors = payload[:N, 5:8]
    v_opacity = payload[:N, 8].reshape(opacity.shape)
    return v_xys, v_conics, v_colors, v_opacity


def _mk_proj(xys, conics, radii, valid):
    return Projected(xys=xys, conics=conics, radii=radii,
                     num_tiles_hit=jnp.zeros_like(radii), valid=valid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def rasterize_list(xys, conics, colors, opacity, radii, valid,
                   H: int, W: int, block_h: int = BLOCK_H, block_w: int = BLOCK_W):
    """Differentiable chunk-list rasterization.

    Semantics identical to ``rasterize_dense``/``rasterize_sweep`` (cap-free
    exact member coverage, reference gradient conventions) with both
    directions costed by actual member chunks: no top_k over [T, N], no
    attribute gather, no gradient scatter. Keep the stream Morton-ordered
    (``core.binning.morton_perm``) for the fast path; any order is exact."""
    return rasterize_list_pallas(_mk_proj(xys, conics, radii, valid),
                                 colors, opacity, H, W, block_h, block_w)


def _rl_fwd(xys, conics, colors, opacity, radii, valid, H, W, block_h, block_w):
    out = rasterize_list_pallas(_mk_proj(xys, conics, radii, valid),
                                colors, opacity, H, W, block_h, block_w)
    return out, (xys, conics, colors, opacity, radii, valid)


def _rl_bwd(H, W, block_h, block_w, res, v_img):
    import numpy as np

    xys, conics, colors, opacity, radii, valid = res
    v_xys, v_conics, v_colors, v_opacity = list_backward(
        _mk_proj(xys, conics, radii, valid), colors, opacity, v_img,
        H, W, block_h, block_w)
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (v_xys, v_conics, v_colors, v_opacity, f0(radii), f0(valid))


rasterize_list.defvjp(_rl_fwd, _rl_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def rasterize_list_t(xys, conics, colors, opacity, radii, valid,
                     H: int, W: int, block_h: int = BLOCK_H,
                     block_w: int = BLOCK_W):
    """Differentiable lane-major chunk-list rasterization — semantics
    identical to ``rasterize_list``, both kernel bodies in the transposed
    [*, kc] layout (see _make_list_t_kernel/_make_list_t_bwd_kernel)."""
    return rasterize_list_t_pallas(_mk_proj(xys, conics, radii, valid),
                                   colors, opacity, H, W, block_h, block_w)


def _rlt_fwd(xys, conics, colors, opacity, radii, valid, H, W,
             block_h, block_w):
    out = rasterize_list_t_pallas(_mk_proj(xys, conics, radii, valid),
                                  colors, opacity, H, W, block_h, block_w)
    return out, (xys, conics, colors, opacity, radii, valid)


def _rlt_bwd(H, W, block_h, block_w, res, v_img):
    import numpy as np

    xys, conics, colors, opacity, radii, valid = res
    v_xys, v_conics, v_colors, v_opacity = list_backward(
        _mk_proj(xys, conics, radii, valid), colors, opacity, v_img,
        H, W, block_h, block_w, layout="lanes")
    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (v_xys, v_conics, v_colors, v_opacity, f0(radii), f0(valid))


rasterize_list_t.defvjp(_rlt_fwd, _rlt_bwd)
