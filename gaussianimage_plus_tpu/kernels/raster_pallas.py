"""Pallas TPU kernels for the tile-binned accumulated-sum rasterizer.

Same math as core/render_tiled.py (which remains the XLA fallback and the
test oracle) but fused so the [K, P] score/alpha matrices never leave VMEM.
The pure-XLA path materializes ~400 MB of [T, P, K] intermediates per pass
(XLA cannot fuse the exp/masks between the two per-tile matmuls); on a v5e
that HBM round-trip dominates the step.

Data layout ("v2"): one prepacked attribute table, one gather, one scatter.

- ``table`` [N+1, 16]: per-Gaussian rows
  [c1, c2, c3, mx, my, r, g, b, opac, 0..0, valid=1]; row N is the all-zero
  sentinel for empty bin slots (its ``valid`` column is 0).
- ``raw = table[ids_sentinel]`` [T, K, 16] — the only gather.
- Kernels consume [KC, 16] chunks; tile origins come from ``program_id`` so
  the quadratic coefficients are computed in-kernel in tile-local coordinates
  (f32-safe for 2K-resolution images, same precision class as the reference's
  direct ``delta`` evaluation).
- Chunk skipping: members are front-packed per tile, so chunk ``c`` is dead
  whenever ``c*KC >= count[t]`` (counts ride scalar prefetch). Exact, not an
  approximation.
- The backward kernel emits the finished per-(tile, slot) gradient payload
  [v_xy(2), v_conic(3), v_rgb(3), v_opac(1)] — reference math
  backward.cu:1297-1323 including the pass-through ``min(1,.)`` gradient and
  the half-off-diagonal v_conic convention — and a single 9-channel
  scatter-add accumulates per Gaussian (replaces warpSum + atomicAdd,
  backward.cu:1330-1344; sentinel rows drop via out-of-bounds 'drop' mode).

Kernels run in interpret mode automatically on CPU so the same code path is
unit-testable off-TPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.gaussian2d import (ALPHA_THRESHOLD, BLOCK_H, BLOCK_W, tile_bbox,
                               tile_bounds_for)
from ..core.render_tiled import _image_to_tiles, _tiles_to_image

COLS = 16
# All raster matmuls run at HIGHEST precision. The MXU's default path rounds
# f32 operands to bf16 (~0.4% relative); the blend gates contributions on
# sigma >= 0 (forward.cu:660 semantics), and the expanded quadratic in ``w``
# cancels catastrophically near Gaussian centers — at bf16 the gate then
# drops alpha~1 contributions at random (measured 0.07 rms image error vs
# the exact f32 render at the Kodak operating point, i.e. ~23 dB of pure
# precision noise). HIGHEST restores f32 accuracy (~1e-7 rel, measured) and
# these small matmuls are nowhere near the kernel's bottleneck.
from ..core.precision import MM_PRECISION  # single policy home
# K-chunk width per grid step; must be a multiple of 128 (Mosaic lane-dim
# block constraint).
KC = 128
# Tiles processed per grid step: amortizes per-step DMA latency (a single
# tile's attribute block is only ~8 KB; the grid would be latency-bound).
TB = 8


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _build_table(xys, conics, colors, opacity):
    """[N+1, COLS] attribute table with a zero sentinel row."""
    N = xys.shape[0]
    op = opacity.reshape(-1)
    cols = [conics[:, 0], conics[:, 1], conics[:, 2],
            xys[:, 0], xys[:, 1],
            colors[:, 0], colors[:, 1], colors[:, 2],
            op]
    z = jnp.zeros_like(op)
    cols += [z] * (COLS - len(cols) - 1) + [jnp.ones_like(op)]
    table = jnp.stack(cols, axis=1)                        # [N, COLS]
    return jnp.concatenate([table, jnp.zeros((1, COLS), table.dtype)], axis=0)


def _phi_block(block_h: int, block_w: int) -> jax.Array:
    P = block_h * block_w
    ppx = (jnp.arange(P, dtype=jnp.int32) % block_w).astype(jnp.float32)
    ppy = (jnp.arange(P, dtype=jnp.int32) // block_w).astype(jnp.float32)
    one = jnp.ones_like(ppx)
    zero = jnp.zeros_like(ppx)
    return jnp.stack([ppx * ppx, ppy * ppy, ppx * ppy, ppx, ppy, one,
                      zero, zero], axis=0)                 # [8, P]


def _chunk_geometry(raw, phi, t, tb_x, block_h, block_w):
    """Per-chunk recompute of sigma/alpha/contrib from the raw attr chunk."""
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
    ], axis=1)                                             # [KC, 8]
    sigma = jax.lax.dot_general(                           # [KC, P]
        w, phi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)
    vis = jnp.exp(-sigma)
    alpha = jnp.minimum(1.0, opac * vis)
    contrib = (sigma >= 0.0) & (alpha >= ALPHA_THRESHOLD) & (valid > 0.0)
    return (c1, c2, c3, lmx, lmy, opac, sigma, vis, alpha, contrib)


def _make_fwd_kernel(tb_x, block_h, block_w, kc, tb):
    def kernel(counts_ref, raw_ref, phi_ref, out_ref):
        tblk = pl.program_id(0)
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        phi = phi_ref[...]                                 # [8, P]
        for i in range(tb):
            t = tblk * tb + i

            @pl.when(c * kc < counts_ref[t])
            def _(i=i, t=t):
                raw = raw_ref[i]                           # [KC, COLS]
                (_, _, _, _, _, _, _, _, alpha, contrib) = _chunk_geometry(
                    raw, phi, t, tb_x, block_h, block_w)
                weights = jnp.where(contrib, alpha, 0.0)   # [KC, P]
                rgb8 = jnp.concatenate(
                    [raw[:, 5:8], jnp.zeros((raw.shape[0], 5), raw.dtype)], axis=1)
                # out[c,p] += sum_k rgb8[k,c] * weights[k,p]
                out_ref[i] += jax.lax.dot_general(
                    rgb8, weights, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)    # [8, P]

    return kernel


def _make_bwd_kernel(tb_x, block_h, block_w, kc, tb):
    def kernel(counts_ref, raw_ref, phi_ref, vout_ref, out_ref):
        tblk = pl.program_id(0)
        c = pl.program_id(1)
        phi = phi_ref[...]
        for i in range(tb):
            t = tblk * tb + i

            @pl.when(c * kc >= counts_ref[t])
            def _(i=i):
                out_ref[i] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

            @pl.when(c * kc < counts_ref[t])
            def _(i=i, t=t):
                raw = raw_ref[i]                           # [KC, COLS]
                (c1, c2, c3, lmx, lmy, opac, sigma, vis, alpha, contrib) = \
                    _chunk_geometry(raw, phi, t, tb_x, block_h, block_w)
                weights = jnp.where(contrib, alpha, 0.0)   # [KC, P]
                v_out = vout_ref[i]                        # [8, P] rows 0..2 live
                rgb = raw[:, 5:8]                          # [KC, 3]
                # v_alpha[k,p] = sum_c rgb[k,c] v_out[c,p]
                v_alpha = jax.lax.dot_general(
                    rgb, v_out[0:3, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)
                # v_rgb[k,c] = sum_p weights[k,p] v_out[c,p]
                v_rgb = jax.lax.dot_general(
                    weights, v_out, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)    # [KC, 8] cols 0..2
                v_sigma = jnp.where(contrib, -(opac * vis) * v_alpha, 0.0)
                v_opac = jnp.sum(jnp.where(contrib, vis * v_alpha, 0.0),
                                 axis=1, keepdims=True)    # [KC, 1]
                # moments M[k,f] = sum_p v_sigma[k,p] phi[f,p]
                M = jax.lax.dot_general(
                    v_sigma, phi, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=MM_PRECISION)    # [KC, 8]
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
                out_ref[i] = jnp.concatenate([
                    v_xy_x, v_xy_y, v_con_x, v_con_y, v_con_z,
                    v_rgb[:, 0:3], v_opac, zeros7,
                ], axis=1)                                 # [KC, COLS]

    return kernel


def _chunk_width(K: int) -> int:
    """Largest usable chunk: KC for big lists, the whole (8-aligned) list for
    small ones. ``K`` must already be 8-aligned (the binner cap should be)."""
    return KC if K >= KC else K


def _tile_block(T: int) -> int:
    """Tiles per grid step: TB when it divides T (callers pad T), else 1."""
    return TB if T % TB == 0 else 1


def _run_fwd(raw, counts, phi, P, tb_x, block_h, block_w, tiles_per_step=None):
    T, K, _ = raw.shape
    kc = _chunk_width(K)
    nc = -(-K // kc)
    tb = tiles_per_step if (tiles_per_step and T % tiles_per_step == 0) \
        else _tile_block(T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // tb, nc),
        in_specs=[
            pl.BlockSpec((tb, kc, COLS), lambda t, c, counts: (t, c, 0)),
            pl.BlockSpec((8, P), lambda t, c, counts: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, 8, P), lambda t, c, counts: (t, 0, 0)),
    )
    return pl.pallas_call(
        _make_fwd_kernel(tb_x, block_h, block_w, kc, tb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
        interpret=_interpret(),
    )(counts, raw, phi)


def _run_bwd(raw, counts, phi, vout_tiles, P, tb_x, block_h, block_w):
    T, K, _ = raw.shape
    kc = _chunk_width(K)
    nc = -(-K // kc)
    tb = _tile_block(T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // tb, nc),
        in_specs=[
            pl.BlockSpec((tb, kc, COLS), lambda t, c, counts: (t, c, 0)),
            pl.BlockSpec((8, P), lambda t, c, counts: (0, 0)),
            pl.BlockSpec((tb, 8, P), lambda t, c, counts: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, kc, COLS), lambda t, c, counts: (t, c, 0)),
    )
    return pl.pallas_call(
        _make_bwd_kernel(tb_x, block_h, block_w, kc, tb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, K, COLS), jnp.float32),
        interpret=_interpret(),
    )(counts, raw, phi, vout_tiles)


def _padded_k(K: int) -> int:
    """Sublane-align the slot list: to 8 below one chunk, else to KC."""
    return -(-K // 8) * 8 if K < KC else -(-K // KC) * KC


def _prepare(xys, conics, colors, opacity, ids, mask, H, W, block_h, block_w):
    tb_x, tb_y = tile_bounds_for(H, W, block_h, block_w)
    N = xys.shape[0]
    table = _build_table(xys, conics, colors, opacity)
    ids_s = jnp.where(mask, ids, N)
    K = ids.shape[1]
    Kp = _padded_k(K)
    if Kp != K:
        ids_s = jnp.pad(ids_s, ((0, 0), (0, Kp - K)), constant_values=N)
    raw = table[ids_s]                                     # [T, Kp, COLS]
    counts = jnp.sum(mask, axis=1, dtype=jnp.int32)
    phi = _phi_block(block_h, block_w)
    return raw, ids_s, counts, phi, tb_x, tb_y


class Prepared(NamedTuple):
    """A fully binned+gathered render input.

    The attribute table is pre-gathered into per-tile blocks, so rendering
    from it is a single Pallas sweep with zero gathers. This is the decode
    fast path: a decoded bitstream is static, its binning is a pure function
    of the decoded attributes, so it is computed ONCE per bitstream and
    reused across frames (the reference re-bins per frame only because its
    dynamic intersection lists are cheap on a GPU; see
    train_quantize.py:239-247 for the decode protocol being measured)."""

    raw: jax.Array     # [T, Kp, COLS]
    counts: jax.Array  # [T]


def prepare_raster(xys, conics, colors, opacity, ids, mask,
                   H, W, block_h: int = BLOCK_H, block_w: int = BLOCK_W):
    """Bin-once stage: gather attributes into per-tile VMEM-ready blocks."""
    raw, _, counts, _, _, _ = _prepare(
        xys, conics, colors, opacity, ids, mask, H, W, block_h, block_w)
    return Prepared(raw, counts)


def rasterize_prepared(prep, H: int, W: int,
                       block_h: int = BLOCK_H, block_w: int = BLOCK_W,
                       tiles_per_step: int | None = None) -> jax.Array:
    """Forward-only render from a Prepared block table (no gather, no
    projection, no binning): the per-frame cost of the decode path."""
    raw, counts = prep
    tb_x, tb_y = tile_bounds_for(H, W, block_h, block_w)
    P = block_h * block_w
    phi = _phi_block(block_h, block_w)
    out = _run_fwd(raw, counts, phi, P, tb_x, block_h, block_w,
                   tiles_per_step=tiles_per_step)
    tiles = jnp.swapaxes(out[:, 0:3, :], 1, 2)
    return _tiles_to_image(tiles, H, W, tb_x, tb_y, block_h, block_w)


def _raster_pallas_fwd_impl(xys, conics, colors, opacity, ids, mask,
                            H, W, block_h, block_w):
    raw, _, counts, phi, tb_x, tb_y = _prepare(
        xys, conics, colors, opacity, ids, mask, H, W, block_h, block_w)
    P = block_h * block_w
    out = _run_fwd(raw, counts, phi, P, tb_x, block_h, block_w)  # [T, 8, P]
    tiles = jnp.swapaxes(out[:, 0:3, :], 1, 2)             # [T, P, 3]
    return _tiles_to_image(tiles, H, W, tb_x, tb_y, block_h, block_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def rasterize_pallas(xys, conics, colors, opacity, ids, mask, radii,
                     H: int, W: int, block_h: int = BLOCK_H,
                     block_w: int = BLOCK_W, gather_tiles: int = 0):
    """Drop-in replacement for core.render_tiled.rasterize_tiled backed by
    fused Pallas kernels. Identical semantics and gradient conventions.

    ``radii`` ([N] int32 bounding radii from projection, or None) +
    ``gather_tiles`` enable the inverse-map gradient accumulation: the
    backward gathers each Gaussian's per-tile gradient payload from its
    (bbox-enumerated) tiles instead of scatter-adding all T*K slots (the
    reference's warpSum+atomicAdd, backward.cu:1330-1344, is the scatter
    formulation). Exact, but measured ~3x SLOWER than the occupancy-adaptive
    scatter tiers on v5e at the Kodak operating point (33.8 vs 10.34
    ms/step, EXPERIMENTS.md round-3 A/B) — kept as an option; the ~4x win
    lives in the scatter tiers themselves (`_scatter_accumulate`).
    ``gather_tiles`` is the static per-Gaussian tile budget; if any
    Gaussian's bbox exceeds it the whole accumulation falls back to the
    scatter path in-graph (lax.cond), so the result is exact for every
    state. The default (0) scatters — matching GaussianConfig's
    grad_gather_tiles=0 and the measured-fastest path."""
    return _raster_pallas_fwd_impl(xys, conics, colors, opacity, ids, mask,
                                   H, W, block_h, block_w)


def _rp_fwd(xys, conics, colors, opacity, ids, mask, radii,
            H, W, block_h, block_w, gather_tiles):
    out = _raster_pallas_fwd_impl(xys, conics, colors, opacity, ids, mask,
                                  H, W, block_h, block_w)
    return out, (xys, conics, colors, opacity, ids, mask, radii)


def _gather_grads(payload9, ids_s, radii, xys, tb_x, tb_y,
                  block_h, block_w, R):
    """Inverse-map accumulation: v[n] = sum of payload rows at the (tile,
    slot) positions where Gaussian n actually landed.

    Each Gaussian's candidate tiles are enumerated row-major inside its
    projected tile bbox (the same ``tile_bbox`` the binner's membership test
    uses); its slot inside a tile is recovered by binary search — ``ids_s``
    rows are ascending valid ids front-packed ahead of N-sentinels, i.e.
    fully sorted. A miss (Gaussian clipped out of an overfull tile, or a
    bbox tile it never joined) fails the equality check and contributes 0,
    which matches the scatter path exactly."""
    N = xys.shape[0]
    Kp = ids_s.shape[1]
    ids_flat = ids_s.reshape(-1)
    xmin, xmax, ymin, ymax = tile_bbox(
        xys, radii.astype(jnp.float32), (tb_x, tb_y), block_h, block_w)
    w = jnp.maximum(xmax - xmin, 1)[:, None]                   # [N, 1]
    area = ((xmax - xmin) * (ymax - ymin))[:, None]            # [N, 1]
    r = jnp.arange(R, dtype=jnp.int32)[None, :]                # [1, R]
    j = r // w
    i = r - j * w
    tr = (ymin[:, None] + j) * tb_x + xmin[:, None] + i        # [N, R]
    valid_r = r < area
    tr = jnp.where(valid_r, tr, 0)
    base = tr * Kp
    nvec = jnp.arange(N, dtype=jnp.int32)[:, None]             # [N, 1]
    lo = jnp.zeros_like(tr)
    hi = jnp.full_like(tr, Kp)
    for _ in range(max(Kp, 2).bit_length()):
        mid = (lo + hi) >> 1
        vals = ids_flat[base + jnp.minimum(mid, Kp - 1)]
        go_right = vals < nvec
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    slot = jnp.minimum(lo, Kp - 1)
    hit = valid_r & (ids_flat[base + slot] == nvec)            # [N, R]
    contrib = payload9[base + slot]                            # [N, R, 9]
    return jnp.sum(jnp.where(hit[..., None], contrib, 0.0), axis=1)


def _rp_bwd(H, W, block_h, block_w, gather_tiles, res, v_img):
    xys, conics, colors, opacity, ids, mask, radii = res
    raw, ids_s, counts, phi, tb_x, tb_y = _prepare(
        xys, conics, colors, opacity, ids, mask, H, W, block_h, block_w)
    P = block_h * block_w
    T = raw.shape[0]
    vout_t = jnp.swapaxes(_image_to_tiles(v_img, tb_x, tb_y, block_h, block_w), 1, 2)
    vout_pad = jnp.zeros((T, 8, P), jnp.float32).at[:, 0:3, :].set(vout_t)
    payload = _run_bwd(raw, counts, phi, vout_pad, P, tb_x, block_h, block_w)

    N = xys.shape[0]
    Kp = ids_s.shape[1]
    payload9 = payload[:, :, 0:9].reshape(-1, 9)

    # Occupancy-adaptive 9-channel scatter-add (replaces warpSum + atomicAdd,
    # backward.cu:1330-1344). Members are front-packed in id order, so when
    # every tile's count <= kcols the columns beyond kcols hold only the N
    # sentinel (dropped but still billed by XLA's scatter) — a runtime switch
    # over static column tiers cuts the update count ~4x at typical Kodak
    # occupancy (~30 of cap 256) with bit-identical results. Sentinel slots
    # carry id N (out of bounds) and are dropped.
    def _scatter_cols(kcols):
        def f(_):
            return jnp.zeros((N, 9), payload.dtype).at[
                ids_s[:, :kcols].reshape(-1)].add(
                payload[:, :kcols, 0:9].reshape(-1, 9), mode="drop")
        return f

    tiers = [t for t in (64, 128) if t < Kp] + [Kp]

    def scatter_acc(_):
        if len(tiers) == 1:
            return _scatter_cols(Kp)(None)
        max_c = jnp.max(counts)
        idx = sum((max_c > t).astype(jnp.int32) for t in tiers[:-1])
        return jax.lax.switch(idx, [_scatter_cols(t) for t in tiers], None)

    if gather_tiles and radii is not None:
        # Inverse-map gather (exact; in-graph scatter fallback on bbox
        # overflow). Measured SLOWER than the scatter on v5e — TPU XLA
        # scalar-indexed gathers serialize — kept as an option and for
        # platforms where gathers win; default grad_gather_tiles=0.
        R = int(gather_tiles)
        xmin, xmax, ymin, ymax = tile_bbox(
            xys, radii.astype(jnp.float32), (tb_x, tb_y), block_h, block_w)
        overflow = jnp.any((xmax - xmin) * (ymax - ymin) > R)
        acc = jax.lax.cond(
            overflow, scatter_acc,
            lambda _: _gather_grads(payload9, ids_s, radii, xys, tb_x, tb_y,
                                    block_h, block_w, R),
            None)
    else:
        acc = scatter_acc(None)
    v_xys = acc[:, 0:2]
    v_conics = acc[:, 2:5]
    v_colors = acc[:, 5:8]
    v_opacity = acc[:, 8].reshape(opacity.shape)

    f0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    v_radii = None if radii is None else f0(radii)
    return (v_xys, v_conics, v_colors, v_opacity, f0(ids), f0(mask), v_radii)


rasterize_pallas.defvjp(_rp_fwd, _rp_bwd)
