"""Pallas tile-binning kernel: stream compaction by matmul.

Replaces the XLA selection (``lax.top_k`` over the [T, N] membership matrix,
core/binning.py) whose cost explodes at DIV2K scale (T ~ 16k tiles x N ~ 20k
points). The kernel walks Gaussian chunks per tile and compacts members with
an MXU trick:

    mask[k]   = tile inside bbox_k  (and k valid)
    rank      = L @ mask            (L = lower-triangular ones — prefix sum
                                     as a matmul)
    S[o, k]   = (rank[k] == o+1) & mask[k]    (one-hot selection matrix)
    compacted = S @ chunk_ids                  (members packed to the front)

and appends each chunk's compacted members at the tile's running count
(SMEM), preserving index order — byte-identical ids/mask/count to the XLA
binner. Work is O(T * N * chunk) at MXU rates with the bbox table resident
in VMEM; no sort, no scatter, no host sync.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# f32-accurate matmuls (MXU default rounds to bf16; see kernels/raster_pallas.py)
from ..core.precision import MM_PRECISION  # single policy home
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.binning import TileBins
from ..core.gaussian2d import Projected, tile_bbox, tile_bounds_for

GC = 128   # gaussians per chunk
TBIN = 8   # tiles per grid step


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _make_kernel(tb_x: int, tb: int, cap: int):
    def kernel(bbox_ref, out_ref, cnt_ref):
        tblk = pl.program_id(0)
        c = pl.program_id(1)

        chunk = bbox_ref[pl.ds(c * GC, GC), :]            # [GC, 4] f32
        # global gaussian ids of this chunk (iota must be integer on TPU)
        base = (c * GC).astype(jnp.float32)
        ids_f = base + jax.lax.broadcasted_iota(jnp.int32, (GC, 1), 0).astype(jnp.float32)

        lower_tri = (jax.lax.broadcasted_iota(jnp.int32, (GC, GC), 0) >=
                     jax.lax.broadcasted_iota(jnp.int32, (GC, GC), 1)).astype(jnp.float32)
        out_iota = jax.lax.broadcasted_iota(jnp.int32, (GC, 1), 0).astype(jnp.float32)

        for i in range(tb):
            t = tblk * tb + i
            tx = (t % tb_x).astype(jnp.float32)
            ty = (t // tb_x).astype(jnp.float32)

            @pl.when(c == 0)
            def _(i=i):
                cnt_ref[i] = 0
                out_ref[i] = jnp.zeros(out_ref.shape[1:], out_ref.dtype)

            mask = ((tx >= chunk[:, 0:1]) & (tx < chunk[:, 1:2]) &
                    (ty >= chunk[:, 2:3]) & (ty < chunk[:, 3:4])).astype(jnp.float32)
            # prefix sum as matmul: rank[k] = sum_{j<=k} mask[j]
            rank = jax.lax.dot_general(
                lower_tri, mask, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=MM_PRECISION)       # [GC, 1]
            found = rank[GC - 1, 0].astype(jnp.int32)

            @pl.when(found > 0)
            def _(i=i, mask=mask, rank=rank):
                S = ((out_iota + 1.0 == rank.reshape(1, GC)) &
                     (mask.reshape(1, GC) > 0)).astype(jnp.float32)  # [GC, GC]
                packed = jax.lax.dot_general(
                    S, ids_f, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                precision=MM_PRECISION)   # [GC, 1] compacted ids
                payload = jnp.broadcast_to(packed, (GC, out_ref.shape[2]))
                start = jnp.minimum(cnt_ref[i], cap)
                out_ref[i, pl.ds(start, GC), :] = payload
                cnt_ref[i] = cnt_ref[i] + found

    return kernel


def bin_gaussians_pallas(proj: Projected, H: int, W: int, cap: int = 256,
                         block_h: int = 16, block_w: int = 16) -> TileBins:
    """Drop-in replacement for core.binning.bin_gaussians (same TileBins)."""
    tb_x, tb_y = tile_bounds_for(H, W, block_h, block_w)
    T = tb_x * tb_y
    N = proj.xys.shape[0]
    xmin, xmax, ymin, ymax = tile_bbox(
        proj.xys, proj.radii.astype(jnp.float32), (tb_x, tb_y), block_h, block_w)
    # invalid gaussians get an empty bbox
    inv = ~proj.valid
    bbox = jnp.stack([
        jnp.where(inv, 1.0, xmin.astype(jnp.float32)),
        jnp.where(inv, 0.0, xmax.astype(jnp.float32)),
        jnp.where(inv, 1.0, ymin.astype(jnp.float32)),
        jnp.where(inv, 0.0, ymax.astype(jnp.float32)),
    ], axis=-1)                                            # [N, 4]
    Np = -(-N // GC) * GC
    if Np != N:
        pad = jnp.tile(jnp.array([[1.0, 0.0, 1.0, 0.0]]), (Np - N, 1))
        bbox = jnp.concatenate([bbox, pad], axis=0)
    tb = TBIN if T % TBIN == 0 else 1
    ko = cap + GC                                          # slack for overflow
    n_chunks = Np // GC

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(T // tb, n_chunks),
        in_specs=[
            pl.BlockSpec((Np, 4), lambda tb_i, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, ko, 8), lambda tb_i, c: (tb_i, 0, 0)),
        scratch_shapes=[pltpu.SMEM((tb,), jnp.int32)],
    )
    out = pl.pallas_call(
        _make_kernel(tb_x, tb, cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, ko, 8), jnp.float32),
        interpret=_interpret(),
    )(bbox)

    ids = out[:, :cap, 0].astype(jnp.int32)                # [T, cap]
    # counts (clamped total membership) from a cheap [T, N] bool row-sum — no
    # selection involved, so this does not reintroduce the top_k cost.
    counts = _counts_from_bbox(bbox[:N], proj.valid, tb_x, tb_y, cap)
    slot = jnp.arange(cap, dtype=jnp.int32)
    mask = slot[None, :] < counts[:, None]
    ids = jnp.where(mask, ids, 0)
    return TileBins(ids=ids, mask=mask, count=counts)


def _counts_from_bbox(bbox, valid, tb_x, tb_y, cap):
    """Per-tile member counts via a [T, N] reduction (cheap: bool ops +
    row-sum, no selection)."""
    tx = jnp.arange(tb_x, dtype=jnp.float32)
    ty = jnp.arange(tb_y, dtype=jnp.float32)
    in_x = (tx[None, :, None] >= bbox[None, None, :, 0]) & (tx[None, :, None] < bbox[None, None, :, 1])
    in_y = (ty[:, None, None] >= bbox[None, None, :, 2]) & (ty[:, None, None] < bbox[None, None, :, 3])
    member = in_x & in_y & valid[None, None, :]
    counts = jnp.sum(member.reshape(tb_y * tb_x, -1), axis=1, dtype=jnp.int32)
    return jnp.minimum(counts, cap)
