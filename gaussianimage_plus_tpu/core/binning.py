"""Tile binning: fixed-capacity per-tile Gaussian lists with static shapes.

TPU-native replacement for the reference's dynamic intersection machinery
(``compute_cumulative_intersects`` + ``map_gaussian_to_intersects`` +
``torch.sort`` + ``get_tile_bin_edges``, gsplat/gsplat/utils.py:231-311 and
forward.cu:141-233). The reference builds a variable-length sorted
(tile, gaussian) list and syncs to the host for the total count every step;
here every shape is static and the whole step stays on device:

- membership: a [T, N] boolean matrix (tile t inside Gaussian n's projected
  tile bbox, n valid), identical to the coverage the reference's per-Gaussian
  bbox loop emits (forward.cu:172-199).
- capacity: each tile keeps the first ``cap`` members in Gaussian-index
  order. The reference sorts intersections by a key that is the bare tile id
  (depths are all zero: foward2d.cu:218 writes depth 0, so the packed key
  ``tile_id << 32 | float_bits(0)`` compares equal within a tile) and the
  rasterizer consumes at most BLOCK_SIZE=256 of them (forward.cu:673), with
  undefined order among the equal keys. Index order is the deterministic
  choice here and matches the order map_gaussian_to_intersects emits before
  the (unstable) sort.

Capacity overflow policy: with ``cap=256`` this reproduces the reference's
silent per-tile cap ("bit-parity mode"); larger caps are the quality knob the
reference lacks.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .gaussian2d import BLOCK_H, BLOCK_W, Projected, tile_bbox, tile_bounds_for


class TileBins(NamedTuple):
    """Fixed-capacity per-tile Gaussian lists.

    ids:   [T, cap] int32 Gaussian indices (undefined where ~mask, clamped
           into range so gathers are always safe).
    mask:  [T, cap] bool — slot holds a real member.
    count: [T] int32 — number of members kept (== min(#members, cap)).
    super_overflow: scalar int32 (hier method only, else None) — total
           candidates dropped at the super-tile level. Nonzero means the
           hier result may differ from the exact flat binning even for
           tiles whose own occupancy is under ``cap`` (ADVICE r2): check
           it when validating large-grid sweeps.
    """

    ids: jax.Array
    mask: jax.Array
    count: jax.Array
    super_overflow: jax.Array | None = None


def _membership(proj: Projected, tile_bounds: Tuple[int, int],
                block_h: int, block_w: int) -> jax.Array:
    tb_x, tb_y = tile_bounds
    xmin, xmax, ymin, ymax = tile_bbox(
        proj.xys, proj.radii.astype(jnp.float32), tile_bounds, block_h, block_w)
    tx = jnp.arange(tb_x, dtype=jnp.int32)
    ty = jnp.arange(tb_y, dtype=jnp.int32)
    in_x = (tx[None, :, None] >= xmin[None, None, :]) & (tx[None, :, None] < xmax[None, None, :])
    in_y = (ty[:, None, None] >= ymin[None, None, :]) & (ty[:, None, None] < ymax[None, None, :])
    member = (in_x & in_y) & proj.valid[None, None, :]
    return member.reshape(tb_y * tb_x, -1)  # [T, N], y-major tile order


def _membership_rows(proj: Projected, tile_bounds: Tuple[int, int],
                     block_h: int, block_w: int,
                     tile_start, n_tiles: int) -> jax.Array:
    """[n_tiles, N] membership for the flat y-major tile rows
    [tile_start, tile_start + n_tiles). ``tile_start`` may be traced (a
    shard offset from ``lax.axis_index``); rows beyond the real grid are
    all-False. This is the per-shard binning primitive: each device of a
    tile-sharded mesh bins only its own rows instead of the full [T, N]
    grid (the full-grid recompute per shard would grow with device count)."""
    tb_x, tb_y = tile_bounds
    xmin, xmax, ymin, ymax = tile_bbox(
        proj.xys, proj.radii.astype(jnp.float32), tile_bounds, block_h, block_w)
    t = tile_start + jnp.arange(n_tiles, dtype=jnp.int32)
    tx = t % tb_x
    ty = t // tb_x
    in_x = (tx[:, None] >= xmin[None, :]) & (tx[:, None] < xmax[None, :])
    in_y = (ty[:, None] >= ymin[None, :]) & (ty[:, None] < ymax[None, :])
    in_grid = (t < tb_x * tb_y)[:, None]
    return in_x & in_y & in_grid & proj.valid[None, :]


def bin_gaussians(proj: Projected, H: int, W: int, cap: int = 256,
                  block_h: int = BLOCK_H, block_w: int = BLOCK_W,
                  method: str = "top_k", super_size: int = 8,
                  super_cap: int = 0) -> TileBins:
    """Build per-tile member lists. ``method``: 'scatter' | 'top_k' | 'hier'.

    'scatter' and 'top_k' are exact and deterministic over the full [T, N]
    membership matrix; they differ only in which XLA primitive carries the
    selection. 'hier' is the two-level scheme for large tile grids (2K+):
    coarse-bin into ``super_size`` x ``super_size`` tile super-tiles capped at
    ``super_cap`` candidates, then refine each tile against only its
    super-tile's candidates — O(S*N + T*super_cap) instead of O(T*N) work
    (27x less at the DIV2K point). Identical ids/mask/count to the flat
    methods whenever no super-tile exceeds ``super_cap`` members; overflow
    drops the highest-index candidates, the same silent-cap policy as ``cap``
    itself (forward.cu:673). ``super_cap=0`` picks ``max(4*cap, 512)``.
    """
    tb = tile_bounds_for(H, W, block_h, block_w)
    if method == "auto":
        # flat [T, N] membership + top_k wins at Kodak scale; the two-level
        # scheme wins once the membership matrix is large (measured 42 vs
        # 313 ms/step at the 2K/20k-point DIV2K operating point)
        N = proj.xys.shape[0]
        method = "hier" if tb[0] * tb[1] * N > 32_000_000 else "top_k"
    if method == "hier":
        return _bin_hier(proj, tb, cap, block_h, block_w, super_size,
                         super_cap or max(4 * cap, 512))
    member = _membership(proj, tb, block_h, block_w)          # [T, N]
    return _select_members(member, cap, method)


def _bin_hier(proj: Projected, tile_bounds: Tuple[int, int], cap: int,
              block_h: int, block_w: int, ss, super_cap: int) -> TileBins:
    """Two-level binning. Level 1 bins Gaussians into super-tiles (a bbox
    test at super-tile granularity, [S, N]); level 2 tests each tile only
    against its super-tile's candidate list ([T, super_cap]).

    ``ss`` is the super-tile shape in tiles: an int for square super-tiles or
    an ``(ss_y, ss_x)`` tuple — e.g. ``(1, tb_x)`` makes each super-tile a
    full tile ROW, which shrinks level 2's candidate axis from N to the
    row's population."""
    tb_x, tb_y = tile_bounds
    N = proj.xys.shape[0]
    ss_y, ss_x = (ss, ss) if isinstance(ss, int) else ss
    sb_x, sb_y = -(-tb_x // ss_x), -(-tb_y // ss_y)
    S = sb_x * sb_y
    super_cap = min(super_cap, N)

    xmin, xmax, ymin, ymax = tile_bbox(
        proj.xys, proj.radii.astype(jnp.float32), tile_bounds, block_h, block_w)

    # ---- level 1: super-tile membership + candidate compaction ----
    sxmin, sxmax = xmin // ss_x, -(-xmax // ss_x)  # [N] in super-tile units
    symin, symax = ymin // ss_y, -(-ymax // ss_y)
    sx = jnp.arange(sb_x, dtype=jnp.int32)
    sy = jnp.arange(sb_y, dtype=jnp.int32)
    in_x = (sx[None, :, None] >= sxmin[None, None, :]) & \
           (sx[None, :, None] < sxmax[None, None, :])
    in_y = (sy[:, None, None] >= symin[None, None, :]) & \
           (sy[:, None, None] < symax[None, None, :])
    s_member = (in_x & in_y & proj.valid[None, None, :]).reshape(S, N)
    # surfaced divergence signal: candidates silently dropped at level 1
    s_count = jnp.sum(s_member, axis=1, dtype=jnp.int32)
    overflow = jnp.sum(jnp.maximum(s_count - super_cap, 0))
    cand = _select_members(s_member, super_cap, "top_k")       # ascending ids

    # per-candidate tile bboxes, gathered once per super-tile [S, super_cap]
    c_xmin, c_xmax = xmin[cand.ids], xmax[cand.ids]
    c_ymin, c_ymax = ymin[cand.ids], ymax[cand.ids]

    # ---- level 2: each tile vs its super-tile's candidates ----
    t = jnp.arange(tb_y * tb_x, dtype=jnp.int32)
    tx, ty = t % tb_x, t // tb_x
    s_of_t = (ty // ss_y) * sb_x + (tx // ss_x)                # [T]
    in_x2 = (tx[:, None] >= c_xmin[s_of_t]) & (tx[:, None] < c_xmax[s_of_t])
    in_y2 = (ty[:, None] >= c_ymin[s_of_t]) & (ty[:, None] < c_ymax[s_of_t])
    member2 = in_x2 & in_y2 & cand.mask[s_of_t]                # [T, super_cap]
    sel = _select_members(member2, cap, "top_k")               # cols into cand
    ids = cand.ids[s_of_t[:, None], sel.ids]                   # ascending: both
    ids = jnp.where(sel.mask, ids, 0)                          # levels preserve
    return TileBins(ids=ids, mask=sel.mask, count=sel.count,   # index order
                    super_overflow=overflow)                   # both levels


def bin_gaussian_rows(proj: Projected, H: int, W: int, tile_start,
                      n_tiles: int, cap: int = 256,
                      block_h: int = BLOCK_H, block_w: int = BLOCK_W,
                      method: str = "top_k") -> TileBins:
    """`bin_gaussians` restricted to a contiguous flat tile-row range —
    identical ids/mask/count to slicing the full result rows
    [tile_start : tile_start+n_tiles], at 1/n_shards of the work."""
    tb = tile_bounds_for(H, W, block_h, block_w)
    member = _membership_rows(proj, tb, block_h, block_w, tile_start, n_tiles)
    return _select_members(member, cap, method)


def bin_gaussian_rows_hier(proj: Projected, H: int, W: int, tile_start,
                           n_tiles: int, cap: int = 256,
                           block_h: int = BLOCK_H, block_w: int = BLOCK_W,
                           band_rows: int = 4,
                           super_cap: int = 0) -> TileBins:
    """Two-level ``bin_gaussian_rows``: the hier scheme composed with tile
    sharding (the r2 verdict's missing composition, sharded.py fell back to
    flat per-shard binning).

    Level 1 bins Gaussians into full-width bands of ``band_rows`` tile rows
    covering the shard's flat range (band origin may be traced — a shard
    offset from ``lax.axis_index``); level 2 tests each of the shard's tiles
    only against its band's ``super_cap`` candidates. Identical
    ids/mask/count to ``bin_gaussian_rows`` whenever no band overflows
    (``super_overflow`` reports drops, same policy as ``_bin_hier``); work is
    O(B*N + n_tiles*super_cap) instead of O(n_tiles*N)."""
    tb = tile_bounds_for(H, W, block_h, block_w)
    tb_x, tb_y = tb
    N = proj.xys.shape[0]
    super_cap = min(super_cap or max(4 * cap, 512), N)

    xmin, xmax, ymin, ymax = tile_bbox(
        proj.xys, proj.radii.astype(jnp.float32), tb, block_h, block_w)

    # static band count covering every y-row the shard's flat range can touch
    rows_max = (n_tiles - 1) // tb_x + 2
    B = rows_max // band_rows + 2
    b_first = (tile_start // tb_x) // band_rows
    b_idx = b_first + jnp.arange(B, dtype=jnp.int32)           # [B]
    band_y0 = b_idx * band_rows
    band_y1 = band_y0 + band_rows

    # ---- level 1: band membership (y-interval overlap) + compaction ----
    in_y = (ymin[None, :] < band_y1[:, None]) & (ymax[None, :] > band_y0[:, None])
    in_grid = (band_y0 < tb_y)[:, None]
    member1 = in_y & in_grid & proj.valid[None, :]             # [B, N]
    s_count = jnp.sum(member1, axis=1, dtype=jnp.int32)
    overflow = jnp.sum(jnp.maximum(s_count - super_cap, 0))
    cand = _select_members(member1, super_cap, "top_k")

    c_xmin, c_xmax = xmin[cand.ids], xmax[cand.ids]            # [B, super_cap]
    c_ymin, c_ymax = ymin[cand.ids], ymax[cand.ids]

    # ---- level 2: each local tile vs its band's candidates ----
    t = tile_start + jnp.arange(n_tiles, dtype=jnp.int32)
    tx, ty = t % tb_x, t // tb_x
    b_of_t = jnp.clip(ty // band_rows - b_first, 0, B - 1)     # [n_tiles]
    in_x2 = (tx[:, None] >= c_xmin[b_of_t]) & (tx[:, None] < c_xmax[b_of_t])
    in_y2 = (ty[:, None] >= c_ymin[b_of_t]) & (ty[:, None] < c_ymax[b_of_t])
    in_grid2 = (t < tb_x * tb_y)[:, None]
    member2 = in_x2 & in_y2 & cand.mask[b_of_t] & in_grid2     # [n_tiles, sc]
    sel = _select_members(member2, cap, "top_k")
    ids = cand.ids[b_of_t[:, None], sel.ids]                   # both levels
    ids = jnp.where(sel.mask, ids, 0)                          # id-ordered
    return TileBins(ids=ids, mask=sel.mask, count=sel.count,
                    super_overflow=overflow)


def _select_members(member: jax.Array, cap: int, method: str) -> TileBins:
    T, N = member.shape
    count_all = jnp.sum(member, axis=1, dtype=jnp.int32)
    count = jnp.minimum(count_all, cap)

    if method == "rank":
        # Exact id-order selection without a sort: the (s+1)-th member of a
        # row is the first n where the inclusive membership cumsum reaches
        # s+1 — a batched binary search over the nondecreasing rank rows.
        # O(T*(N + cap*log N)) gathers instead of top_k's per-row partial
        # sort — but measured SLOWER than lax.top_k on v5e at the Kodak
        # operating point (58.9 vs 12.4 ms/step, EXPERIMENTS.md round-3
        # A/B): the gather chain doesn't vectorize as well as XLA's fused
        # top_k. Kept as an exact option only; 'top_k' is the default.
        rank = jnp.cumsum(member, axis=1, dtype=jnp.int32)      # [T, N]
        k_eff = min(cap, N)
        targets = jnp.arange(1, k_eff + 1, dtype=jnp.int32)[None, :]
        lo = jnp.zeros((T, k_eff), jnp.int32)
        hi = jnp.full((T, k_eff), N, jnp.int32)
        for _ in range(max(N, 2).bit_length()):
            mid = (lo + hi) >> 1
            vals = jnp.take_along_axis(rank, jnp.minimum(mid, N - 1), axis=1)
            go_right = vals < targets
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        mask = targets <= count[:, None]
        ids = jnp.where(mask, jnp.minimum(lo, N - 1), 0)
        if k_eff < cap:
            ids = jnp.pad(ids, ((0, 0), (0, cap - k_eff)))
            mask = jnp.pad(mask, ((0, 0), (0, cap - k_eff)))
        return TileBins(ids=ids, mask=mask, count=count)

    if method == "scatter":
        rank = jnp.cumsum(member, axis=1, dtype=jnp.int32) - 1     # [T, N]
        slot = jnp.where(member & (rank < cap), rank, cap)          # cap -> dropped
        gidx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (T, N))
        ids = jnp.full((T, cap), 0, dtype=jnp.int32)
        # one scatter per tile row; 'drop' discards slot==cap writes
        ids = jax.vmap(lambda i, s, g: i.at[s].set(g, mode="drop"))(ids, slot, gidx)
        slot_ids = jnp.arange(cap, dtype=jnp.int32)
        mask = slot_ids[None, :] < count[:, None]
    elif method == "top_k":
        # key: members get N - index (descending over index), non-members 0.
        key = jnp.where(member, N - jnp.arange(N, dtype=jnp.int32)[None, :], 0)
        k_eff = min(cap, N)

        # Occupancy-adaptive k: when every tile's (unclipped) count fits in a
        # smaller tier, top_k at that tier selects exactly the same members
        # (keys descending == ids ascending, surplus columns all-empty) —
        # lax.top_k cost grows with k, and converged Kodak states occupy
        # ~30-80 of cap 256. Runtime lax.switch, exact at every state.
        def tk(k_tier):
            def f(_):
                topv, _ = jax.lax.top_k(key, k_tier)       # [T, k_tier] desc
                if k_tier < cap:
                    return jnp.pad(topv, ((0, 0), (0, cap - k_tier)))
                return topv
            return f

        tiers = [t for t in (64, 128) if t < k_eff] + [k_eff]
        if len(tiers) == 1:
            topv = tk(k_eff)(None)
        else:
            max_c = jnp.max(count_all)
            idx = sum((max_c > t).astype(jnp.int32) for t in tiers[:-1])
            topv = jax.lax.switch(idx, [tk(t) for t in tiers], None)
        mask = topv > 0
        ids = jnp.where(mask, N - topv, 0)
    else:
        raise ValueError(f"unknown binning method {method!r}")
    return TileBins(ids=ids, mask=mask, count=count)


def morton_perm(xys: jax.Array, valid: jax.Array, H: int, W: int,
                block_h: int = BLOCK_H, block_w: int = BLOCK_W) -> jax.Array:
    """[N] permutation sorting Gaussians by the Morton (Z-order) code of
    their center's tile — invalid rows last.

    Spatial stream layout for the chunk-skip sweep decoder
    (``kernels.raster_dense_pallas.rasterize_sweep_pallas``): after this
    permutation a tile's members occupy a handful of contiguous chunks, so
    the sweep skips ~90% of its transcendental work. Rendering is
    order-invariant (accumulation blending sums; the only order-sensitive
    semantics is WHICH ids clip at an over-``cap`` tile, reference
    forward.cu:673 — converged states don't overflow)."""
    tb_x, tb_y = tile_bounds_for(H, W, block_h, block_w)
    tx = jnp.clip((xys[:, 0] // block_w).astype(jnp.int32), 0, tb_x - 1)
    ty = jnp.clip((xys[:, 1] // block_h).astype(jnp.int32), 0, tb_y - 1)

    def spread(v):  # interleave-ready bit spread, 16 -> 32 bits
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    code = spread(tx) | (spread(ty) << 1)
    code = jnp.where(valid, code, jnp.int32(2**30))  # invalid last
    return jnp.argsort(code, stable=True)


def gather_tile_attrs(bins: TileBins, *arrays: jax.Array):
    """Gather per-Gaussian arrays [N, ...] into per-tile layout [T, cap, ...]."""
    return tuple(a[bins.ids] for a in arrays)
