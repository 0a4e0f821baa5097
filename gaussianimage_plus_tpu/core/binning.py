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
    """

    ids: jax.Array
    mask: jax.Array
    count: jax.Array


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
                  method: str = "top_k") -> TileBins:
    """Build per-tile member lists. ``method``: 'scatter' | 'top_k'.

    Both methods are exact and deterministic; they differ only in which XLA
    primitive carries the selection (benchmark on hardware and pick).
    """
    tb = tile_bounds_for(H, W, block_h, block_w)
    member = _membership(proj, tb, block_h, block_w)          # [T, N]
    return _select_members(member, cap, method)


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


def _select_members(member: jax.Array, cap: int, method: str) -> TileBins:
    T, N = member.shape
    count_all = jnp.sum(member, axis=1, dtype=jnp.int32)
    count = jnp.minimum(count_all, cap)

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
        topv, _ = jax.lax.top_k(key, k_eff)                         # [T, k_eff] desc
        if k_eff < cap:
            topv = jnp.pad(topv, ((0, 0), (0, cap - k_eff)))
        mask = topv > 0
        ids = jnp.where(mask, N - topv, 0)
    else:
        raise ValueError(f"unknown binning method {method!r}")
    return TileBins(ids=ids, mask=mask, count=count)


def gather_tile_attrs(bins: TileBins, *arrays: jax.Array):
    """Gather per-Gaussian arrays [N, ...] into per-tile layout [T, cap, ...]."""
    return tuple(a[bins.ids] for a in arrays)
