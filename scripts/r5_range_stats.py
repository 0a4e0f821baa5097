"""Range-widening diagnostic for the chunk-range decoder (CPU, no TPU).

The chunk-range decoder visits, per tile, every chunk in a single Morton-id
interval [lo, hi).  A single large-radius Gaussian covering many tiles drags
every covered tile's interval wide, so visits >> members.  This script
measures, on committed repr states, how much of the decoder's work is that
widening — and how much a "big prefix" layout (largest-area Gaussians
segregated into leading chunks that every tile sweeps densely, Morton order
for the rest) would recover.

Pure numpy on the committed npz states; run anywhere.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from gaussianimage_plus_tpu.core.gaussian2d import (  # noqa: E402
    BLOCK_H, BLOCK_W, project_gaussians_2d_covariance, tile_bbox,
    tile_bounds_for)
from gaussianimage_plus_tpu.core.binning import morton_perm  # noqa: E402


def tile_member_matrix(xys, radii, valid, H, W):
    tb_x, tb_y = tile_bounds_for(H, W)
    xmin, xmax, ymin, ymax = (np.asarray(a) for a in tile_bbox(
        jnp.asarray(xys), jnp.asarray(radii, np.float32), (tb_x, tb_y),
        BLOCK_H, BLOCK_W))
    tx = np.arange(tb_x, dtype=np.float32)
    ty = np.arange(tb_y, dtype=np.float32)
    in_x = (tx[None, :, None] >= xmin[None, None, :]) & (tx[None, :, None] < xmax[None, None, :])
    in_y = (ty[:, None, None] >= ymin[None, None, :]) & (ty[:, None, None] < ymax[None, None, :])
    member = (in_x & in_y & valid[None, None, :]).reshape(tb_x * tb_y, -1)
    return member  # [T, N]


def range_stats(member, kc):
    """visits per tile under single-interval chunk ranges vs true members."""
    T, N = member.shape
    ids = np.arange(N)
    has = member.any(axis=1)
    lo_id = np.where(member, ids[None, :], N).min(axis=1)
    hi_id = np.where(member, ids[None, :], -1).max(axis=1)
    lo_c = np.where(has, lo_id // kc, 0)
    hi_c = np.where(has, hi_id // kc + 1, 0)
    visits = (hi_c - lo_c)
    # true distinct member chunks per tile
    nch = -(-N // kc)
    chunk_of = ids // kc
    mem_chunks = np.zeros((T,), np.int64)
    for c in range(nch):
        mem_chunks += member[:, chunk_of == c].any(axis=1)
    return visits, mem_chunks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("state")
    ap.add_argument("--kc", type=int, default=64)
    ap.add_argument("--big_tiles", type=float, default=0.0,
                    help="area threshold in tiles for the big prefix; 0 = off")
    ap.add_argument("--big_frac", type=float, default=0.0,
                    help="fraction of N segregated as big (by tile area); 0 = off")
    args = ap.parse_args()

    d = np.load(args.state)
    H, W = int(d["H"]), int(d["W"])
    xyz = d["xyz"]
    cov = d["cov2d"] + d["bound"]
    active = d["active"]

    proj = project_gaussians_2d_covariance(
        jnp.asarray(xyz), jnp.asarray(cov), H, W)
    valid = np.asarray(proj.valid) & active
    xys = np.asarray(proj.xys)
    radii = np.asarray(proj.radii)

    perm = np.asarray(morton_perm(jnp.asarray(xys), jnp.asarray(valid), H, W))
    member = tile_member_matrix(xys[perm], radii[perm], valid[perm], H, W)
    T, N = member.shape
    nch = -(-N // args.kc)
    counts = member.sum(axis=1)

    visits, mem_chunks = range_stats(member, args.kc)
    print(f"{args.state}: N={N} T={T} kc={args.kc} chunks={nch}")
    print(f"members/tile   mean {counts.mean():7.1f}  p50 {np.median(counts):5.0f}  max {counts.max()}")
    print(f"memchunks/tile mean {mem_chunks.mean():7.2f}  p50 {np.median(mem_chunks):5.0f}  max {mem_chunks.max()}")
    print(f"range visits   mean {visits.mean():7.2f}  p50 {np.median(visits):5.0f}  max {visits.max()}  total {visits.sum()}")
    print(f"dense visits/tile = {nch};  range/dense = {visits.mean()/nch:.3f}")

    # --- big-prefix layout: segregate the largest-area gaussians up front,
    # Morton for the rest; every tile sweeps [0, nbig_chunks) + its range.
    area_tiles = member.sum(axis=0)  # tiles covered per (permuted) gaussian
    for big_q in (0.99, 0.98, 0.95):
        thr = np.quantile(area_tiles[valid[perm]], big_q)
        big = area_tiles > thr
        nbig = int(big.sum())
        nbig_pad = -(-nbig // args.kc) * args.kc
        order = np.argsort(~big, kind="stable")  # bigs first, morton kept
        m2 = member[:, order]
        small = m2[:, nbig:]
        v2, _ = range_stats(small, args.kc)
        nbig_ch = -(-nbig // args.kc)
        tot = v2 + nbig_ch  # every tile also sweeps the big prefix
        print(f"big>q{big_q}: nbig={nbig} ({nbig_ch} ch) visits mean "
              f"{tot.mean():6.2f} p50 {np.median(tot):4.0f} max {tot.max()}"
              f"  total {tot.sum()}  vs plain {visits.sum()}"
              f"  ({visits.sum()/max(tot.sum(),1):.2f}x fewer)")


if __name__ == "__main__":
    main()
