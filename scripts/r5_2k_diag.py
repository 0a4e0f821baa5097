"""Isolate the 2K list-kernel compile failure (r5_perf: HTTP 500 from
tpu_compile_helper on the train_list_2k section).

Compiles/times each suspect separately at the 2K operating point
(1344x2040, N=20000) on a random warm-ish state: list/list_t forward,
list/list_t backward (direct call — no cond), full value_and_grad step,
each at a few (lmax, tb, mtb) shapes. Prints one JSON line per attempt.
Prime suspect: the fwd prefetch list [T=16128, lmax] int32 in SMEM
(lmax=8 -> 516 KB).

Usage: python scripts/r5_2k_diag.py
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv):
    import threading

    def watch():
        time.sleep(1800)
        print(json.dumps({"error": "r5_2k_diag timed out"}), flush=True)
        os._exit(2)

    threading.Thread(target=watch, daemon=True).start()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gaussianimage_plus_tpu.core.gaussian2d import (
        project_gaussians_2d_covariance)
    from gaussianimage_plus_tpu.core.binning import morton_perm
    from gaussianimage_plus_tpu.kernels import raster_list_pallas as rlp

    H, W, N = 1344, 2040, 20000
    rng = np.random.default_rng(7)
    xy = np.stack([rng.uniform(0, W, N), rng.uniform(0, H, N)], -1).astype(np.float32)
    a = rng.uniform(2.0, 40.0, N)
    c = rng.uniform(2.0, 40.0, N)
    b = rng.uniform(-0.8, 0.8, N) * np.sqrt(a * c)
    cov = np.stack([a, b, c], -1).astype(np.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
    opacity = jnp.ones((N,), jnp.float32)

    proj = project_gaussians_2d_covariance(jnp.asarray(xy), jnp.asarray(cov), H, W)
    perm = morton_perm(proj.xys, proj.valid, H, W)
    proj = proj._replace(xys=proj.xys[perm], conics=proj.conics[perm],
                         radii=proj.radii[perm],
                         num_tiles_hit=proj.num_tiles_hit[perm],
                         valid=proj.valid[perm])
    colors = colors[perm]
    cot = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))

    def attempt(name, fn):
        try:
            t0 = time.time()
            out = jax.block_until_ready(fn())
            print(json.dumps({"config": name, "ok": True,
                              "wall_s": round(time.time() - t0, 1)}),
                  flush=True)
            return True
        except Exception as e:
            print(json.dumps({"config": name, "ok": False,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
            return False

    for lmax, tb in ((8, 8), (4, 16), (8, 16), (4, 32)):
        rlp.LMAX, rlp.TB, rlp.TB_T = lmax, tb, tb
        attempt(f"fwd_list_t_2k_l{lmax}_tb{tb}",
                lambda: jax.jit(lambda: rlp.rasterize_list_t_pallas(
                    proj, colors, opacity, H, W))())
    rlp.LMAX, rlp.TB, rlp.TB_T = 8, 8, 16
    attempt("fwd_list_2k_l8_tb8",
            lambda: jax.jit(lambda: rlp.rasterize_list_pallas(
                proj, colors, opacity, H, W))())

    for mtb, tb in ((64, 8), (128, 16)):
        rlp.MTB, rlp.TB = mtb, tb
        attempt(f"bwd_list_t_2k_m{mtb}_tb{tb}",
                lambda: jax.jit(lambda: rlp.list_backward(
                    proj, colors, opacity, cot, H, W, layout="lanes"))())
    rlp.MTB, rlp.TB = 64, 8

    # full step (what r5_perf compiled): value_and_grad through rasterize_list_t
    def step():
        def loss(args):
            xys, conics, cols = args
            img = rlp.rasterize_list_t(xys, conics, cols, opacity,
                                       proj.radii, proj.valid, H, W)
            return jnp.sum(jnp.clip(img, 0, 1) * cot)
        return jax.jit(jax.grad(loss))((proj.xys, proj.conics, colors))

    attempt("grad_list_t_2k", step)


if __name__ == "__main__":
    main(sys.argv[1:])
