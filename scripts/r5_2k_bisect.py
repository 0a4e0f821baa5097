"""Bisect the 2K list-forward compile failure: which dimension triggers it?

Axes: points (N -> table/chunk count) vs tiles (T -> lst/grid/out size).
Runs the lane-major forward at mixed operating points and prints LONG
errors (the 300-char truncation hid the actual compiler message).
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
        time.sleep(1500)
        print(json.dumps({"error": "bisect timed out"}), flush=True)
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

    def scene(H, W, N, seed=7):
        rng = np.random.default_rng(seed)
        xy = np.stack([rng.uniform(0, W, N), rng.uniform(0, H, N)], -1
                      ).astype(np.float32)
        a = rng.uniform(2.0, 40.0, N)
        c = rng.uniform(2.0, 40.0, N)
        b = rng.uniform(-0.8, 0.8, N) * np.sqrt(a * c)
        cov = np.stack([a, b, c], -1).astype(np.float32)
        colors = jnp.asarray(rng.uniform(0, 1, (N, 3)).astype(np.float32))
        opacity = jnp.ones((N,), jnp.float32)
        proj = project_gaussians_2d_covariance(jnp.asarray(xy),
                                               jnp.asarray(cov), H, W)
        perm = morton_perm(proj.xys, proj.valid, H, W)
        proj = proj._replace(xys=proj.xys[perm], conics=proj.conics[perm],
                             radii=proj.radii[perm],
                             num_tiles_hit=proj.num_tiles_hit[perm],
                             valid=proj.valid[perm])
        return proj, colors[perm], opacity

    def attempt(name, H, W, N):
        proj, colors, opacity = scene(H, W, N)
        try:
            t0 = time.time()
            out = jax.block_until_ready(jax.jit(
                lambda: rlp.rasterize_list_t_pallas(proj, colors, opacity,
                                                    H, W))())
            print(json.dumps({"config": name, "ok": True,
                              "wall_s": round(time.time() - t0, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"config": name, "ok": False,
                              "error": f"{type(e).__name__}: {e}"[:2500]}),
                  flush=True)

    attempt("kodak_baseline_768x512_N5000", 512, 768, 5000)     # known good
    attempt("bigN_768x512_N20000", 512, 768, 20000)             # points axis
    attempt("bigT_2040x1344_N5000", 1344, 2040, 5000)           # tiles axis
    attempt("bigT_1024x768_N5000", 768, 1024, 5000)             # mid tiles
    attempt("full_2040x1344_N20000", 1344, 2040, 20000)         # both


if __name__ == "__main__":
    main(sys.argv[1:])
