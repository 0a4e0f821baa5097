"""Round-4 on-hardware A/B: sweep-mode training + sweep decode vs the
binned defaults, at the Kodak cap-256 operating point (and optionally 2K).

In-scan marginal two-length protocol throughout (per-dispatch overhead
through the relay is 0.1-3.4 s; see EXPERIMENTS.md timing protocol).
Prints one JSON line per measurement.

Usage: python scripts/r4_perf.py [--with_2k]
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--with_2k", action="store_true")
    p.add_argument("--timeout", type=float, default=1500.0)
    args = p.parse_args(argv)

    import threading

    def watch():
        time.sleep(args.timeout)
        print(json.dumps({"error": f"r4_perf timed out ({args.timeout}s)"}),
              flush=True)
        os._exit(2)

    threading.Thread(target=watch, daemon=True).start()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp

    from gaussianimage_plus_tpu.models import GaussianConfig
    from gaussianimage_plus_tpu.train import TrainConfig, init_train_state, train_chunk
    from gaussianimage_plus_tpu.utils.image_io import load_image

    gt = load_image("/root/reference/datasets/kodak/kodim01.png")
    H, W = gt.shape[:2]
    N = 5000
    gt_j = jnp.asarray(gt)

    def marginal_step(cfg, tcfg, warm_chunks=1):
        ts = init_train_state(cfg, tcfg, N, seed=0)
        for _ in range(warm_chunks):
            ts, _ = train_chunk(ts, gt_j, cfg, tcfg, 100, True, False)
        _ = np.asarray(ts.gaussians.params.xyz)
        times = {}
        for n in (20, 120):
            best = float("inf")
            tsn, _ = train_chunk(ts, gt_j, cfg, tcfg, n, False, False)
            _ = np.asarray(tsn.gaussians.params.xyz)
            for _ in range(3):
                t0 = time.perf_counter()
                tsn, _ = train_chunk(ts, gt_j, cfg, tcfg, n, False, False)
                _ = np.asarray(tsn.gaussians.params.xyz)
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        d = times[120] - times[20]
        return (d / 100 if d > 0.005 else times[120] / 120), ts

    tcfg = TrainConfig(iterations=1000, lr=0.018)
    cfg_b = GaussianConfig(H=H, W=W, max_num_points=N, tile_cap=256)
    dt_b, ts_b = marginal_step(cfg_b, tcfg)
    print(json.dumps({"config": "binned_cap256", "train_step_ms":
                      round(dt_b * 1e3, 3)}), flush=True)

    cfg_s = dataclasses.replace(cfg_b, raster_backend="sweep")
    tcfg_s = tcfg.replace(morton_resort=True)
    dt_s, ts_s = marginal_step(cfg_s, tcfg_s)
    print(json.dumps({"config": "sweep_morton", "train_step_ms":
                      round(dt_s * 1e3, 3)}), flush=True)

    # quality cross-check: the two backends fit the same image to the same
    # PSNR at 600 steps (sweep is cap-free; nothing overflows here)
    from gaussianimage_plus_tpu.train.metrics import psnr as psnr_fn
    from gaussianimage_plus_tpu.models import render
    pb = float(psnr_fn(jnp.clip(render(ts_b.gaussians, cfg_b), 0, 1), gt_j))
    ps = float(psnr_fn(jnp.clip(render(ts_s.gaussians, cfg_s), 0, 1), gt_j))
    print(json.dumps({"config": "quality_600step", "binned_psnr": round(pb, 4),
                      "sweep_psnr": round(ps, 4)}), flush=True)

    # sweep WITHOUT resort (id order): how much the Morton layout buys
    dt_sn, _ = marginal_step(cfg_s, tcfg)
    print(json.dumps({"config": "sweep_id_order", "train_step_ms":
                      round(dt_sn * 1e3, 3)}), flush=True)

    if args.with_2k:
        H2, W2, N2 = 1344, 2040, 20000
        rng2 = np.random.default_rng(1)
        gt2 = jnp.asarray(np.kron(rng2.uniform(0, 1, (84, 128, 3)),
                                  np.ones((16, 16, 1)))[:H2, :W2]
                          .astype(np.float32))

        def marginal_2k(cfg, tcfg):
            ts = init_train_state(cfg, tcfg, N2, seed=0)
            ts, _ = train_chunk(ts, gt2, cfg, tcfg, 100, True, False)
            _ = np.asarray(ts.gaussians.params.xyz)
            times = {}
            for n in (20, 120):
                best = float("inf")
                tsn, _ = train_chunk(ts, gt2, cfg, tcfg, n, False, False)
                _ = np.asarray(tsn.gaussians.params.xyz)
                for _ in range(3):
                    t0 = time.perf_counter()
                    tsn, _ = train_chunk(ts, gt2, cfg, tcfg, n, False, False)
                    _ = np.asarray(tsn.gaussians.params.xyz)
                    best = min(best, time.perf_counter() - t0)
                times[n] = best
            d = times[120] - times[20]
            return d / 100 if d > 0.005 else times[120] / 120

        cfg2b = GaussianConfig(H=H2, W=W2, max_num_points=N2, tile_cap=256)
        print(json.dumps({"config": "binned_2k", "train_step_ms":
                          round(marginal_2k(cfg2b, tcfg) * 1e3, 3)}), flush=True)
        cfg2s = dataclasses.replace(cfg2b, raster_backend="sweep")
        print(json.dumps({"config": "sweep_2k", "train_step_ms":
                          round(marginal_2k(cfg2s, tcfg_s) * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
