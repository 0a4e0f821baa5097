"""Scaling benchmark: pixels/s at 1 device vs an N-device mesh.

Measures the BASELINE.json scoreboard dimensions:
- per-device train throughput (Mpix/s) at the Kodak operating point;
- data-parallel aggregate throughput, both the legacy vmapped batch program
  and the shard_map per-device-unbatched program (the DP efficiency fix) —
  prints scaling efficiency vs the 1-device run;
- tile-sharded single-image step through the real trainer.

Runs on whatever devices are available (real chips, or CPU virtual devices
with XLA_FLAGS=--xla_force_host_platform_device_count=8 for a wiring check;
on CPU pass --small to keep runtimes sane). Prints one JSON line per
configuration.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true",
                   help="tiny operating point (CPU virtual-mesh runs)")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the JAX_PLATFORMS env var is "
                        "overridden by this machine's sitecustomize; only an "
                        "in-process config update sticks)")
    p.add_argument("--curve", action="store_true",
                   help="sweep the data-parallel shard_map program over "
                        "1..ndev-device submeshes and record steps/s/device "
                        "— the scaling-efficiency curve (on CPU virtual "
                        "devices the submeshes share physical cores, so the "
                        "curve is a lower bound on real-chip efficiency)")
    p.add_argument("--out", default=None,
                   help="also write the emitted JSON records to this file")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    import jax.numpy as jnp

    from gaussianimage_plus_tpu.models import GaussianConfig
    from gaussianimage_plus_tpu.train import TrainConfig
    from gaussianimage_plus_tpu.train.trainer import init_train_state, train_chunk
    from gaussianimage_plus_tpu.parallel import (
        batch_train_chunk,
        batch_train_chunk_dp,
        init_batch_train_state,
        make_mesh,
        make_tile_sharded_render,
        shard_batch,
    )

    ndev = len(jax.devices())
    if args.small:
        H, W, N = 128, 192, 512
        steps = args.steps or 10
    else:
        H, W, N = 512, 768, 5000
        steps = args.steps or 50
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    cfg = GaussianConfig(H=H, W=W, max_num_points=N)
    tcfg = TrainConfig(iterations=1000, lr=0.018)

    def sync(x):
        return np.asarray(jax.tree.leaves(x)[0])[0]

    records = []

    def emit(rec):
        records.append(rec)
        print(json.dumps(rec))

    # --- 1 device, 1 image ---
    ts = init_train_state(cfg, tcfg, N, 0)
    ts, _ = train_chunk(ts, gt, cfg, tcfg, steps, True, False)
    sync(ts.gaussians.params.xyz)
    t0 = time.perf_counter()
    ts, _ = train_chunk(ts, gt, cfg, tcfg, steps, True, False)
    sync(ts.gaussians.params.xyz)
    base = (time.perf_counter() - t0) / steps
    base_mpix = H * W / base / 1e6
    emit({"config": "1dev_1img", "ms_per_step": round(base * 1e3, 2),
          "mpix_s": round(base_mpix, 1)})

    if ndev > 1:
        mesh = make_mesh((ndev,), ("data",))
        gts = jnp.tile(gt[None], (ndev, 1, 1, 1))

        def run_dp(label, chunk_fn):
            tss = init_batch_train_state(cfg, tcfg, N, ndev)
            tss = shard_batch(tss, mesh)
            gts_s = shard_batch(gts, mesh)
            tss, _ = chunk_fn(tss, gts_s)
            sync(tss.gaussians.params.xyz)
            t0 = time.perf_counter()
            tss, _ = chunk_fn(tss, gts_s)
            sync(tss.gaussians.params.xyz)
            dt = (time.perf_counter() - t0) / steps
            agg = ndev * H * W / dt / 1e6
            emit({"config": label, "ms_per_step": round(dt * 1e3, 2),
                  "aggregate_mpix_s": round(agg, 1),
                  "scaling_efficiency": round(agg / (base_mpix * ndev), 3)})

        run_dp(f"{ndev}dev_dp_vmap",
               lambda tss, g: batch_train_chunk(tss, g, cfg, tcfg, steps,
                                                True, False))
        run_dp(f"{ndev}dev_dp_shardmap",
               lambda tss, g: batch_train_chunk_dp(tss, g, cfg, tcfg, steps,
                                                   True, False, False, mesh))

        # --- tile-sharded single image through the real trainer ---
        mesh2 = make_mesh((ndev,), ("tile",))
        render_fn = make_tile_sharded_render(mesh2, cfg, axis="tile")
        ts2 = init_train_state(cfg, tcfg, N, 1)
        ts2, _ = train_chunk(ts2, gt, cfg, tcfg, steps, True, False,
                             render_fn=render_fn)
        sync(ts2.gaussians.params.xyz)
        t0 = time.perf_counter()
        ts2, _ = train_chunk(ts2, gt, cfg, tcfg, steps, True, False,
                             render_fn=render_fn)
        sync(ts2.gaussians.params.xyz)
        dt = (time.perf_counter() - t0) / steps
        emit({"config": f"{ndev}dev_tile_sharded",
              "ms_per_step": round(dt * 1e3, 2),
              "mpix_s": round(H * W / dt / 1e6, 1)})

    if args.curve and ndev > 1:
        # DP scaling-efficiency curve over 1..ndev-device submeshes: each
        # point runs the shard_map per-device-unbatched chunk with one image
        # per device (the pod-scale fit_global_batch program) and records
        # steps/s/device normalized to the 1-device point.
        from jax.sharding import Mesh
        curve = []
        per_dev_base = None
        k = 1
        while k <= ndev:
            submesh = Mesh(np.asarray(jax.devices()[:k]), ("data",))
            tss = init_batch_train_state(cfg, tcfg, N, k)
            tss = shard_batch(tss, submesh)
            gts_k = shard_batch(jnp.tile(gt[None], (k, 1, 1, 1)), submesh)
            run = lambda t: batch_train_chunk_dp(t, gts_k, cfg, tcfg, steps,
                                                 True, False, False, submesh)
            tss2 = run(tss)[0]
            sync(tss2.gaussians.params.xyz)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                tss2 = run(tss)[0]
                sync(tss2.gaussians.params.xyz)
                best = min(best, time.perf_counter() - t0)
            sps_dev = steps / best  # global steps/s == per-device steps/s
            if per_dev_base is None:
                per_dev_base = sps_dev
            curve.append({"devices": k,
                          "steps_per_s_per_device": round(sps_dev, 3),
                          "efficiency_vs_1dev": round(sps_dev / per_dev_base, 3)})
            k *= 2
        emit({"config": "dp_curve", "platform": jax.default_backend(),
              "operating_point": f"{H}x{W} N={N}", "curve": curve})

    if args.out:
        with open(args.out, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
