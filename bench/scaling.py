"""Scaling benchmark: pixels/s at 1 chip / N chips / N hosts.

Measures the BASELINE.json scoreboard dimensions:
- per-chip train throughput (Mpix/s) at the Kodak operating point;
- batched multi-image aggregate throughput with the batch axis sharded over
  a device mesh (prints per-device efficiency vs the 1-device run);
- tile-sharded single-image step (the context-parallel analog) over a mesh.

Runs on whatever devices are available (real chips, or CPU virtual devices
with XLA_FLAGS=--xla_force_host_platform_device_count=8 for a wiring check).
Prints one JSON line per configuration.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    import jax.numpy as jnp

    from gaussianimage_plus_tpu.models import GaussianConfig, init_state
    from gaussianimage_plus_tpu.train import TrainConfig, init_train_state, train_chunk
    from gaussianimage_plus_tpu.parallel import (
        batch_train_chunk, image_to_tile_rows, init_batch_train_state,
        make_mesh, shard_batch, tile_sharded_train_step)

    ndev = len(jax.devices())
    H, W, N = 512, 768, 5000
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
    cfg = GaussianConfig(H=H, W=W, max_num_points=N)
    tcfg = TrainConfig(iterations=1000, lr=0.018)
    steps = 50

    def sync(x):
        return np.asarray(jax.tree.leaves(x)[0])[0]

    # --- 1 device, 1 image ---
    ts = init_train_state(cfg, tcfg, N, 0)
    ts, _ = train_chunk(ts, gt, cfg, tcfg, steps, True, False)
    sync(ts.gaussians.params.xyz)
    t0 = time.perf_counter()
    ts, _ = train_chunk(ts, gt, cfg, tcfg, steps, True, False)
    sync(ts.gaussians.params.xyz)
    base = (time.perf_counter() - t0) / steps
    base_mpix = H * W / base / 1e6
    print(json.dumps({"config": "1dev_1img", "ms_per_step": round(base * 1e3, 2),
                      "mpix_s": round(base_mpix, 1)}))

    if ndev > 1:
        # --- N devices, N images (data parallel) ---
        mesh = make_mesh((ndev,), ("data",))
        gts = jnp.tile(gt[None], (ndev, 1, 1, 1))
        tss = init_batch_train_state(cfg, tcfg, N, ndev)
        tss = shard_batch(tss, mesh)
        gts = shard_batch(gts, mesh)
        tss, _ = batch_train_chunk(tss, gts, cfg, tcfg, steps, True, False)
        sync(tss.gaussians.params.xyz)
        t0 = time.perf_counter()
        tss, _ = batch_train_chunk(tss, gts, cfg, tcfg, steps, True, False)
        sync(tss.gaussians.params.xyz)
        dt = (time.perf_counter() - t0) / steps
        agg = ndev * H * W / dt / 1e6
        print(json.dumps({
            "config": f"{ndev}dev_{ndev}img_dp", "ms_per_step": round(dt * 1e3, 2),
            "aggregate_mpix_s": round(agg, 1),
            "scaling_efficiency": round(agg / (base_mpix * ndev), 3)}))

        # --- tile-sharded single image over 2 devices ---
        mesh2 = make_mesh((1, 2), ("data", "tile"))
        state = init_state(cfg, N, jax.random.PRNGKey(1))
        import optax
        step, tx = tile_sharded_train_step(mesh2, cfg, tcfg, axis="tile")
        opt_state = tx.init(state.params)
        gt_tiles = image_to_tile_rows(gt, cfg)
        state, opt_state, loss = step(state, opt_state, gt_tiles)
        sync(state.params.xyz)
        t0 = time.perf_counter()
        for _ in range(20):
            state, opt_state, loss = step(state, opt_state, gt_tiles)
        sync(state.params.xyz)
        dt = (time.perf_counter() - t0) / 20
        print(json.dumps({"config": "2dev_tile_sharded",
                          "ms_per_step": round(dt * 1e3, 2),
                          "mpix_s": round(H * W / dt / 1e6, 1)}))


if __name__ == "__main__":
    main()
