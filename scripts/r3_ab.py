"""Round-3 A/B: rank binning + inverse-map gather backward vs round-2 paths.

Times the isolated binning methods and the full train step in all four
(bin_method x grad-accum) combinations, and asserts numerical agreement of
the gather vs scatter gradients on hardware.

Usage: python scripts/r3_ab.py [--cap 256]
"""
import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--cap", type=int, default=256)
    p.add_argument("--warm_steps", type=int, default=600)
    p.add_argument("--n_small", type=int, default=20)
    p.add_argument("--n_large", type=int, default=120)
    p.add_argument("--trials", type=int, default=3)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussianimage_plus_tpu.models import GaussianConfig, render
    from gaussianimage_plus_tpu.models.gaussian_image import project
    from gaussianimage_plus_tpu.core.binning import bin_gaussians
    from gaussianimage_plus_tpu.train import (TrainConfig, init_train_state,
                                              train_chunk)
    from gaussianimage_plus_tpu.train.losses import loss_fn
    from gaussianimage_plus_tpu.utils.image_io import load_image

    gt = load_image("/root/reference/datasets/kodak/kodim01.png")
    H, W = gt.shape[:2]
    gt_j = jnp.asarray(gt)
    N = 5000
    cfg = GaussianConfig(H=H, W=W, max_num_points=N, tile_cap=args.cap)
    tcfg = TrainConfig(iterations=50000, lr=0.018)

    ts = init_train_state(cfg, tcfg, N, seed=0)
    ts, _ = train_chunk(ts, gt_j, cfg, tcfg, args.warm_steps, True, False)
    _ = np.asarray(ts.gaussians.params.xyz)
    gs = ts.gaussians
    area = np.asarray(jax.jit(
        lambda: project(gs.params, gs.active, gs.bound, cfg).num_tiles_hit)())
    print(f"warm state: n={int(gs.num_active)} bbox tiles max={area.max()} "
          f"p99={np.percentile(area, 99):.0f}", flush=True)

    def marginal(make_scan, tag):
        times = {}
        for n in (args.n_small, args.n_large):
            f = make_scan(n)
            out = f(jnp.zeros(()))
            _ = np.asarray(out)
            best = float("inf")
            for t in range(args.trials):
                t0 = time.perf_counter()
                out = f(jnp.asarray(t * 1e-9))
                _ = np.asarray(out)
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        dt = (times[args.n_large] - times[args.n_small]) / (
            args.n_large - args.n_small)
        print(f"{tag}: {dt*1e3:.3f} ms", flush=True)
        return dt

    # ---- binning isolation ----
    def make_bin_scan(method):
        def mk(n):
            @jax.jit
            def f(fb):
                def body(fb, _):
                    pr = project(gs.params.replace(xyz=gs.params.xyz + fb),
                                 gs.active, gs.bound, cfg)
                    bins = bin_gaussians(pr, cfg.H, cfg.W, cap=args.cap,
                                         method=method)
                    return fb + bins.ids[0, 0] * 1e-12, None
                fb, _ = jax.lax.scan(body, fb, None, length=n)
                return fb
            return f
        return mk

    marginal(make_bin_scan("top_k"), "project+bin top_k")
    marginal(make_bin_scan("rank"), "project+bin rank")

    # rank == top_k exactness on this state
    pr = jax.jit(lambda: project(gs.params, gs.active, gs.bound, cfg))()
    b_t = jax.jit(lambda: bin_gaussians(pr, cfg.H, cfg.W, cap=args.cap,
                                        method="top_k"))()
    b_r = jax.jit(lambda: bin_gaussians(pr, cfg.H, cfg.W, cap=args.cap,
                                        method="rank"))()
    same = bool(jnp.all(jnp.where(b_t.mask, b_t.ids, -1)
                        == jnp.where(b_r.mask, b_r.ids, -1)))
    print(f"rank ids == top_k ids: {same}", flush=True)
    assert same

    # ---- gather vs scatter gradients on hardware ----
    def grads(cfg_v):
        def obj(params):
            return loss_fn(render(gs.replace(params=params), cfg_v), gt_j,
                           "L2", 0.7)
        return jax.jit(jax.grad(obj))(gs.params)

    g_s = grads(dataclasses.replace(cfg, grad_gather_tiles=0))
    g_g = grads(dataclasses.replace(cfg, grad_gather_tiles=64))
    for name in ("xyz", "cov2d", "features"):
        a, b = np.asarray(getattr(g_g, name)), np.asarray(getattr(g_s, name))
        d = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30)
        print(f"gather-vs-scatter relmax[{name}] = {d:.2e}", flush=True)

    # ---- full train step, all combos ----
    def make_step(method, gtiles):
        cfg_m = dataclasses.replace(cfg, bin_method=method,
                                    grad_gather_tiles=gtiles)
        def mk(n):
            def f(fb):
                ts2 = ts.replace(gaussians=gs.replace(
                    params=gs.params.replace(xyz=gs.params.xyz + fb)))
                ts3, _ = train_chunk(ts2, gt_j, cfg_m, tcfg, n, False, False)
                return ts3.gaussians.params.xyz[0, 0]
            return f
        return mk

    for method in ("top_k", "rank"):
        for gtiles in (0, 64):
            marginal(make_step(method, gtiles),
                     f"full step bin={method} gather={gtiles}")


if __name__ == "__main__":
    main(sys.argv[1:])
