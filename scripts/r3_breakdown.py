"""Round-3 step-component breakdown at the Kodak cap-256 operating point.

Where do the ~12.7 ms/step go? Times (in-scan marginal protocol, host-fetch
synced, min of trials) the full train step and its isolated components:

  - binning alone (top_k vs hier at Kodak scale — the queued r2 experiment)
  - forward render (project+bin+raster)
  - fwd+bwd (value_and_grad of the loss)
  - the backward's 9-channel scatter-add in isolation
  - full train step under each bin_method

Usage: python scripts/r3_breakdown.py [--steps 600] [--cap 256]
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
    p.add_argument("--warm_steps", type=int, default=600,
                   help="quick fit so radii/occupancy are semi-realistic")
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
    print(f"warm state ready (n={int(ts.gaussians.num_active)})", flush=True)

    # ---------- marginal scan timing helper ----------
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

    gs = ts.gaussians

    # ---------- binning alone ----------
    def make_bin_scan(method, super_cap=0):
        def mk(n):
            @jax.jit
            def f(fb):
                def body(fb, _):
                    pr = project(gs.params.replace(xyz=gs.params.xyz + fb),
                                 gs.active, gs.bound, cfg)
                    bins = bin_gaussians(pr, cfg.H, cfg.W, cap=args.cap,
                                         method=method, super_cap=super_cap)
                    return fb + bins.ids[0, 0] * 1e-12, None
                fb, _ = jax.lax.scan(body, fb, None, length=n)
                return fb
            return f
        return mk

    dt_bin_topk = marginal(make_bin_scan("top_k"), "project+bin top_k")
    dt_bin_hier = marginal(make_bin_scan("hier"), "project+bin hier sc=1024")
    dt_bin_hier2 = marginal(make_bin_scan("hier", 2048),
                            "project+bin hier sc=2048")

    # hier exactness + overflow on this state
    pr = jax.jit(lambda: project(gs.params, gs.active, gs.bound, cfg))()
    b_flat = jax.jit(lambda: bin_gaussians(pr, cfg.H, cfg.W, cap=args.cap,
                                           method="top_k"))()
    for sc in (1024, 2048):
        b_h = jax.jit(lambda sc=sc: bin_gaussians(
            pr, cfg.H, cfg.W, cap=args.cap, method="hier", super_cap=sc))()
        same = bool(jnp.all(jnp.where(b_flat.mask, b_flat.ids, -1)
                            == jnp.where(b_h.mask, b_h.ids, -1)))
        print(f"hier sc={sc}: overflow={int(b_h.super_overflow)} "
              f"ids_equal={same}", flush=True)

    # ---------- forward render ----------
    def make_fwd(method):
        cfg_m = dataclasses.replace(cfg, bin_method=method)
        def mk(n):
            @jax.jit
            def f(fb):
                def body(fb, _):
                    st = gs.replace(params=gs.params.replace(
                        xyz=gs.params.xyz + fb))
                    img = render(st, cfg_m)
                    return img[0, 0, 0] * 1e-12, None
                fb, _ = jax.lax.scan(body, fb, None, length=n)
                return fb
            return f
        return mk

    marginal(make_fwd("top_k"), "fwd render top_k")
    marginal(make_fwd("hier"), "fwd render hier")

    # ---------- fwd+bwd ----------
    def make_fb(method):
        cfg_m = dataclasses.replace(cfg, bin_method=method)
        def mk(n):
            @jax.jit
            def f(fb):
                def body(fb, _):
                    def obj(params):
                        st = gs.replace(params=params)
                        img = render(st, cfg_m)
                        return loss_fn(img, gt_j, "L2", 0.7)
                    g = jax.grad(obj)(gs.params.replace(
                        xyz=gs.params.xyz + fb))
                    return g.xyz[0, 0] * 1e-12, None
                fb, _ = jax.lax.scan(body, fb, None, length=n)
                return fb
            return f
        return mk

    marginal(make_fb("top_k"), "fwd+bwd top_k")
    marginal(make_fb("hier"), "fwd+bwd hier")

    # ---------- scatter-add isolation ----------
    T = -(-H // 16) * -(-W // 16)
    K = args.cap
    ids = np.asarray(b_flat.ids).reshape(-1)
    payload = jnp.asarray(
        np.random.default_rng(0).normal(size=(T * K, 9)).astype(np.float32))
    idsj = jnp.asarray(ids)

    def mk_scatter(n):
        @jax.jit
        def f(fb):
            def body(fb, _):
                acc = jnp.zeros((N, 9), jnp.float32).at[idsj].add(
                    payload + fb, mode="drop")
                return acc[0, 0] * 1e-12, None
            fb, _ = jax.lax.scan(body, fb, None, length=n)
            return fb
        return f

    marginal(mk_scatter, "9ch scatter [T*K,9]->[N,9]")

    # gather-table isolation: raw = table[ids] ([T,K,16] f32 gather)
    table = jnp.asarray(
        np.random.default_rng(1).normal(size=(N + 1, 16)).astype(np.float32))
    ids2 = jnp.asarray(np.asarray(b_flat.ids))

    def mk_gather(n):
        @jax.jit
        def f(fb):
            def body(fb, _):
                raw = (table + fb)[ids2]
                return raw[0, 0, 0] * 1e-12, None
            fb, _ = jax.lax.scan(body, fb, None, length=n)
            return fb
        return f

    marginal(mk_gather, "table gather [T,K,16]")

    # ---------- full train step ----------
    def make_step(method):
        cfg_m = dataclasses.replace(cfg, bin_method=method)
        def mk(n):
            def f(fb):
                ts2 = ts.replace(gaussians=gs.replace(
                    params=gs.params.replace(xyz=gs.params.xyz + fb)))
                ts3, _ = train_chunk(ts2, gt_j, cfg_m, tcfg, n, False, False)
                return ts3.gaussians.params.xyz[0, 0]
            return f
        return mk

    marginal(make_step("top_k"), "full step top_k")
    marginal(make_step("hier"), "full step hier")


if __name__ == "__main__":
    main(sys.argv[1:])
