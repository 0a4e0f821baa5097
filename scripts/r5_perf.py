"""Round-5 on-hardware A/B: chunk-LIST kernels vs binned/range defaults.

Sections (each exception-guarded; one JSON line per measurement):
  1. per-frame full-decode shape sweep: binned / range / list over
     (kc, lmax) — the ≥1000 FPS hunt (VERDICT r4 items 2+6)
  2. decode prep isolation: lists-only program (project + member matrix +
     [T, nch] top_k), to attribute full-decode time kernel-vs-prep
  3. Kodak train-step A/B: binned vs list (morton-resorted and id-order) —
     the <8 ms hunt (VERDICT r4 item 5)
  4. 600-step quality cross-check binned vs list
  5. 2K train-step: list backend (binned 2K reference: 87.9 ms, r4)

In-scan marginal two-length protocol throughout; scan lengths budgeted to
stay far under the 60 s single-execution worker bound.

Usage: python scripts/r5_perf.py [--with_2k] [--skip_train]
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
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--skip_decode", action="store_true")
    p.add_argument("--only_2k", action="store_true",
                   help="skip decode + Kodak train A/B; run just the 2K cell")
    p.add_argument("--tiny", action="store_true",
                   help="CPU smoke mode: micro image/N/scan lengths — "
                        "validates every code path without hardware")
    p.add_argument("--timeout", type=float, default=2400.0)
    args = p.parse_args(argv)
    if args.only_2k:
        args.skip_decode = True
        args.with_2k = True

    import threading

    def watch():
        time.sleep(args.timeout)
        print(json.dumps({"error": f"r5_perf timed out ({args.timeout}s)"}),
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
    from gaussianimage_plus_tpu.train import (TrainConfig, init_train_state,
                                              train_chunk)
    from gaussianimage_plus_tpu.utils.image_io import load_image

    if args.tiny:
        gt = np.random.default_rng(0).uniform(
            0, 1, (48, 64, 3)).astype(np.float32)
        N, n_s, n_l, lens = 96, 2, 6, (2, 6)
    else:
        gt = load_image("/root/reference/datasets/kodak/kodim01.png")
        N, n_s, n_l, lens = 5000, 16, 116, (20, 120)
    H, W = gt.shape[:2]
    gt_j = jnp.asarray(gt)

    tcfg = TrainConfig(iterations=1000, lr=0.018)
    cfg = GaussianConfig(H=H, W=W, max_num_points=N,
                         tile_cap=48 if args.tiny else 256)

    # ---------------- decode section ----------------
    from gaussianimage_plus_tpu.compress import (QuantConfig, compress_wo_ec,
                                                 decompress_wo_ec,
                                                 init_quantizers)
    from gaussianimage_plus_tpu.compress.pipeline import morton_reorder
    from gaussianimage_plus_tpu.kernels import raster_list_pallas as rlp

    ts0 = init_train_state(cfg, tcfg, N, seed=0)
    ts0, _ = train_chunk(ts0, gt_j, cfg, tcfg, 100, True, False)
    state = ts0.gaussians
    qcfg = QuantConfig()
    bundle = init_quantizers(state, cfg, qcfg)
    enc = jax.jit(lambda s: compress_wo_ec(bundle, s, cfg, qcfg))(state)
    enc_m, bound_m = morton_reorder(enc, state.bound, cfg)

    def make_chained(backend):
        def chained(e, feedback):
            e = e._replace(quant_means=e.quant_means + feedback)
            img = decompress_wo_ec(bundle, e, bound_m, cfg, qcfg,
                                   backend=backend)
            return img, img[0, 0, 0] * 1e-7
        return chained

    def marginal_time(chained, arg, n_small=n_s, n_large=n_l, trials=3):
        def make_scan_n(n):
            @jax.jit
            def decode_n(e, fb0):
                def body(fb, _):
                    img, fb2 = chained(e, fb)
                    return fb2, img[0, 0, 0]
                fb, probes = jax.lax.scan(body, fb0, None, length=n)
                img, _ = chained(e, fb)
                return img, probes
            return decode_n

        times = {}
        for n in (n_small, n_large):
            f = make_scan_n(n)
            img, probes = f(arg, jnp.zeros(()))
            _ = np.asarray(img)
            best = float("inf")
            fb = float(probes[0]) * 1e-9
            for _ in range(trials):
                t0 = time.perf_counter()
                img, probes = f(arg, jnp.asarray(fb))
                _ = np.asarray(img)
                best = min(best, time.perf_counter() - t0)
                fb += 1e-9
            times[n] = best
        delta = times[n_large] - times[n_small]
        if delta > 0.005:
            return delta / (n_large - n_small)
        return times[n_large] / n_large

    ref_img = None
    if not args.skip_decode:
        try:
            dt = marginal_time(make_chained("binned"), enc_m)
            print(json.dumps({"config": "decode_full_binned",
                              "ms": round(dt * 1e3, 3),
                              "fps": round(1 / dt, 1)}), flush=True)
            ref_img = np.asarray(jax.jit(
                lambda e: decompress_wo_ec(bundle, e, bound_m, cfg, qcfg))(enc_m))
        except Exception as e:
            print(json.dumps({"config": "decode_full_binned",
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
        try:
            dt = marginal_time(make_chained("range"), enc_m)
            print(json.dumps({"config": "decode_full_range",
                              "ms": round(dt * 1e3, 3),
                              "fps": round(1 / dt, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"config": "decode_full_range",
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)

        shapes_env = os.environ.get("R5_SHAPES", "")
        if shapes_env:  # e.g. "list_t:128:8:32,list_t:256:8:16"
            shapes = tuple(
                (b, int(kc), int(l), int(tb))
                for b, kc, l, tb in (s.split(":")
                                     for s in shapes_env.split(",")))
        else:
            shapes = (("list", 64, 16, 8), ("list", 128, 8, 8),
                      ("list", 32, 24, 8), ("list", 64, 16, 16),
                      ("list_t", 128, 8, 8), ("list_t", 128, 8, 16),
                      ("list_t", 64, 16, 8))
        for backend, kc, lmax, tb in shapes:
            try:
                rlp.KC, rlp.KC_T, rlp.LMAX, rlp.TB, rlp.TB_T = kc, kc, lmax, tb, tb
                dt = marginal_time(make_chained(backend), enc_m)
                img_l = np.asarray(jax.jit(
                    lambda e: decompress_wo_ec(bundle, e, bound_m, cfg, qcfg,
                                               backend=backend))(enc_m))
                maxdiff = (float(np.abs(img_l - ref_img).max())
                           if ref_img is not None else -1.0)
                print(json.dumps({"config": f"decode_full_{backend}_kc{kc}_l{lmax}_tb{tb}",
                                  "ms": round(dt * 1e3, 3),
                                  "fps": round(1 / dt, 1),
                                  "maxdiff_vs_binned": maxdiff}), flush=True)
            except Exception as e:
                print(json.dumps({"config": f"decode_full_{backend}_kc{kc}_l{lmax}_tb{tb}",
                                  "error": f"{type(e).__name__}: {e}"[:200]}),
                      flush=True)
        rlp.KC, rlp.KC_T, rlp.LMAX, rlp.TB, rlp.TB_T = 64, 128, 16, 8, 16

        # prep isolation: dequantize + project + member matrix + chunk lists
        # (everything the list decode does except the render kernel)
        try:
            from gaussianimage_plus_tpu.compress.pipeline import (
                _decode_attributes)
            from gaussianimage_plus_tpu.models.gaussian_image import (
                GaussianParams, GaussianState, project)

            def prep_chained(e, feedback):
                e = e._replace(quant_means=e.quant_means + feedback)
                means, cov_elements, colors = _decode_attributes(bundle, e, qcfg)
                dummy = GaussianState(
                    params=GaussianParams(xyz=means, cov2d=cov_elements,
                                          features=colors),
                    active=e.active, bound=bound_m, num_active=e.num_active)
                proj = project(dummy.params, dummy.active, dummy.bound, cfg,
                               cov_override=cov_elements, means_override=means)
                opacity = jnp.ones((cfg.max_num_points,), proj.xys.dtype)
                table, bbox, member, tb_x, tb_y, T, N_, Np = rlp._table_bbox(
                    proj, colors, opacity, cfg.H, cfg.W,
                    cfg.block_h, cfg.block_w, 64)
                lst, cnt, lo2, hi2 = rlp._chunk_lists(member, N_, Np, 64, 16)
                probe = (jnp.sum(lst) + jnp.sum(cnt) + jnp.sum(hi2)
                         ).astype(jnp.float32) + jnp.sum(table[0]) * 1e-9
                img = probe.reshape(1, 1) * jnp.ones((1, 3))
                return img[None], probe * 1e-12
            dt = marginal_time(prep_chained, enc_m)
            print(json.dumps({"config": "decode_list_prep_only",
                              "ms": round(dt * 1e3, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"config": "decode_list_prep_only",
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)

    # ---------------- train section ----------------
    if not args.skip_train:
        def marginal_step(cfg_, tcfg_, gt_, n_pts, lens=lens):
            ts = init_train_state(cfg_, tcfg_, n_pts, seed=0)
            ts, _ = train_chunk(ts, gt_, cfg_, tcfg_, 100, True, False)
            _ = np.asarray(ts.gaussians.params.xyz)
            times = {}
            for n in lens:
                best = float("inf")
                tsn, _ = train_chunk(ts, gt_, cfg_, tcfg_, n, False, False)
                _ = np.asarray(tsn.gaussians.params.xyz)
                for _ in range(3):
                    t0 = time.perf_counter()
                    tsn, _ = train_chunk(ts, gt_, cfg_, tcfg_, n, False, False)
                    _ = np.asarray(tsn.gaussians.params.xyz)
                    best = min(best, time.perf_counter() - t0)
                times[n] = best
            d = times[lens[1]] - times[lens[0]]
            step = d / (lens[1] - lens[0]) if d > 0.005 else times[lens[1]] / lens[1]
            return step, ts

        ts_b = ts_l = None
        cfg_l = dataclasses.replace(cfg, raster_backend="list")
        tcfg_m = tcfg.replace(morton_resort=True)
        try:
            if not args.only_2k:
                dt_b, ts_b = marginal_step(cfg, tcfg, gt_j, N)
                print(json.dumps({"config": "train_binned_cap256",
                                  "train_step_ms": round(dt_b * 1e3, 3)}),
                      flush=True)
        except Exception as e:
            print(json.dumps({"config": "train_binned_cap256",
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)

        try:
            if not args.only_2k:
                dt_l, ts_l = marginal_step(cfg_l, tcfg_m, gt_j, N)
                print(json.dumps({"config": "train_list_morton",
                                  "train_step_ms": round(dt_l * 1e3, 3)}),
                      flush=True)
        except Exception as e:
            print(json.dumps({"config": "train_list_morton",
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)

        cfg_t = dataclasses.replace(cfg, raster_backend="list_t")
        try:
            if not args.only_2k:
                dt_t, _ = marginal_step(cfg_t, tcfg_m, gt_j, N)
                print(json.dumps({"config": "train_list_t_morton",
                                  "train_step_ms": round(dt_t * 1e3, 3)}),
                      flush=True)
        except Exception as e:
            print(json.dumps({"config": "train_list_t_morton",
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)

        # (id-order A/B retired: the trainer now auto-resorts for
        # sweep-family backends — the 93 ms id-order row is preserved in
        # results/r5_perf.jsonl from the pre-auto-resort measurement)

        if ts_b is not None and ts_l is not None:
            from gaussianimage_plus_tpu.models import render
            from gaussianimage_plus_tpu.train.metrics import psnr as psnr_fn
            pb = float(psnr_fn(jnp.clip(render(ts_b.gaussians, cfg), 0, 1), gt_j))
            pl_ = float(psnr_fn(jnp.clip(render(ts_l.gaussians, cfg_l), 0, 1), gt_j))
            print(json.dumps({"config": "quality_600step",
                              "binned_psnr": round(pb, 4),
                              "list_psnr": round(pl_, 4)}), flush=True)

        if args.with_2k:
            H2, W2, N2 = 1344, 2040, 20000
            rng2 = np.random.default_rng(1)
            gt2 = jnp.asarray(np.kron(rng2.uniform(0, 1, (84, 128, 3)),
                                      np.ones((16, 16, 1)))[:H2, :W2]
                              .astype(np.float32))
            # lane-major (list_t) only: the row-major list bwd's [Np, COLS]
            # output pads COLS 16 -> 128 lanes under T(8,128), so XLA's
            # scoped-VMEM stack wants 17.16M > its 16M cap at T=10752
            # (measured r5; the [nch, COLS, kc=128] lane-major output has a
            # native 128 minor dim and no such blowup).
            cfg2t = GaussianConfig(H=H2, W=W2, max_num_points=N2,
                                   tile_cap=256, raster_backend="list_t")
            try:
                rlp.LMAX = 8  # 16k tiles: keep the SMEM list table ~0.5 MB
                dt2, _ = marginal_step(cfg2t, tcfg_m, gt2, N2, lens=(20, 60))
                print(json.dumps({"config": "train_list_t_2k",
                                  "train_step_ms": round(dt2 * 1e3, 3),
                                  "binned_2k_ref_ms": 87.9}), flush=True)
            except Exception as e:
                print(json.dumps({"config": "train_list_t_2k",
                                  "error": f"{type(e).__name__}: {e}"[-4000:]}),
                      flush=True)
            finally:
                rlp.LMAX = 16


if __name__ == "__main__":
    main(sys.argv[1:])
