"""Sacrificial portrait-shape compile probe (round-2 postmortem item).

The remote compile service stalled permanently on the first cap-256
portrait-orientation (512x768) program in round 2, taking the TPU session
down for 4+ hours. Before any long sweep, this probe compiles and runs the
exact production program shapes on kodim04 in a process that can be killed
without wedging a sweep: repr macro chunks (train_macro_chunk at the sweep's
max_dispatch_steps granularity), the eval render + metrics, and optionally
the QAT macro (--qat).

Run under `timeout`; if it hangs, bisect with --max_dispatch_steps.
Checkpoints land in the sweep's checkpoint dir, so completed probe iterations
are not wasted: the sweep resumes from them.
"""
import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--image", default="/root/reference/datasets/kodak/kodim04.png")
    p.add_argument("--tile_cap", type=int, default=256)
    p.add_argument("--color_norm", action="store_true")
    p.add_argument("--stop_after_iter", type=int, default=5000)
    p.add_argument("--max_dispatch_steps", type=int, default=2500)
    p.add_argument("--ckpt_dir", default=None,
                   help="share with the sweep so probe progress is kept")
    p.add_argument("--qat", action="store_true",
                   help="also compile+run one QAT macro chunk (the exact "
                        "program class that stalled round 2)")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussianimage_plus_tpu.models import GaussianConfig
    from gaussianimage_plus_tpu.train import TrainConfig, evaluate, fit_image
    from gaussianimage_plus_tpu.utils.image_io import load_image

    gt = load_image(args.image)
    H, W = gt.shape[:2]
    print(f"probe {Path(args.image).stem} {W}x{H} cap={args.tile_cap} "
          f"color_norm={args.color_norm}", flush=True)
    cfg = GaussianConfig(H=H, W=W, max_num_points=5000,
                         tile_cap=args.tile_cap, color_norm=args.color_norm)
    tcfg = TrainConfig(iterations=50000, lr=0.018,
                       max_dispatch_steps=args.max_dispatch_steps)

    t0 = time.time()
    res = fit_image(gt, cfg, tcfg, num_points=2500, seed=3047,
                    log_every=2500, checkpoint_dir=args.ckpt_dir,
                    checkpoint_every=2500, resume=True,
                    stop_after_iter=args.stop_after_iter)
    print(f"repr macros OK: best {res.best_psnr:.3f} "
          f"({time.time() - t0:.0f}s)", flush=True)

    t0 = time.time()
    ev = evaluate(res.state, gt, cfg)
    print(f"eval OK: psnr {ev['psnr']:.3f} ms_ssim {ev['ms_ssim']:.4f} "
          f"({time.time() - t0:.0f}s)", flush=True)

    if args.qat:
        import jax.numpy as jnp
        from gaussianimage_plus_tpu.compress import (
            QuantConfig, compress_wo_ec, decompress_wo_ec, init_quantizers)
        from gaussianimage_plus_tpu.compress.pipeline import (
            quant_train_macro_chunk)
        from gaussianimage_plus_tpu.train.optim import make_adam

        qcfg = QuantConfig()
        state = res.state
        bundle = init_quantizers(state, cfg, qcfg)
        model_lr = 0.018 * 0.5 ** (6000 // tcfg.lr_step_size)
        model_tx = make_adam(model_lr, tcfg.lr_step_size, tcfg.lr_gamma)
        opt_state = model_tx.init(state.params)
        t0 = time.time()
        # 22 chunks of 100 = the production QAT macro at 44000/2500 dispatch
        state, opt_state, bundle, m = quant_train_macro_chunk(
            state, opt_state, bundle, jnp.asarray(gt), cfg, qcfg, model_lr,
            22, 100, best=None)
        print(f"QAT macro OK: psnr {float(m['psnr'][-1]):.3f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        t0 = time.time()
        enc = jax.jit(lambda s: compress_wo_ec(bundle, s, cfg, qcfg))(state)
        img = decompress_wo_ec(bundle, enc, state.bound, cfg, qcfg)
        import numpy as np
        np.asarray(img)
        print(f"encode/decode OK ({time.time() - t0:.0f}s)", flush=True)
    print("PROBE PASSED", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
