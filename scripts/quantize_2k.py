"""2K-scale QAT cell (VERDICT r4 item 9): quantization-aware fine-tune +
bitstream on the 2040x1344 Kodak mosaic, warm-started from the committed
50k representation fit (results/ckpt2k_50k).

Exercises hier binning + Morton stream + rANS at 16k tiles in one artifact —
the codec has otherwise only ever run at Kodak scale. Reference intent:
train_quantize.py applied to DIV2K-scale inputs (:283-311).

Usage: python scripts/quantize_2k.py [--iterations 50000] [--warmup_iter 6000]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--iterations", type=int, default=50000)
    p.add_argument("--warmup_iter", type=int, default=6000)
    p.add_argument("--max_num_points", type=int, default=20000)
    p.add_argument("--num_points", type=int, default=10000)
    p.add_argument("--tile_cap", type=int, default=256)
    p.add_argument("--repr_ckpt", default="results/ckpt2k_50k/fit_ckpt")
    p.add_argument("--out", default="results/quant2k_r5.json")
    p.add_argument("--bitstream", default="results/bitstreams_r4/mosaic2k.gipb")
    p.add_argument("--stream_order", choices=["id", "morton"], default="morton")
    p.add_argument("--max_dispatch_steps", type=int, default=500,
                   help="2K steps are ~88 ms; 500 steps/dispatch = ~44 s, "
                        "under the 60 s worker bound")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fit_2k import build_mosaic  # same deterministic mosaic
    from gaussianimage_plus_tpu.compress import (QuantConfig,
                                                 encode_decode_eval,
                                                 fit_image_quantized)
    from gaussianimage_plus_tpu.models import GaussianConfig
    from gaussianimage_plus_tpu.train import (TrainConfig, init_train_state,
                                              restore_best)
    from gaussianimage_plus_tpu.utils.checkpoint import load_checkpoint

    gt = build_mosaic()
    H, W = gt.shape[:2]
    cfg = GaussianConfig(H=H, W=W, max_num_points=args.max_num_points,
                         tile_cap=args.tile_cap, color_norm=True)
    tcfg = TrainConfig(iterations=args.iterations, lr=0.018,
                       max_dispatch_steps=args.max_dispatch_steps)
    qcfg = QuantConfig()

    init_gs = None
    if Path(args.repr_ckpt).exists():
        template = init_train_state(cfg, tcfg, args.num_points, seed=3047)
        ts, extra = load_checkpoint(args.repr_ckpt, template)
        init_gs = restore_best(ts)
        print(f"warm-start from {args.repr_ckpt} "
              f"(best {float(ts.best_psnr):.3f})", flush=True)

    t0 = time.time()
    res = fit_image_quantized(gt, cfg, tcfg, qcfg, args.num_points,
                              warmup_iter=args.warmup_iter, seed=3047,
                              log_every=10000, init_state=init_gs)
    Path(args.bitstream).parent.mkdir(parents=True, exist_ok=True)
    stats = encode_decode_eval(res.state, res.bundle, gt, cfg, qcfg,
                               n_renders=0, write_bitstream=args.bitstream,
                               stream_order=args.stream_order)
    rec = {"image": "mosaic2k", "resolution": f"{W}x{H}",
           "iterations": args.iterations, "warmup_iter": args.warmup_iter,
           "best_train_psnr": res.best_psnr, "train_time": res.train_time,
           "wall": time.time() - t0,
           **{k: float(v) for k, v in stats.items()}}
    Path(args.out).write_text(json.dumps(rec, indent=1))
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
