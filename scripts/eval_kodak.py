"""Evaluate saved representation checkpoints at an arbitrary tile cap.

Loads the per-image TrainState checkpoints a sweep wrote (fit_ckpt dirs),
restores the best snapshot, renders at ``--tile_cap`` and reports
PSNR/MS-SSIM per image + averages. This is how the round-2 cap-semantics
numbers (results/kodak50k_cap256_eval.json) were produced: a state trained
at cap C renders best at cap C; the reference-parity number is cap 256
(the reference's own per-tile bound, forward.cu:673).

Usage:
  python scripts/eval_kodak.py --ckpt_dir results/ckpt50k --tile_cap 256
"""
import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="/root/reference/datasets/kodak")
    p.add_argument("--ckpt_dir", default="results/ckpt50k")
    p.add_argument("--tile_cap", type=int, default=256)
    p.add_argument("--num_points", type=int, default=2500)
    p.add_argument("--max_num_points", type=int, default=5000)
    p.add_argument("--out", default=None, help="optional JSON output path")
    p.add_argument("--lpips_weights", default=None)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (rendering 24 images is fine "
                        "on CPU and leaves the TPU free)")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gaussianimage_plus_tpu.models import GaussianConfig, render
    from gaussianimage_plus_tpu.train import (
        TrainConfig, init_train_state, restore_best)
    from gaussianimage_plus_tpu.train.losses import ms_ssim
    from gaussianimage_plus_tpu.train.metrics import psnr as psnr_fn
    from gaussianimage_plus_tpu.utils.checkpoint import load_checkpoint
    from gaussianimage_plus_tpu.utils.image_io import load_image

    tcfg = TrainConfig()
    rows = []
    for img_path in sorted(Path(args.dataset).glob("kodim*.png")):
        name = img_path.stem
        ckpt = os.path.join(args.ckpt_dir, name, "fit_ckpt")
        if not os.path.exists(ckpt):
            continue
        gt = jnp.asarray(load_image(img_path))
        H, W = gt.shape[:2]
        cfg = GaussianConfig(H=H, W=W, max_num_points=args.max_num_points,
                             tile_cap=args.tile_cap)
        tmpl = init_train_state(cfg, tcfg, args.num_points, seed=3047)
        ts, _ = load_checkpoint(ckpt, tmpl)
        best = restore_best(ts)
        img = jax.jit(lambda s: render(s, cfg))(best)
        rec = {"image": name, "psnr": float(psnr_fn(img, gt)),
               "ms_ssim": float(ms_ssim(img, gt)),
               "num_points": int(best.num_active),
               "tile_cap": args.tile_cap}
        if args.lpips_weights:
            from gaussianimage_plus_tpu.train.lpips import (
                lpips, params_from_npz)
            rec["lpips"] = float(lpips(img, gt,
                                       params_from_npz(args.lpips_weights)))
        rows.append(rec)
        print(f"{name}: PSNR {rec['psnr']:.4f} MS-SSIM {rec['ms_ssim']:.4f}",
              flush=True)

    if rows:
        n = len(rows)
        print(f"AVERAGE over {n}: PSNR "
              f"{sum(r['psnr'] for r in rows) / n:.4f}, MS-SSIM "
              f"{sum(r['ms_ssim'] for r in rows) / n:.4f}", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1:])
