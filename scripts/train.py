"""Representation training CLI — reference-compatible flags.

Mirrors the reference driver (train.py:194-344): per-image overfit over a
dataset directory (Kodak naming `kodimNN.png` or DIV2K `NNNN.png`), identical
defaults (50k iters, N=2500->5000, lr 0.018, prune/grow cadence), per-image
log lines and the dataset-average summary. Checkpoints are Orbax-saved pytrees
holding the same information as the reference's ``gaussian_model.pth.tar``
(train.py:173-175): best params, point count, PSNR, MS-SSIM, SLV bound rows.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv):
    p = argparse.ArgumentParser(description="TPU GaussianImage++ training")
    p.add_argument("-d", "--dataset", type=str, default="/root/reference/datasets/kodak/")
    p.add_argument("--data_name", type=str, default="kodak")
    p.add_argument("--iterations", type=int, default=50000)
    p.add_argument("--prune_iter", type=int, default=100)
    p.add_argument("--grow_iter", type=int, default=5000)
    p.add_argument("--model_name", type=str, default="GaussianImage_Covariance")
    p.add_argument("--num_points", type=int, default=2500)
    p.add_argument("--max_num_points", type=int, default=5000)
    p.add_argument("--seed", type=int, default=3047)
    p.add_argument("--lr", type=float, default=0.018)
    p.add_argument("--radius_clip", type=float, default=1.0)
    p.add_argument("--clip_coe", type=float, default=3.0)
    p.add_argument("--loss_type", type=str, default="L2")
    p.add_argument("--SLV_init", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--color_norm", action="store_true")
    p.add_argument("--adaptive_add", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--prune", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--opt_type", type=str, default="adam", choices=["adam", "adan"])
    p.add_argument("--save_imgs", action="store_true")
    p.add_argument("--tile_cap", type=int, default=256)
    p.add_argument("--raster_backend", type=str, default="auto")
    p.add_argument("--num_images", type=int, default=None, help="limit image count")
    p.add_argument("--log_dir", type=str, default="./checkpoints")
    p.add_argument("--log_every", type=int, default=10000)
    p.add_argument("--model_path", type=str, default=None,
                   help="checkpoint dir to resume/eval from (reference "
                        "train.py:61-77 semantics: load state, skip to eval "
                        "when --iterations 0)")
    p.add_argument("--lpips_weights", type=str, default=None,
                   help="LPIPS-VGG .npz weight file; adds LPIPS to the eval "
                        "report (models/metrics.py:62-95)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (debug; the site config "
                        "otherwise pins the TPU relay)")
    return p.parse_args(argv)


def image_list(args):
    if args.data_name == "DIV2K_valid_HR":
        names = [f"{i + 1:04}.png" for i in range(800, 900)]
    else:
        names = [f"kodim{i + 1:02}.png" for i in range(24)]
    if args.num_images:
        names = names[: args.num_images]
    return [Path(args.dataset) / n for n in names]


def main(argv):
    args = parse_args(argv)
    # the reference remaps the hyperparameter bundle for non-Covariance
    # models (train.py:256-262): Adan at lr 1e-3, no growth/prune. Unlike
    # the reference, only fill in values the user did NOT pass explicitly
    # (ADVICE r2: silently overriding explicit flags), and say so.
    if args.model_name != "GaussianImage_Covariance":
        passed = {a.lstrip("-").split("=")[0] for a in argv
                  if a.startswith("--")}
        remap = {"lr": 0.001, "opt_type": "adan",
                 "adaptive_add": False, "prune": False}
        for k, v in remap.items():
            if k not in passed:
                setattr(args, k, v)
            elif getattr(args, k) != v:
                print(f"note: --{k}={getattr(args, k)} overrides the "
                      f"reference's {args.model_name} bundle value {v}")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussianimage_plus_tpu.models import GaussianConfig, render
    from gaussianimage_plus_tpu.train import TrainConfig, evaluate, fit_image
    from gaussianimage_plus_tpu.utils.image_io import LogWriter, load_image, save_image
    from gaussianimage_plus_tpu.utils.checkpoint import save_checkpoint

    log_dir = Path(args.log_dir) / args.data_name / (
        f"{args.model_name}_I{args.iterations}_N{args.num_points}"
        f"{'_SLV' if args.SLV_init else ''}_R{args.radius_clip}"
        f"{'_add' if args.adaptive_add else ''}{'_prune' if args.prune else ''}"
        f"{'_colornorm' if args.color_norm else ''}")
    logwriter = LogWriter(log_dir)
    logwriter.write(json.dumps(vars(args)))

    param_map = {"GaussianImage_Covariance": "covariance",
                 "GaussianImage_Cholesky": "cholesky",
                 "GaussianImage_RS": "scale_rot"}

    psnrs, ms_ssims, train_times, eval_fpses, gs_nums = [], [], [], [], []
    for image_path in image_list(args):
        gt = load_image(image_path)
        H, W = gt.shape[:2]
        cfg = GaussianConfig(
            H=H, W=W, max_num_points=args.max_num_points,
            param=param_map.get(args.model_name, "covariance"),
            slv=args.SLV_init, color_norm=args.color_norm,
            clip_coe=args.clip_coe, radius_clip=args.radius_clip,
            tile_cap=args.tile_cap, raster_backend=args.raster_backend)
        tcfg = TrainConfig(
            iterations=args.iterations, lr=args.lr, prune_iter=args.prune_iter,
            grow_iter=args.grow_iter, adaptive_add=args.adaptive_add,
            prune=args.prune, loss_type=args.loss_type,
            opt_type=args.opt_type)
        img_log = LogWriter(log_dir / image_path.stem)
        if args.model_path:
            from gaussianimage_plus_tpu.models import init_state
            from gaussianimage_plus_tpu.utils.checkpoint import load_checkpoint
            import jax as _jax
            template = init_state(cfg, 1, _jax.random.PRNGKey(0))
            state, extra = load_checkpoint(
                Path(args.model_path) / image_path.stem / "gaussian_model", template)
            from gaussianimage_plus_tpu.train.trainer import FitResult
            res = FitResult(state=state, best_psnr=float(extra.get("psnr", 0.0)),
                            best_iter=0, train_time=0.0, history={})
        else:
            res = fit_image(gt, cfg, tcfg, args.num_points, seed=args.seed,
                            log_every=args.log_every, logger=img_log)
        ev = evaluate(res.state, gt, cfg, lpips_weights=args.lpips_weights)
        save_checkpoint(log_dir / image_path.stem / "gaussian_model", res.state,
                        extra={"psnr": res.best_psnr, "ms_ssim": ev["ms_ssim"]})
        if args.save_imgs:
            import numpy as np
            save_image(np.asarray(render(res.state, cfg)),
                       log_dir / image_path.stem / "render.png")
        logwriter.write(
            f"{image_path.stem}\t{H}x{W}\tPSNR\t{ev['psnr']:.4f}\tMS-SSIM\t"
            f"{ev['ms_ssim']:.4f}\t"
            + (f"LPIPS\t{ev['lpips']:.4f}\t" if 'lpips' in ev else "")
            + f"Training\t{res.train_time:.4f}\tEval\t"
            f"{ev['eval_time']:.8f}\tFPS\t{ev['fps']:.4f}\tgs_nums\t{ev['num_points']:.2e}")
        psnrs.append(ev["psnr"]); ms_ssims.append(ev["ms_ssim"])
        train_times.append(res.train_time); eval_fpses.append(ev["fps"])
        gs_nums.append(ev["num_points"])

    n = len(psnrs)
    logwriter.write(
        "Average: PSNR:{:.4f}, MS-SSIM:{:.4f}, Training:{:.4f}s, FPS:{:.4f}, gs_nums:{:.2e}".format(
            sum(psnrs) / n, sum(ms_ssims) / n, sum(train_times) / n,
            sum(eval_fpses) / n, sum(gs_nums) / n))


if __name__ == "__main__":
    main(sys.argv[1:])
