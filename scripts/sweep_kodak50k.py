"""Full-recipe Kodak sweep: the reference's headline operating point.

Recipe (reference README.md:68-76, train.py:204,220-228): 24 images,
N=2500 -> max 5000, 50k iterations, lr 0.018, Adam(eps 1e-15) + StepLR(20k,
0.5), L2 loss, prune every 100, grow every 5000.

Robust to backend aborts: per-image orbax checkpoints + resume, and images
already present in the results JSONL are skipped, so the sweep can be
re-launched after any crash and loses at most one checkpoint interval.

Usage: python scripts/sweep_kodak50k.py [--iterations 50000] [--out PATH]
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="/root/reference/datasets/kodak")
    p.add_argument("--iterations", type=int, default=50000)
    p.add_argument("--num_points", type=int, default=2500)
    p.add_argument("--max_num_points", type=int, default=5000)
    p.add_argument("--out", default="results/kodak50k_r2.jsonl")
    p.add_argument("--ckpt_dir", default="results/ckpt50k")
    p.add_argument("--state_dir", default=None,
                   help="also export the best GaussianState per image as a "
                        "compact .npz (committed artifact for cross-round "
                        "QAT warm starts)")
    p.add_argument("--checkpoint_every", type=int, default=10000)
    p.add_argument("--num_images", type=int, default=None)
    # 256 = the reference's own per-tile cap. Round-2 lesson: 50k-converged
    # states reach occupancy 81-240, so sub-256 caps clip and the optimizer
    # exploits the clipping — the state then renders WORSE under reference
    # (256-cap) semantics. Fwd+bwd cost is flat from K=144 to 256.
    p.add_argument("--tile_cap", type=int, default=256)
    p.add_argument("--max_dispatch_steps", type=int, default=2500,
                   help="steps fused per device execution (>60s single "
                        "executions kill the TPU worker; lower for slow "
                        "steps, e.g. 200 at 2K)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (debug; the site config "
                        "otherwise pins the TPU relay)")
    p.add_argument("--color_norm", action="store_true",
                   help="sigmoid-bounded colors. The reference's compression "
                        "recipe trains the repr phase with this too "
                        "(README.md:85-88) — use it for checkpoints feeding "
                        "sweep_quant50k; plain repr training leaves it off")
    p.add_argument("--deadline_ts", type=float, default=None,
                   help="unix time: don't START a new image after this "
                        "(clean exit between images)")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gaussianimage_plus_tpu.models import GaussianConfig
    from gaussianimage_plus_tpu.train import TrainConfig, evaluate, fit_image
    from gaussianimage_plus_tpu.utils.image_io import load_image

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    done = set()
    if out_path.exists():
        for line in out_path.read_text().splitlines():
            try:
                done.add(json.loads(line)["image"])
            except Exception:
                pass

    images = sorted(Path(args.dataset).glob("kodim*.png"))[: args.num_images]
    for img_path in images:
        name = img_path.stem
        if name in done:
            print(f"{name}: already done, skipping", flush=True)
            continue
        if args.deadline_ts and time.time() > args.deadline_ts:
            print(f"deadline reached, stopping before {name}", flush=True)
            break
        gt = load_image(img_path)
        H, W = gt.shape[:2]
        cfg = GaussianConfig(H=H, W=W, max_num_points=args.max_num_points,
                             tile_cap=args.tile_cap,
                             color_norm=args.color_norm)
        tcfg = TrainConfig(iterations=args.iterations, lr=0.018,
                           max_dispatch_steps=args.max_dispatch_steps)
        t0 = time.time()
        res = fit_image(gt, cfg, tcfg, num_points=args.num_points, seed=3047,
                        log_every=10000,
                        checkpoint_dir=os.path.join(args.ckpt_dir, name),
                        checkpoint_every=args.checkpoint_every, resume=True)
        ev = evaluate(res.state, gt, cfg)
        if args.state_dir:
            # compact committed artifact (~200 KB/image): the best state,
            # enough for QAT warm starts in later rounds without re-running
            # the 50k repr fit (orbax checkpoints are gitignored)
            import numpy as np
            Path(args.state_dir).mkdir(parents=True, exist_ok=True)
            s = res.state
            np.savez_compressed(
                Path(args.state_dir) / f"{name}.npz",
                xyz=np.asarray(s.params.xyz), cov2d=np.asarray(s.params.cov2d),
                features=np.asarray(s.params.features),
                active=np.asarray(s.active), bound=np.asarray(s.bound),
                num_active=np.asarray(s.num_active),
                H=H, W=W, color_norm=int(args.color_norm),
                tile_cap=args.tile_cap, best_psnr=res.best_psnr,
                best_iter=res.best_iter)
        rec = {"image": name, "psnr": ev["psnr"], "ms_ssim": ev["ms_ssim"],
               "fps": ev["fps"], "num_points": ev["num_points"],
               "best_psnr": res.best_psnr, "best_iter": res.best_iter,
               "train_time": res.train_time, "wall": time.time() - t0,
               "iterations": args.iterations}
        with out_path.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"{name}: PSNR {ev['psnr']:.4f} MS-SSIM {ev['ms_ssim']:.4f} "
              f"n {ev['num_points']} ({rec['wall']:.0f}s)", flush=True)

    recs = [json.loads(l) for l in out_path.read_text().splitlines()]
    if recs:
        n = len(recs)
        print(f"AVERAGE over {n}: PSNR "
              f"{sum(r['psnr'] for r in recs)/n:.4f}, MS-SSIM "
              f"{sum(r['ms_ssim'] for r in recs)/n:.4f}, FPS "
              f"{sum(r['fps'] for r in recs)/n:.1f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
