"""Standalone bitstream decoder: .gipb -> PNG (+ optional FPS timing).

The consumer-side tool the reference lacks (its decode lives inside
train_quantize.py's eval loop, :239-269): feed it a serialized artifact
produced by `scripts/train_quantize.py` / `sweep_quant50k.py` and get the
decoded image. `--time` measures bin-once decode FPS with the marginal
two-length protocol (see bench.py for why per-call timing is meaningless
through the remote relay).

Usage: python scripts/decode.py results/bitstreams/kodim01.gipb -o /tmp/out.png
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("bitstream")
    p.add_argument("-o", "--out", default=None,
                   help="output PNG (default: <bitstream>.png)")
    p.add_argument("--gt", default=None,
                   help="optional ground-truth image for PSNR/MS-SSIM")
    p.add_argument("--time", action="store_true",
                   help="measure bin-once decode FPS (marginal protocol)")
    p.add_argument("--backend", choices=["binned", "sweep", "range", "list", "list_t"],
                   default=None,
                   help="render path: 'sweep'/'range'/'list' = the chunk-skip"
                        " / chunk-range / chunk-list sweep decoders (fastest "
                        "on Morton-ordered streams)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from gaussianimage_plus_tpu.compress.bitstream import decode_bitstream
    from gaussianimage_plus_tpu.utils.image_io import load_image, save_image

    data = Path(args.bitstream).read_bytes()
    img, dec = decode_bitstream(data, backend=args.backend)
    out = args.out or (str(Path(args.bitstream).with_suffix("")) + ".png")
    save_image(np.asarray(img), out)
    print(f"{args.bitstream}: {dec.W}x{dec.H}, "
          f"{int(dec.enc.num_active)} points, {dec.bpp:.4f} bpp -> {out}",
          flush=True)

    if args.gt:
        from gaussianimage_plus_tpu.train.losses import ms_ssim
        from gaussianimage_plus_tpu.train.metrics import psnr as psnr_fn
        gt = jnp.asarray(load_image(args.gt))
        pv, mv = jax.jit(lambda a, b: (psnr_fn(a, b), ms_ssim(a, b)))(img, gt)
        print(f"PSNR {float(pv):.4f}  MS-SSIM {float(mv):.4f}", flush=True)

    if args.time:
        import dataclasses
        from gaussianimage_plus_tpu.compress import decode_frame, prepare_decode
        from gaussianimage_plus_tpu.models import GaussianConfig

        M = dec.enc.active.shape[0]
        cfg = GaussianConfig(H=dec.H, W=dec.W, max_num_points=M,
                             tile_cap=dec.qcfg.decode_cap or 256)
        prep = prepare_decode(dec.bundle, dec.enc, dec.bound, cfg, dec.qcfg)

        def chained(p, fb):
            p2 = p._replace(raw=p.raw.at[0, 0, 5].add(fb))
            img = decode_frame(p2, cfg)
            return img, img[0, 0, 0] * 1e-9

        def make_scan(n):
            @jax.jit
            def f(fb0):
                def body(fb, _):
                    img, fb2 = chained(prep, fb)
                    return fb2, img[0, 0, 0]
                fb, _ = jax.lax.scan(body, fb0, None, length=n)
                img, _ = chained(prep, fb)
                return img
            return f

        times = {}
        for n in (16, 116):
            f = make_scan(n)
            _ = np.asarray(f(jnp.zeros(())))
            best = float("inf")
            for t in range(3):
                t0 = time.perf_counter()
                _ = np.asarray(f(jnp.asarray(t * 1e-9)))
                best = min(best, time.perf_counter() - t0)
            times[n] = best
        dt = (times[116] - times[16]) / 100
        dt = dt if dt > 5e-5 else times[116] / 116
        print(f"bin-once decode: {dt*1e3:.3f} ms/frame ({1.0/dt:.0f} FPS)",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
