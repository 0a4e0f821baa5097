"""Per-attribute QAT-drop attribution for the worst round-3 codec images
(VERDICT r3 item 5: kodim20 -2.26 dB, kodim17 -1.93, kodim03 -1.90).

Two CPU-runnable probes per image, from committed artifacts only:

1. *Init attribution* (round-2 harness protocol, EXPERIMENTS.md): on the
   committed cn repr state, quantize ONE attribute at data-init and render —
   shows which code grid is intrinsically lossy on this image.
2. *Stream attribution*: decode the committed final bitstream, then render
   with one attribute group at a time swapped back to the float repr values
   — bounds how much of the final drop each attribute carries (QAT drift
   rides along, so read deltas comparatively, not absolutely).

Usage: python scripts/r4_qat_attrib.py [--images kodim20,kodim17,kodim03]
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--images", default="kodim20,kodim17,kodim03")
    p.add_argument("--state_dir", default="results/repr_states_cn")
    p.add_argument("--bitstream_dir", default="results/bitstreams_r3")
    p.add_argument("--dataset", default="/root/reference/datasets/kodak")
    p.add_argument("--cpu", action="store_true", default=True)
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gaussianimage_plus_tpu.compress import QuantConfig, init_quantizers
    from gaussianimage_plus_tpu.compress.bitstream import deserialize_bitstream
    from gaussianimage_plus_tpu.compress.pipeline import (
        _decode_attributes, quantize_attributes)
    from gaussianimage_plus_tpu.models import (
        GaussianConfig, GaussianParams, GaussianState, render)
    from gaussianimage_plus_tpu.models.gaussian_image import colors_of, effective_cov2d
    from gaussianimage_plus_tpu.train.metrics import psnr as psnr_fn
    from gaussianimage_plus_tpu.utils.image_io import load_image

    qcfg = QuantConfig()
    for name in args.images.split(","):
        gt = jnp.asarray(load_image(Path(args.dataset) / f"{name}.png"))
        H, W = gt.shape[:2]
        d = np.load(Path(args.state_dir) / f"{name}.npz")
        cfg = GaussianConfig(H=H, W=W, max_num_points=d["xyz"].shape[0],
                             tile_cap=int(d["tile_cap"]),
                             color_norm=bool(d["color_norm"]))
        state = GaussianState(
            params=GaussianParams(xyz=jnp.asarray(d["xyz"]),
                                  cov2d=jnp.asarray(d["cov2d"]),
                                  features=jnp.asarray(d["features"])),
            active=jnp.asarray(d["active"]), bound=jnp.asarray(d["bound"]),
            num_active=jnp.asarray(d["num_active"]))

        # float attribute views (what the renderer actually consumes)
        f_means = state.params.xyz
        f_cov = effective_cov2d(state.params, state.bound, cfg)
        f_col = colors_of(state.params, cfg)

        def ren(means, cov, col):
            img = render(state, cfg, cov_override=cov, means_override=means,
                         colors_override=col)
            return float(psnr_fn(img, gt))

        p_float = ren(f_means, f_cov, f_col)
        rec = {"image": name, "float_psnr": round(p_float, 4)}

        # --- probe 1: init attribution ---
        bundle = init_quantizers(state, cfg, qcfg)
        q_means, q_cov, q_col, _, _ = quantize_attributes(bundle, state, cfg, qcfg)
        rec["init"] = {
            "xy_only": round(ren(q_means, f_cov, f_col) - p_float, 4),
            "cov_only": round(ren(f_means, q_cov, f_col) - p_float, 4),
            "color_only": round(ren(f_means, f_cov, q_col) - p_float, 4),
            "all": round(ren(q_means, q_cov, q_col) - p_float, 4),
        }

        # --- probe 2: stream attribution ---
        bs = Path(args.bitstream_dir) / f"{name}.gipb"
        if bs.exists():
            dec = deserialize_bitstream(bs.read_bytes())
            s_means, s_cov, s_col = _decode_attributes(dec.bundle, dec.enc,
                                                       dec.qcfg)
            # the stream may have pruned points; mask float views to its set
            act = dec.enc.active
            mask = act[:, None]
            fm = jnp.where(mask, f_means[: s_means.shape[0]], 0.0)
            fc = jnp.where(mask, f_cov[: s_cov.shape[0]], 0.0)
            fl = jnp.where(mask, f_col[: s_col.shape[0]], 0.0)
            st2 = state.replace(active=act,
                                num_active=jnp.sum(act, dtype=jnp.int32))

            def ren2(means, cov, col):
                img = render(st2, cfg, cov_override=cov, means_override=means,
                             colors_override=col)
                return float(psnr_fn(img, gt))

            p_stream = ren2(s_means, s_cov, s_col)
            rec["stream_psnr"] = round(p_stream, 4)
            rec["stream_drop"] = round(p_float - p_stream, 4)
            rec["stream_swap_to_float"] = {
                "xy": round(ren2(fm, s_cov, s_col) - p_stream, 4),
                "cov": round(ren2(s_means, fc, s_col) - p_stream, 4),
                "color": round(ren2(s_means, s_cov, fl) - p_stream, 4),
            }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
