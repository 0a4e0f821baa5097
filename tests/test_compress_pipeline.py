"""Quantization pipeline + codec integration (CPU, small sizes)."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussianimage_plus_tpu.models import GaussianConfig, init_state, render
from gaussianimage_plus_tpu.train import TrainConfig, fit_image
from gaussianimage_plus_tpu.compress import (
    QuantConfig,
    analysis_wo_ec,
    compress_wo_ec,
    decompress_wo_ec,
    encode_decode_eval,
    fit_image_quantized,
    init_quantizers,
    render_quantized,
)
from gaussianimage_plus_tpu.train.metrics import psnr as psnr_fn


def fitted_state(H=32, W=48, n=40, iters=200):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    gt = np.stack([xx / W, yy / H, 0.5 + 0.3 * np.sin(xx / 7)], -1).astype(np.float32)
    cfg = GaussianConfig(H=H, W=W, max_num_points=64)
    tcfg = TrainConfig(iterations=iters, grow_iter=100, prune_iter=50, lr=0.02)
    res = fit_image(gt, cfg, tcfg, num_points=n, seed=0)
    return res.state, jnp.asarray(gt), cfg


class TestQuantizedRender:
    def test_quantized_close_to_float(self):
        state, gt, cfg = fitted_state()
        qcfg = QuantConfig()
        bundle = init_quantizers(state, cfg, qcfg)
        img_q, codes, _ = render_quantized(bundle, state, cfg, qcfg)
        img_f = render(state, cfg)
        # 12/10/6-bit quantization should cost only a few dB
        p_f = float(psnr_fn(img_f, gt))
        p_q = float(psnr_fn(img_q, gt))
        assert p_q > p_f - 6.0
        assert codes["xy"].shape == (cfg.max_num_points, 2)

    def test_codes_within_range(self):
        state, gt, cfg = fitted_state()
        qcfg = QuantConfig()
        bundle = init_quantizers(state, cfg, qcfg)
        _, codes, _ = render_quantized(bundle, state, cfg, qcfg)
        active = np.asarray(state.active)
        xy = np.asarray(codes["xy"])[active]
        assert xy.min() >= 0 and xy.max() <= 2 ** 12 - 1
        col = np.asarray(codes["color"])[active]
        assert col.min() >= 0 and col.max() <= 2 ** 6 - 1


class TestCodec:
    def test_roundtrip(self):
        state, gt, cfg = fitted_state()
        qcfg = QuantConfig()
        bundle = init_quantizers(state, cfg, qcfg)
        enc = compress_wo_ec(bundle, state, cfg, qcfg)
        out = decompress_wo_ec(bundle, enc, state.bound, cfg, qcfg)
        assert out.shape == (cfg.H, cfg.W, 3)
        # decoded render close to the quantized-forward render
        img_q, _, _ = render_quantized(bundle, state, cfg, qcfg)
        # the only difference: compress prunes PSD-invalid quantized points
        assert float(jnp.mean(jnp.abs(out - img_q))) < 0.05

    def test_sweep_backend_matches_binned(self):
        """The chunk-skip sweep decoder must reproduce the binned decode
        (no tile overflows at this state), before AND after the encoder's
        Morton stream reorder."""
        from gaussianimage_plus_tpu.compress.pipeline import morton_reorder

        state, gt, cfg = fitted_state()
        qcfg = QuantConfig()
        bundle = init_quantizers(state, cfg, qcfg)
        enc = compress_wo_ec(bundle, state, cfg, qcfg)
        ref = decompress_wo_ec(bundle, enc, state.bound, cfg, qcfg)
        out_s = decompress_wo_ec(bundle, enc, state.bound, cfg, qcfg,
                                 backend="sweep")
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
        enc_m, bound_m = morton_reorder(enc, state.bound, cfg)
        assert int(enc_m.num_active) == int(enc.num_active)
        out_m = decompress_wo_ec(bundle, enc_m, bound_m, cfg, qcfg,
                                 backend="sweep")
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
        # binned decode of the reordered stream is exact too (order only
        # matters at over-cap tiles, absent here)
        out_mb = decompress_wo_ec(bundle, enc_m, bound_m, cfg, qcfg)
        np.testing.assert_allclose(np.asarray(out_mb), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    def test_bpp_formula(self):
        state, gt, cfg = fitted_state()
        qcfg = QuantConfig()
        bundle = init_quantizers(state, cfg, qcfg)
        enc = compress_wo_ec(bundle, state, cfg, qcfg)
        stats = analysis_wo_ec(enc, cfg, qcfg)
        n = int(enc.num_active)
        hw = cfg.H * cfg.W
        # reference accounting: gaussianimage_covariance.py:484-507
        assert np.isclose(stats["position_bpp"], (n * 2 * 12 + 128) / hw)
        assert np.isclose(stats["cholesky_bpp"], (n * 3 * 10 + 192) / hw)
        assert np.isclose(stats["feature_dc_bpp"], (n * 3 * 6 + 192) / hw)
        assert np.isclose(stats["bpp"], stats["position_bpp"] +
                          stats["cholesky_bpp"] + stats["feature_dc_bpp"])


class TestQuantTraining:
    def test_full_pipeline_improves(self):
        H, W = 32, 48
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        gt = np.stack([xx / W, yy / H, 0.5 * np.ones_like(xx)], -1).astype(np.float32)
        cfg = GaussianConfig(H=H, W=W, max_num_points=64)
        tcfg = TrainConfig(iterations=200, grow_iter=100, prune_iter=50, lr=0.02)
        qcfg = QuantConfig()
        res = fit_image_quantized(gt, cfg, tcfg, qcfg, num_points=40,
                                  warmup_iter=100, seed=1)
        assert res.best_psnr > 14.0
        stats = encode_decode_eval(res.state, res.bundle, gt, cfg, qcfg, n_renders=3)
        assert stats["psnr"] > 14.0
        assert stats["bpp"] > 0
        assert np.isfinite(stats["decode_full_fps"])

    def test_macro_chunk_matches_sequential(self):
        # one fused dispatch must be step-for-step identical to successive
        # quant_train_chunk calls (same best carry, same opt states)
        from gaussianimage_plus_tpu.compress import init_quantizers
        from gaussianimage_plus_tpu.compress.pipeline import (
            quant_train_chunk, quant_train_macro_chunk)
        from gaussianimage_plus_tpu.train.optim import make_adam

        state, gt, cfg = fitted_state()
        qcfg = QuantConfig()
        bundle = init_quantizers(state, cfg, qcfg)
        tx = make_adam(0.01, 20000, 0.5)
        mos = tx.init(state.params)

        s1, m1, b1, best1 = state, mos, bundle, None
        for _ in range(3):
            s1, m1, b1, mm = quant_train_chunk(s1, m1, b1, gt, cfg, qcfg,
                                               0.01, 20, best=best1)
            best1 = mm["best"]
        s2, m2, b2, mm2 = quant_train_macro_chunk(state, mos, bundle, gt, cfg,
                                                  qcfg, 0.01, 3, 20)
        np.testing.assert_array_equal(np.asarray(s1.params.xyz),
                                      np.asarray(s2.params.xyz))
        np.testing.assert_array_equal(np.asarray(b1.xy.scale),
                                      np.asarray(b2.xy.scale))
        assert float(best1[0]) == float(mm2["best"][0])

    def test_warm_start_from_pretrained(self):
        # the reference's QAT resume: load a trained repr, run warmup on top
        # with a fresh optimizer (train_quantize.py:53-69,124-129)
        state, gt, cfg = fitted_state()
        tcfg = TrainConfig(iterations=200, grow_iter=100, prune_iter=50, lr=0.02)
        qcfg = QuantConfig()
        res = fit_image_quantized(gt, cfg, tcfg, qcfg, num_points=40,
                                  warmup_iter=100, seed=1, init_state=state)
        cold = fit_image_quantized(gt, cfg, tcfg, qcfg, num_points=40,
                                   warmup_iter=100, seed=1)
        # warm start begins from the trained repr, so the quantized best
        # should at least match the cold run (it has a 200-iter head start)
        assert res.best_psnr >= cold.best_psnr - 0.5
        stats = encode_decode_eval(res.state, res.bundle, gt, cfg, qcfg,
                                   n_renders=3)
        assert stats["psnr"] > 14.0


class TestVQColorPath:
    def test_vq_roundtrip_and_bpp(self):
        state, gt, cfg = fitted_state()
        qcfg = QuantConfig(color_quant="vq")
        bundle = init_quantizers(state, cfg, qcfg)
        assert bundle.color_vq is not None
        img_q, codes, _ = render_quantized(bundle, state, cfg, qcfg)
        assert codes["color"].shape == (cfg.max_num_points, 2)  # 2 RVQ layers
        enc = compress_wo_ec(bundle, state, cfg, qcfg)
        out = decompress_wo_ec(bundle, enc, state.bound, cfg, qcfg)
        assert out.shape == (cfg.H, cfg.W, 3)
        stats = analysis_wo_ec(enc, cfg, qcfg, bundle)
        # 2 layers x 8 codebook entries x 3 dims x 32 bits = 1536 codebook bits
        assert stats["feature_dc_bpp"] * cfg.H * cfg.W >= 1536


class TestPreparedDecode:
    def test_prepared_matches_full_decode(self):
        """Bin-once decode must be pixel-exact vs decompress_wo_ec."""
        from gaussianimage_plus_tpu.compress import prepare_decode, decode_frame

        state, gt, cfg = fitted_state()
        qcfg = QuantConfig()
        bundle = init_quantizers(state, cfg, qcfg)
        enc = compress_wo_ec(bundle, state, cfg, qcfg)
        full = decompress_wo_ec(bundle, enc, state.bound, cfg, qcfg)
        prep = prepare_decode(bundle, enc, state.bound, cfg, qcfg)
        fast = decode_frame(prep, cfg)
        # full path uses the XLA rasterizer on CPU, prepared path the Pallas
        # kernel (interpret): identical math, different accumulation order
        np.testing.assert_allclose(np.asarray(full), np.asarray(fast),
                                   atol=2e-5)
        # capacity trim drops only sentinel slots: any difference is pure
        # reduction-tree pairing at the different K (1 ulp)
        prep0 = prepare_decode(bundle, enc, state.bound, cfg, qcfg, trim=False)
        np.testing.assert_allclose(np.asarray(decode_frame(prep0, cfg)),
                                   np.asarray(fast), atol=1e-6)
        # trimmed capacity stays sublane-aligned and sufficient
        assert prep.raw.shape[1] % 8 == 0
        assert prep.raw.shape[1] >= int(jnp.max(prep.counts))


class TestPercentileInit:
    def test_default_is_reference_parity(self):
        state, gt, cfg = fitted_state()
        a = init_quantizers(state, cfg, QuantConfig())
        b = init_quantizers(state, cfg, QuantConfig(init_percentile=100.0))
        np.testing.assert_array_equal(np.asarray(a.color.scale),
                                      np.asarray(b.color.scale))

    def test_clipped_grid_is_tighter_and_better_on_tails(self):
        # heavy-tailed colors: clipping the grid shrinks the step and the
        # quantized render of the bulk improves
        state, gt, cfg = fitted_state()
        feats = state.params.features.at[0].set(
            jnp.full((3,), 40.0))  # one wild outlier
        state = state.replace(params=state.params.replace(features=feats))
        full = init_quantizers(state, cfg, QuantConfig())
        clip = init_quantizers(state, cfg, QuantConfig(init_percentile=99.0))
        assert float(jnp.max(clip.color.scale)) < float(jnp.max(full.color.scale))
        qf = QuantConfig()
        qc = QuantConfig(init_percentile=99.0)
        img_f, _, _ = render_quantized(full, state, cfg, qf)
        img_c, _, _ = render_quantized(clip, state, cfg, qc)
        assert float(psnr_fn(img_c, gt)) > float(psnr_fn(img_f, gt))


class TestFp16XyMode:
    def test_codec_roundtrip_and_accounting(self):
        """ADVICE fix coverage: xy_quant='fp16' must round-trip positions
        through fp16 in the codec (not the LSQ grid) and charge 16
        bits/coord (gaussianimage_covariance.py:414-419)."""
        state, gt, cfg = fitted_state()
        qcfg = QuantConfig(xy_quant="fp16")
        bundle = init_quantizers(state, cfg, qcfg)
        enc = compress_wo_ec(bundle, state, cfg, qcfg)
        # codes ARE the fp16 round-trip values
        act = np.asarray(enc.active)
        got = np.asarray(enc.quant_means)[act]
        want = np.asarray(state.params.xyz).astype(np.float16).astype(
            np.float32)[act]
        np.testing.assert_array_equal(got, want)
        out = decompress_wo_ec(bundle, enc, state.bound, cfg, qcfg)
        img_q, _, _ = render_quantized(bundle, state, cfg, qcfg)
        assert float(jnp.mean(jnp.abs(out - img_q))) < 0.05
        stats = analysis_wo_ec(enc, cfg, qcfg)
        n = int(enc.num_active)
        assert np.isclose(stats["position_bpp"], n * 2 * 16 / (cfg.H * cfg.W))
