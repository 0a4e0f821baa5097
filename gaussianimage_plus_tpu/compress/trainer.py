"""Compression trainer: warmup -> quantization-aware fine-tune -> codec.

Host-side orchestration mirroring ``SimpleTrainer2d`` of train_quantize.py
(:21-269): the warmup phase reuses the representation trainer's chunked loop,
then quantizers attach and the quantized loop runs, tracking the best
quantized PSNR; finally encode/decode/analysis produce the deliverables
(decode FPS, bpp, PSNR, MS-SSIM).
"""

from __future__ import annotations

import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussian_image import GaussianConfig, GaussianState
from ..train.losses import ms_ssim
from ..train.metrics import psnr as psnr_fn
from ..train.trainer import (
    TrainConfig,
    TrainState,
    init_train_state,
    restore_best,
    train_chunk,
    train_macro_chunk,
)
from .pipeline import (
    Encoding,
    QuantConfig,
    QuantizerBundle,
    analysis_wo_ec,
    compress_wo_ec,
    decompress_wo_ec,
    init_quantizers,
    make_quantizer_opts,
    quant_train_chunk,
    quant_train_macro_chunk,
    render_quantized,
)
from .quantizers import hybrid_size


class QuantFitResult(NamedTuple):
    state: GaussianState
    bundle: QuantizerBundle
    best_psnr: float
    train_time: float
    metrics: dict


def fit_image_quantized(gt, cfg: GaussianConfig, tcfg: TrainConfig,
                        qcfg: QuantConfig, num_points: int,
                        warmup_iter: int = 6000, seed: int = 3047,
                        log_every: Optional[int] = None, logger=None,
                        init_state: Optional[GaussianState] = None) -> QuantFitResult:
    """Full train_quantize recipe (train_quantize.py:118-237).

    ``init_state``: warm-start the warmup phase from a pre-trained
    representation (the reference loads the 50k repr checkpoint and still
    runs the 6000-iter warmup on top with a fresh optimizer,
    train_quantize.py:53-69,124-129)."""
    log = (logger.write if logger else print) if log_every else (lambda *_: None)
    gt = jnp.asarray(gt)
    chunk = tcfg.prune_iter
    assert warmup_iter % chunk == 0 and tcfg.iterations % chunk == 0

    # ---- phase 1: representation warmup (prune/grow active) ----
    ts = init_train_state(cfg, tcfg, num_points, seed, gaussians=init_state)
    t0 = time.perf_counter()
    # dispatch granularity: macro chunks bounded by grow-period boundaries
    # (train_macro_chunk is step-for-step identical; prune fires at every
    # chunk boundary inside it, grow only at grow-cadence multiples) AND by
    # MAX_MACRO_STEPS — a single >60s device execution has been observed to
    # take the TPU worker down through the relay (cap-256 5000-step macros
    # crashed with "TPU worker crashed or restarted"; 2500-step ones run)
    MAX_MACRO_STEPS = max(chunk, tcfg.max_dispatch_steps // chunk * chunk)
    if tcfg.grow_iter % chunk == 0:
        bounds = set(range(0, warmup_iter, tcfg.grow_iter)) | {warmup_iter}
        bounds |= set(range(0, warmup_iter, MAX_MACRO_STEPS))
        bounds = sorted(b for b in bounds if b % chunk == 0)
        segments = list(zip(bounds[:-1], bounds[1:]))
    else:
        segments = [(i * chunk, (i + 1) * chunk)
                    for i in range(warmup_iter // chunk)]
    # fill-to-max at the LAST grow that actually fires before warmup ends
    # (warmup_iter - grow_iter only coincides with the grow cadence when
    # warmup_iter is a multiple of grow_iter; derive it instead)
    last_grow = (warmup_iter - 1) // tcfg.grow_iter * tcfg.grow_iter
    for s0, s1 in segments:
        it_end = s1
        do_grow = (tcfg.adaptive_add and it_end % tcfg.grow_iter == 0
                   and it_end < warmup_iter)
        final_fill = do_grow and it_end == last_grow
        if (s1 - s0) == chunk:
            ts, m = train_chunk(ts, gt, cfg, tcfg, chunk, tcfg.prune,
                                do_grow, final_fill)
        else:
            ts, m = train_macro_chunk(ts, gt, cfg, tcfg, (s1 - s0) // chunk,
                                      chunk, tcfg.prune, do_grow, final_fill)
        if log_every and (it_end % log_every == 0 or s1 - s0 >= log_every):
            log(f"warmup {it_end}: psnr {float(m['psnr'][-1]):.3f} "
                f"best {float(ts.best_psnr):.3f} n {int(ts.gaussians.num_active)}")

    # ---- phase 2: restore best, attach quantizers (train_quantize.py:129-141) ----
    state = restore_best(ts)
    # model optimizer restarts fresh at the schedule's decayed LR
    model_lr = tcfg.lr * tcfg.lr_gamma ** (warmup_iter // tcfg.lr_step_size)
    from ..train.optim import make_adam
    model_tx = make_adam(model_lr, tcfg.lr_step_size, tcfg.lr_gamma)
    model_opt_state = model_tx.init(state.params)
    bundle = init_quantizers(state, cfg, qcfg)

    quant_iters = tcfg.iterations - warmup_iter
    # dispatch granularity: fuse as many 100-step chunks per jit call as
    # divide the phase evenly (<=50, mirroring train_macro_chunk) — remote
    # dispatch overhead otherwise dominates the 440-dispatch QAT phase
    total_chunks = quant_iters // chunk
    max_chunks = max(1, MAX_MACRO_STEPS // chunk)
    n_per_macro = max((k for k in range(1, min(total_chunks, max_chunks) + 1)
                       if total_chunks % k == 0), default=1)
    best = None
    for ci in range(total_chunks // n_per_macro):
        state, model_opt_state, bundle, m = quant_train_macro_chunk(
            state, model_opt_state, bundle, gt, cfg, qcfg, model_lr,
            n_per_macro, chunk, best=best)
        best = m["best"]
        it_end = warmup_iter + (ci + 1) * n_per_macro * chunk
        if log_every and (it_end % log_every == 0
                          or n_per_macro * chunk >= log_every):
            log(f"quant {it_end}: psnr {float(m['psnr'][-1]):.3f} "
                f"best {float(best[0]):.3f}")
    import numpy as _np
    _np.asarray(state.params.xyz[0])  # host sync
    train_time = time.perf_counter() - t0

    if best is not None:
        best_psnr = float(best[0])
        best_state = state.replace(params=best[1])
        bxy, bcov, bcol = best[2]
        best_bundle = bundle.replace(xy=bxy, cov=bcov, color=bcol,
                                     color_vq=best[3])
    else:
        best_psnr, best_state, best_bundle = -float("inf"), state, bundle

    # NO unquantized-cov prune here: the reference prunes its FINAL state
    # (train_quantize.py:174) and then load_state_dict's the best snapshot
    # OVER it (:179-185), so the state that reaches encode is the best
    # snapshot un-pruned. Round 3 pruned AFTER the restore — points whose
    # unquantized cov drifted non-PSD across 44k QAT steps (legal: only the
    # QUANTIZED cov renders) were deleted from the stream, costing up to
    # 1.7 dB on kodim20/17/03 (diagnosed round 4; encode's own
    # quantized-invalid prune, compress_wo_ec, is the only reference prune).
    return QuantFitResult(state=best_state, bundle=best_bundle,
                          best_psnr=best_psnr, train_time=train_time,
                          metrics={})


def encode_decode_eval(res_state: GaussianState, bundle: QuantizerBundle,
                       gt, cfg: GaussianConfig, qcfg: QuantConfig,
                       n_renders: int = 0,
                       write_bitstream: Optional[str] = None,
                       stream_order: str = "id") -> dict:
    """encode() deliverables (train_quantize.py:239-269): codes, decode FPS,
    bpp decomposition, quantized PSNR / MS-SSIM.

    ``write_bitstream``: also serialize the full rANS bitstream to this path,
    decode it back, and report ``bpp_stream`` (actual artifact bits / pixel)
    plus ``stream_psnr`` of the render decoded from the bytes — the
    round-trip capability of the reference's compress()/decompress()
    (gaussianimage_cholesky.py:419-447).

    ``stream_order``: ``'id'`` keeps training id order (stream_psnr is then
    bit-identical to ``psnr``); ``'morton'`` lays the serialized stream out
    in Z-order so the chunk-skip sweep decoder hits its fast path on the
    artifact itself (same set of contributions — PSNR differs only by
    float summation order, measured < 1e-4 dB)."""
    gt = jnp.asarray(gt)
    compress_jit = jax.jit(
        lambda s: compress_wo_ec(bundle, s, cfg, qcfg))
    enc = compress_jit(res_state)

    def decode_once(e, fb):
        e = e._replace(quant_means=e.quant_means + fb)
        img = decompress_wo_ec(bundle, e, res_state.bound, cfg, qcfg)
        return img, img[0, 0, 0] * 1e-7

    out = jax.jit(lambda e: decode_once(e, jnp.zeros(()))[0])(enc)

    stats = analysis_wo_ec(enc, cfg, qcfg, bundle)
    metrics = jax.jit(lambda a, b: (psnr_fn(a, b), ms_ssim(a, b)))
    psnr_v, msssim_v = metrics(out, gt)
    stats.update({
        "psnr": float(psnr_v),
        "ms_ssim": float(msssim_v),
    })

    # Decode-FPS measurement is OPT-IN (n_renders > 0): the sweep's job is
    # quality; bench.py owns the headline decode-FPS protocol. Round-2
    # lessons baked in here: (a) a short scan's dispatch overhead does NOT
    # amortize through the dev relay (0.1-3.4 s/call), so the recorded
    # 4-26 "fps" were ~1000x-off garbage — a two-length marginal
    # subtraction cancels it; (b) fresh-shape long-scan compiles through
    # the remote compile service stalled 25+ min on portrait images, so
    # skipping this entirely (the default) removes the biggest per-image
    # compile risk. Field name says what it is: the full per-frame
    # decompress_wo_ec protocol (train_quantize.py:239-247), not the
    # bin-once production decode path.
    if n_renders and n_renders > 0:
        def decode_n_factory(n):
            @jax.jit
            def decode_n(e, fb0):
                def body(fb, _):
                    img, fb2 = decode_once(e, fb)
                    return fb2, img[0, 0, 0]
                fb, probes = jax.lax.scan(body, fb0, None, length=n)
                img, _ = decode_once(e, fb)
                return img, probes
            return decode_n

        times = {}
        n_small = max(2, n_renders // 5)
        for n in (n_small, n_renders):
            f = decode_n_factory(n)
            img, probes = f(enc, jnp.zeros(()))
            _ = np.asarray(img)
            best = float("inf")
            fb = float(probes[0]) * 1e-9
            for _ in range(3):
                t0 = time.perf_counter()
                img, probes = f(enc, jnp.asarray(fb))
                _ = np.asarray(img)
                best = min(best, time.perf_counter() - t0)
                fb += 1e-9
            times[n] = best
        delta = times[n_renders] - times[n_small]
        dt = (delta / (n_renders - n_small) if delta > 0.005
              else times[n_renders] / n_renders)
        stats["decode_full_time"] = dt
        stats["decode_full_fps"] = 1.0 / dt

    # ANS-recompressed rate (bpp_wc): quantized-Gaussian global model over the
    # cov and color code streams (train_quantize.py:250-252 — position keeps
    # its fixed-width rate).
    from .entropy import gaussian_global_bits

    active = np.asarray(enc.active)
    hw = cfg.H * cfg.W
    cov_codes = np.asarray(enc.quant_cov)[active]
    col_codes = np.asarray(enc.color_codes)[active]
    stats["cholesky_bpp_wc"] = gaussian_global_bits(cov_codes) / hw
    stats["feature_dc_bpp_wc"] = gaussian_global_bits(col_codes) / hw
    stats["bpp_wc"] = (stats["position_bpp"] + stats["cholesky_bpp_wc"]
                       + stats["feature_dc_bpp_wc"])

    if write_bitstream is not None:
        from .bitstream import decode_bitstream, serialize_bitstream

        enc_s = enc
        if stream_order == "morton":
            from .pipeline import morton_reorder

            enc_s, _ = morton_reorder(enc, res_state.bound, cfg)
        data = serialize_bitstream(bundle, enc_s, cfg, qcfg)
        with open(write_bitstream, "wb") as f:
            f.write(data)
        img_rt, dec = decode_bitstream(data)
        stats["bpp_stream"] = dec.bpp
        stats["stream_psnr"] = float(psnr_fn(img_rt, gt))
    return stats
