"""Quantization-aware fine-tuning + codec: the train_quantize.py capability.

Flow (reference train_quantize.py:118-269 + gaussianimage_covariance.py):
 1. warmup phase = plain representation training (prune/grow active);
 2. at ``warmup_iter``: restore the best snapshot, rebuild the model optimizer
    at the schedule's current LR, attach quantizers initialized from the data
    (_init_data, gaussianimage_covariance.py:148-153);
 3. quantization-aware fine-tune through STE quantizers, each quantizer with
    its own Adam + StepLR(10000, 0.5) (training_setup, :116-146 — note the
    eps quirk: xy quantizer Adam uses the torch default eps=1e-8, cov/color
    use eps=1e-15);
 4. encode: integer codes per attribute + PSD-prune of points that became
    invalid after quantization (compress_wo_ec, :412-443);
 5. decode = dequantize + render (decompress_wo_ec, :445-467), timed for FPS;
 6. bpp accounting from bit widths (analysis_wo_ec, :469-509).

All quantizer statistics are computed over ACTIVE rows only (the reference
operates on dense row arrays; here inactive slots are masked out of min/max).
"""

from __future__ import annotations

import functools
import time
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.gaussian_image import (
    GaussianConfig,
    GaussianParams,
    GaussianState,
    colors_of,
    effective_cov2d,
    render,
)
from ..core.gaussian2d import psd_valid_mask
from ..train.losses import loss_fn
from ..train.metrics import psnr as psnr_fn
from .quantizers import (
    HybridQuantParams,
    LogQuantState,
    UniformQuantParams,
    fake_quantize_half,
    hybrid_size,
    log_decompress,
    ste_round,
    uniform_qrange,
)


@struct.dataclass
class QuantConfig:
    xy_bit: int = struct.field(pytree_node=False, default=12)
    cov_bit: int = struct.field(pytree_node=False, default=10)
    color_bit: int = struct.field(pytree_node=False, default=6)
    xy_quant: str = struct.field(pytree_node=False, default="lsq")    # lsq | fp16
    cov_quant: str = struct.field(pytree_node=False, default="lsq")   # (hybrid)
    color_quant: str = struct.field(pytree_node=False, default="lsq") # lsq | vq
    quant_lr: float = struct.field(pytree_node=False, default=1e-3)
    quant_lr_step: int = struct.field(pytree_node=False, default=10000)
    quant_lr_gamma: float = struct.field(pytree_node=False, default=0.5)
    # per-tile capacity used by the decode render. 0 (default) = decode at
    # the training cap — anything lower CLIPS: 50k-converged Kodak states
    # reach 81-240 members/tile (the round-1 "~32 peak" held only for short
    # fits), and a decode_cap below occupancy silently drops contributors
    # (kodim01 lost 0.8 dB decoding at 64 what was trained at 256). Set
    # explicitly only when the state's occupancy is KNOWN to fit (e.g. the
    # bin-once prepare_decode path trims to measured occupancy instead).
    decode_cap: int = struct.field(pytree_node=False, default=0)
    # LSQ grid init from the [100-p, p] percentiles instead of min/max
    # (100.0 = reference parity, _init_data gaussianimage_covariance.py:148).
    # Converged color distributions are heavy-tailed; clipping the grid to
    # p=99 lifts the 6-bit color data-init from 14.6 to 24.5 dB on kodim01
    # (EXPERIMENTS.md "QAT drop attribution") and QAT's learned scale starts
    # closer to where it converges anyway.
    init_percentile: float = struct.field(pytree_node=False, default=100.0)


@struct.dataclass
class QuantizerBundle:
    """Learned quantizer parameters + optimizer states.

    ``color_vq`` carries the ResidualVQ codebooks when
    ``color_quant == 'vq'`` (EMA-updated inside the quantized forward, no
    optimizer — matching vector-quantize-pytorch's codebook handling); the
    LSQ ``color`` params are unused in that mode.
    """

    xy: UniformQuantParams
    cov: HybridQuantParams
    color: UniformQuantParams
    xy_opt: Any
    cov_opt: Any
    color_opt: Any
    step: jax.Array  # shared schedule counter (all schedulers step together)
    color_vq: Any = None


def _masked_min_max(x: jax.Array, active: jax.Array, percentile: float = 100.0):
    m = active[:, None]
    if percentile >= 100.0:
        big = jnp.finfo(x.dtype).max
        return (jnp.min(jnp.where(m, x, big), axis=0),
                jnp.max(jnp.where(m, x, -big), axis=0))
    # percentiles over active rows only: push inactive rows to the median so
    # they don't drag the tails (they are excluded from the mass that counts)
    med = jnp.nanmedian(jnp.where(m, x, jnp.nan), axis=0)
    xa = jnp.where(m, x, med)
    return (jnp.percentile(xa, 100.0 - percentile, axis=0),
            jnp.percentile(xa, percentile, axis=0))


def _uniform_init_masked(x, active, bits, signed=False,
                         percentile: float = 100.0) -> UniformQuantParams:
    qmin, qmax = uniform_qrange(bits, signed)
    t_min, t_max = _masked_min_max(x, active, percentile)
    scale = (t_max - t_min) / (qmax - qmin)
    scale = jnp.where(scale == 0, 1e-8, scale)
    return UniformQuantParams(scale=scale, beta=t_min - qmin * scale)


def _uniform_fwd(params, x, bits, signed=False):
    qmin, qmax = uniform_qrange(bits, signed)
    code = jnp.clip((x - params.beta) / params.scale, qmin, qmax)
    quant = ste_round(code)
    return quant * params.scale + params.beta, quant


def _log_fwd_masked(x, active, bits):
    """Non-learned log quantizer over active rows only (quantize.py:219-234)."""
    qmin, qmax = uniform_qrange(bits, signed=False)
    log_x = jnp.log(jnp.abs(x) + 1e-6)
    m = active[:, None]
    big = jnp.finfo(x.dtype).max
    beta = jnp.min(jnp.where(m, log_x, big))
    max_log = jnp.max(jnp.where(m, log_x, -big))
    scale = jnp.maximum((max_log - beta) / (qmax - qmin), 1e-12)
    code = jnp.clip((log_x - beta) / scale, qmin, qmax)
    quant = ste_round(code)
    return jnp.exp(quant * scale + beta), quant, LogQuantState(beta=beta, scale=scale)


def _adam(lr, step_size, gamma, eps):
    return optax.adam(learning_rate=lambda c: lr * gamma ** (c // step_size),
                      b1=0.9, b2=0.999, eps=eps, eps_root=0.0)


def make_quantizer_opts(qcfg: QuantConfig):
    """Per-quantizer Adams (gaussianimage_covariance.py:119-146).

    xy uses torch's default eps=1e-8 (:122); cov and color use eps=1e-15
    (:131-132, :143-144). All share StepLR(10000, 0.5).
    """
    mk = lambda eps: _adam(qcfg.quant_lr, qcfg.quant_lr_step, qcfg.quant_lr_gamma, eps)
    return mk(1e-8), mk(1e-15), mk(1e-15)


def init_quantizers(state: GaussianState, cfg: GaussianConfig,
                    qcfg: QuantConfig) -> QuantizerBundle:
    """_init_data (gaussianimage_covariance.py:148-153) on the current state."""
    active = state.active
    pct = qcfg.init_percentile
    xy_p = _uniform_init_masked(state.params.xyz, active, qcfg.xy_bit)
    cov_eff = effective_cov2d(state.params, state.bound, cfg)
    cov_p = HybridQuantParams(
        cov=_uniform_init_masked(cov_eff[:, 1:2], active, qcfg.cov_bit, percentile=pct))
    col_p = _uniform_init_masked(colors_of(state.params, cfg), active,
                                 qcfg.color_bit, percentile=pct)
    color_vq = None
    if qcfg.color_quant == "vq":
        # VectorQuantizer(codebook_dim=3, codebook_size=8, num_quantizers=2,
        # kmeans_iters=5) — gaussianimage_covariance.py:137-138
        from .residual_vq import init_residual_vq

        colors = colors_of(state.params, cfg)
        # kmeans over active rows only: replace inactive with the first active
        first = jnp.argmax(active)
        colors = jnp.where(active[:, None], colors, colors[first])
        color_vq = init_residual_vq(colors, num_quantizers=2, codebook_size=8,
                                    key=jax.random.PRNGKey(0), kmeans_iters=5)
    xy_tx, cov_tx, col_tx = make_quantizer_opts(qcfg)
    return QuantizerBundle(
        xy=xy_p, cov=cov_p, color=col_p,
        xy_opt=xy_tx.init(xy_p), cov_opt=cov_tx.init(cov_p),
        color_opt=col_tx.init(col_p), step=jnp.zeros((), jnp.int32),
        color_vq=color_vq)


def quantize_attributes(bundle: QuantizerBundle, state: GaussianState,
                        cfg: GaussianConfig, qcfg: QuantConfig):
    """forward_quantize's attribute path (gaussianimage_covariance.py:384-393).

    Returns (means, cov_elements, colors, codes dict, log_state).
    """
    if qcfg.xy_quant == "fp16":
        means = fake_quantize_half(state.params.xyz)
        code_xy = means
    else:
        means, code_xy = _uniform_fwd(bundle.xy, state.params.xyz, qcfg.xy_bit)
    cov_eff = effective_cov2d(state.params, state.bound, cfg)
    var_dq, code_var, log_state = _log_fwd_masked(cov_eff[:, ::2], state.active,
                                                  qcfg.cov_bit)
    cov_dq, code_cov = _uniform_fwd(bundle.cov.cov, cov_eff[:, 1:2], qcfg.cov_bit)
    cov_elements = jnp.concatenate(
        [var_dq[:, 0:1], cov_dq, var_dq[:, 1:2]], axis=1)
    code_cov3 = jnp.concatenate(
        [code_var[:, 0:1], code_cov, code_var[:, 1:]], axis=1)
    raw_colors = colors_of(state.params, cfg)
    if qcfg.color_quant == "vq":
        from .residual_vq import residual_vq_forward

        colors, _vq_loss, code_col, new_vq = residual_vq_forward(
            bundle.color_vq, raw_colors, update=True)
        codes = {"xy": code_xy, "cov": code_cov3, "color": code_col,
                 "color_vq_state": new_vq}
    else:
        colors, code_col = _uniform_fwd(bundle.color, raw_colors, qcfg.color_bit)
        codes = {"xy": code_xy, "cov": code_cov3, "color": code_col}
    return means, cov_elements, colors, codes, log_state


def render_quantized(bundle: QuantizerBundle, state: GaussianState,
                     cfg: GaussianConfig, qcfg: QuantConfig):
    means, cov_elements, colors, codes, log_state = quantize_attributes(
        bundle, state, cfg, qcfg)
    img = render(state, cfg, cov_override=cov_elements, means_override=means,
                 colors_override=colors)
    return img, codes, log_state


@functools.partial(jax.jit, static_argnames=("cfg", "qcfg", "model_lr", "n_steps"))
def quant_train_chunk(state: GaussianState, model_opt_state, bundle: QuantizerBundle,
                      gt: jax.Array, cfg: GaussianConfig, qcfg: QuantConfig,
                      model_lr: float, n_steps: int,
                      best=None):
    """n quantization-aware steps (train_iter_quantize,
    gaussianimage_covariance.py:219-247): image loss only (vq_loss computed
    but never added, :224), model Adam + three quantizer Adams all stepped.

    ``best`` is an optional (psnr, params, bundle_params, color_vq) carry
    holding the best-quantized-PSNR snapshot, updated per step in-graph
    (matching the reference's per-iteration state_dict deepcopy,
    train_quantize.py:166-169 — which INCLUDES the VQ submodule's EMA
    codebooks; color_vq is None in lsq mode and rides along as an empty
    subtree).
    """
    model_tx = _adam(model_lr, 20000, 0.5, 1e-15)
    xy_tx, cov_tx, col_tx = make_quantizer_opts(qcfg)
    if best is None:
        best = (jnp.full((), -jnp.inf), state.params,
                (bundle.xy, bundle.cov, bundle.color), bundle.color_vq)

    def one_step(carry, _):
        state, model_opt_state, bundle, best = carry

        def objective(params, xy_p, cov_p, col_p):
            b = bundle.replace(xy=xy_p, cov=cov_p, color=col_p)
            img, codes, _ = render_quantized(b, state.replace(params=params), cfg, qcfg)
            return loss_fn(img, gt, "L2"), (img, codes)

        grad_fn = jax.value_and_grad(objective, argnums=(0, 1, 2, 3), has_aux=True)
        (loss, (img, codes)), (g_model, g_xy, g_cov, g_col) = grad_fn(
            state.params, bundle.xy, bundle.cov, bundle.color)

        upd, model_opt_state = model_tx.update(g_model, model_opt_state, state.params)
        upd = jax.tree.map(lambda u: jnp.where(state.active[:, None], u, 0.0), upd)
        params = optax.apply_updates(state.params, upd)

        upd_xy, xy_opt = xy_tx.update(g_xy, bundle.xy_opt, bundle.xy)
        xy_p = optax.apply_updates(bundle.xy, upd_xy)
        upd_cov, cov_opt = cov_tx.update(g_cov, bundle.cov_opt, bundle.cov)
        cov_p = optax.apply_updates(bundle.cov, upd_cov)
        upd_col, col_opt = col_tx.update(g_col, bundle.color_opt, bundle.color)
        col_p = optax.apply_updates(bundle.color, upd_col)

        bundle2 = bundle.replace(xy=xy_p, cov=cov_p, color=col_p,
                                 xy_opt=xy_opt, cov_opt=cov_opt,
                                 color_opt=col_opt, step=bundle.step + 1,
                                 color_vq=codes.get("color_vq_state",
                                                    bundle.color_vq))
        cur_psnr = psnr_fn(img, gt)
        best_psnr, best_params, best_qp, best_vq = best
        improved = cur_psnr > best_psnr
        take = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(improved, x, y), a, b)
        # snapshot the EXACT pair that produced cur_psnr (pre-update params
        # + pre-update quantizers): encode(best) then reproduces
        # best_train_psnr. The reference deepcopies the POST-update
        # state_dict (train_quantize.py:166-169) — a 1-step lag that costs
        # ~0.03 dB in lsq mode but up to 1.8 dB in vq mode when the best
        # lands while the EMA codebooks are still moving fast (measured
        # round 4, kodim01 vq: best 25.70 -> encode 23.94 with the lagged
        # snapshot). Deliberate improvement over the reference here.
        best = (jnp.where(improved, cur_psnr, best_psnr),
                take(state.params, best_params),
                take((bundle.xy, bundle.cov, bundle.color), best_qp),
                take(bundle.color_vq, best_vq))
        return ((state.replace(params=params), model_opt_state, bundle2, best),
                (loss, cur_psnr))

    (state, model_opt_state, bundle, best), (losses, psnrs) = jax.lax.scan(
        one_step, (state, model_opt_state, bundle, best), None, length=n_steps)
    return state, model_opt_state, bundle, {"loss": losses, "psnr": psnrs,
                                            "best": best}


@functools.partial(jax.jit, static_argnames=("cfg", "qcfg", "model_lr",
                                             "n_chunks", "chunk"))
def quant_train_macro_chunk(state: GaussianState, model_opt_state,
                            bundle: QuantizerBundle, gt: jax.Array,
                            cfg: GaussianConfig, qcfg: QuantConfig,
                            model_lr: float, n_chunks: int, chunk: int,
                            best=None):
    """``n_chunks`` quantized chunks fused into ONE jit dispatch.

    The QAT phase has no prune/grow (the reference gates both on
    iter < warmup_iter, train_quantize.py:159-173) and the best snapshot is
    carried in-graph, so chunks scan freely. Exists because remote-dispatch
    overhead per call (0.1-3.4 s through the relay) rivals the device time
    of a 100-step chunk; one macro dispatch per few thousand steps makes the
    QAT phase dispatch-count comparable to the repr phase's macro chunks.
    Nested scans (outer n_chunks, inner chunk) keep each scan short enough
    for the Mosaic/XLA compile path."""
    if best is None:
        best = (jnp.full((), -jnp.inf), state.params,
                (bundle.xy, bundle.cov, bundle.color), bundle.color_vq)

    def body(carry, _):
        state, mos, bundle, best = carry
        state, mos, bundle, m = quant_train_chunk(
            state, mos, bundle, gt, cfg, qcfg, model_lr, chunk, best=best)
        return (state, mos, bundle, m["best"]), (m["loss"], m["psnr"])

    (state, model_opt_state, bundle, best), (losses, psnrs) = jax.lax.scan(
        body, (state, model_opt_state, bundle, best), None, length=n_chunks)
    return state, model_opt_state, bundle, {"loss": losses.reshape(-1),
                                            "psnr": psnrs.reshape(-1),
                                            "best": best}


# --------------------------------------------------------------------------
# Codec: compress / decompress / bpp analysis
# --------------------------------------------------------------------------

class Encoding(NamedTuple):
    """compress_wo_ec output (gaussianimage_covariance.py:442-443)."""
    means: jax.Array            # dequantized xy [M, 2]
    quant_means: jax.Array      # integer codes [M, 2]
    quant_cov: jax.Array        # integer codes [M, 3]
    color_codes: jax.Array      # integer codes [M, 3] (lsq) or indices (vq)
    log_state: LogQuantState    # frozen log grid for decode
    active: jax.Array           # [M] post-quantization validity
    num_active: jax.Array


def compress_wo_ec(bundle: QuantizerBundle, state: GaussianState,
                   cfg: GaussianConfig, qcfg: QuantConfig) -> Encoding:
    """Quantize to integer codes; PSD-prune points invalidated by
    quantization (gaussianimage_covariance.py:412-443)."""
    if qcfg.xy_quant == "fp16":
        # fp16 round-trip, codes ARE the dequantized values
        # (gaussianimage_covariance.py:414-419: quant_means = means)
        means = fake_quantize_half(state.params.xyz)
        code_xy = means
    else:
        means, code_xy = _uniform_fwd(bundle.xy, state.params.xyz, qcfg.xy_bit)
    cov_eff = effective_cov2d(state.params, state.bound, cfg)
    var_dq, code_var, log_state = _log_fwd_masked(cov_eff[:, ::2], state.active,
                                                  qcfg.cov_bit)
    cov_dq, code_cov = _uniform_fwd(bundle.cov.cov, cov_eff[:, 1:2], qcfg.cov_bit)
    cov_elements = jnp.concatenate([var_dq[:, 0:1], cov_dq, var_dq[:, 1:2]], axis=1)
    code_cov3 = jnp.concatenate([code_var[:, 0:1], code_cov, code_var[:, 1:]], axis=1)
    raw_colors = colors_of(state.params, cfg)
    if qcfg.color_quant == "vq":
        from .residual_vq import residual_vq_forward

        colors, _, code_col, _ = residual_vq_forward(
            bundle.color_vq, raw_colors, update=False)
    else:
        colors, code_col = _uniform_fwd(bundle.color, raw_colors, qcfg.color_bit)
    ok = psd_valid_mask(cov_elements)
    active = state.active & ok
    return Encoding(means=means, quant_means=code_xy, quant_cov=code_cov3,
                    color_codes=code_col, log_state=log_state, active=active,
                    num_active=jnp.sum(active, dtype=jnp.int32))


def morton_reorder(enc: Encoding, bound: jax.Array,
                   cfg: GaussianConfig) -> Tuple[Encoding, jax.Array]:
    """Reorder an Encoding's Gaussian stream by the Morton code of each
    center's tile (encoder-side layout; invalid rows last).

    Accumulation blending is order-invariant, so the decoded image is
    unchanged (bit-exact set of contributions); the payload bits permute but
    the global entropy models see the same histograms, so the rate is
    unchanged too. The point is the per-frame sweep decoder
    (``backend='sweep'``): a spatially-contiguous stream lets its chunk skip
    drop ~90% of the transcendental work."""
    from ..core.binning import morton_perm

    perm = morton_perm(enc.means, enc.active, cfg.H, cfg.W,
                       cfg.block_h, cfg.block_w)
    take = lambda a: jnp.take(a, perm, axis=0)
    return (enc._replace(means=take(enc.means),
                         quant_means=take(enc.quant_means),
                         quant_cov=take(enc.quant_cov),
                         color_codes=take(enc.color_codes),
                         active=take(enc.active)),
            jnp.take(bound, perm, axis=0))


def decompress_wo_ec(bundle: QuantizerBundle, enc: Encoding, bound: jax.Array,
                     cfg: GaussianConfig, qcfg: QuantConfig,
                     fast: bool = False, backend: Optional[str] = None) -> jax.Array:
    """Dequantize codes + one render pass (gaussianimage_covariance.py:445-467).

    This is the decode-FPS path: a single fused jit program. ``backend``:

    - ``'binned'`` (default): membership + per-tile top_k + capped kernel —
      the training forward's machinery; its per-frame top_k is ~3.5 ms at
      the Kodak point.
    - ``'sweep'``: chunk-skip dense sweep (no binning, no gather, no cap);
      pair with a ``morton_reorder``-ed stream for the fast path.
    - ``'range'``: chunk-RANGE sweep — per-tile [lo, hi) chunk bounds
      precomputed in XLA (masked min/max over member ids, no top_k), the
      kernel visits only its range.
    - ``'list'``: chunk-LIST sweep — per-tile exact member-chunk lists
      (tiny [T, N/kc] top_k); visits == member chunks, the round-5
      decode candidate.
    - ``'dense'`` (or ``fast=True``): plain dense sweep — measured SLOWER
      than binned at N=5000 (transcendental-bound at T*N); small-N only.
    """
    means, cov_elements, colors = _decode_attributes(bundle, enc, qcfg)
    dummy = GaussianState(
        params=GaussianParams(xyz=means, cov2d=cov_elements, features=colors),
        active=enc.active, bound=bound,
        num_active=enc.num_active)
    if backend is None:
        backend = "dense" if fast else "binned"
    if backend in ("sweep", "range", "list", "list_t") or (
            backend == "dense" and jax.default_backend() == "tpu"):
        from ..models.gaussian_image import render_fast
        return render_fast(dummy, cfg, cov_override=cov_elements,
                           means_override=means, colors_override=colors,
                           sweep=(backend if backend in ("range", "list",
                                                         "list_t")
                                  else backend == "sweep"))
    import dataclasses
    dcap = qcfg.decode_cap if qcfg.decode_cap > 0 else cfg.tile_cap
    # pin the binned machinery explicitly: cfg's 'auto' would otherwise
    # resolve to the chunk-list backend (the r5 trainer default) and this
    # branch would silently stop measuring/serving what its name says
    dcfg = dataclasses.replace(
        cfg, tile_cap=min(dcap, cfg.tile_cap),
        raster_backend=("pallas" if jax.default_backend() == "tpu"
                        else "xla"))
    return render(dummy, dcfg, cov_override=cov_elements, means_override=means,
                  colors_override=colors)


def _decode_attributes(bundle: QuantizerBundle, enc: Encoding,
                       qcfg: QuantConfig):
    """Dequantize the integer codes back to render attributes."""
    from .quantizers import uniform_decompress

    if qcfg.xy_quant == "fp16":
        means = enc.quant_means  # already the fp16 round-trip values
    else:
        means = uniform_decompress(bundle.xy, enc.quant_means)
    var = log_decompress(enc.log_state, enc.quant_cov[:, ::2])
    cov_mid = uniform_decompress(bundle.cov.cov, enc.quant_cov[:, 1:2])
    cov_elements = jnp.concatenate([var[:, 0:1], cov_mid, var[:, 1:2]], axis=1)
    if qcfg.color_quant == "vq":
        from .residual_vq import residual_vq_decode

        colors = residual_vq_decode(bundle.color_vq, enc.color_codes)
    else:
        colors = uniform_decompress(bundle.color, enc.color_codes)
    return means, cov_elements, colors


def prepare_decode(bundle: QuantizerBundle, enc: Encoding, bound: jax.Array,
                   cfg: GaussianConfig, qcfg: QuantConfig,
                   trim: bool = True):
    """Bin-once decode: dequantize + project + bin + gather, ONCE per
    bitstream. Returns a ``kernels.raster_pallas.Prepared`` whose per-frame
    render (``decode_frame``) is a single Pallas sweep.

    The bins are a pure function of the decoded attributes, so recomputing
    them per frame (as ``decompress_wo_ec`` does, mirroring the reference's
    per-forward bin_and_sort) is pure waste for a static stream. With
    ``trim`` the per-tile capacity is cut to the actual max occupancy
    (rounded up to the sublane multiple of 8) — exact, since slots are
    front-packed.
    """
    from ..models.gaussian_image import prepare_render

    @functools.partial(jax.jit, static_argnames=())
    def _prep(bundle, enc, bound):
        means, cov_elements, colors = _decode_attributes(bundle, enc, qcfg)
        dummy = GaussianState(
            params=GaussianParams(xyz=means, cov2d=cov_elements, features=colors),
            active=enc.active, bound=bound, num_active=enc.num_active)
        return prepare_render(dummy, cfg, cov_override=cov_elements,
                              means_override=means, colors_override=colors,
                              cap=min(qcfg.decode_cap if qcfg.decode_cap > 0
                                      else cfg.tile_cap, cfg.tile_cap))

    prep = _prep(bundle, enc, bound)
    if trim:
        import numpy as np

        maxc = int(np.asarray(jnp.max(prep.counts)))
        cap2 = max(8, -(-maxc // 8) * 8)
        if cap2 < prep.raw.shape[1]:
            prep = prep._replace(raw=prep.raw[:, :cap2])
    return prep


def decode_frame(prep, cfg: GaussianConfig,
                 tiles_per_step: Optional[int] = None) -> jax.Array:
    """Per-frame decode render (the ≥2000 FPS deliverable)."""
    from ..models.gaussian_image import render_prepared

    return render_prepared(prep, cfg, tiles_per_step=tiles_per_step)


def analysis_wo_ec(enc: Encoding, cfg: GaussianConfig, qcfg: QuantConfig,
                   bundle: Optional[QuantizerBundle] = None) -> dict:
    """bpp from bit widths (analysis_wo_ec,
    gaussianimage_covariance.py:469-509): lsq attributes charge
    codes*bitwidth + 2 fp32 per channel for the quantizer grid; the vq color
    branch charges fp32 codebooks + ceil(log2(max_index)) per index
    (:487-493)."""
    import numpy as np

    n = int(enc.num_active)
    if qcfg.xy_quant == "fp16":
        # 16 bits/coord, no quantizer grid to ship (covariance.py:487-489)
        position_bits = n * 2 * 16
    else:
        position_bits = n * 2 * qcfg.xy_bit + 32 * 2 * 2
    cholesky_bits = n * 3 * hybrid_size(qcfg.cov_bit, qcfg.cov_bit) + 32 * 3 * 2
    if qcfg.color_quant == "vq" and bundle is not None:
        codebook_bits = sum(int(np.prod(cb.embed.shape)) * 32
                            for cb in bundle.color_vq.layers)
        idx = np.asarray(enc.color_codes)[np.asarray(enc.active)]
        max_bit = float(np.ceil(np.log2(max(int(idx.max()), 1) + 1e-9))) if idx.size else 0
        feature_bits = idx.size * max_bit + codebook_bits
    else:
        feature_bits = n * 3 * qcfg.color_bit + 32 * 3 * 2
    hw = cfg.H * cfg.W
    return {
        "bpp": (position_bits + cholesky_bits + feature_bits) / hw,
        "position_bpp": position_bits / hw,
        "cholesky_bpp": cholesky_bits / hw,
        "feature_dc_bpp": feature_bits / hw,
        "num_points": n,
    }
