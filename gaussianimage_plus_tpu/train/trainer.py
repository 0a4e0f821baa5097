"""Per-image overfit trainer: jitted chunked loop, growth/prune scheduling.

Reference: ``SimpleTrainer2d`` (train.py:27-191). The reference runs one
Python iteration per optimizer step with a host sync every step (loss.item())
and deep-copies the best state dict on every PSNR improvement
(train.py:133-139). Here the loop is restructured for XLA:

- ``train_chunk`` scans ``prune_iter`` (default 100) steps inside one jit —
  matching the reference's prune cadence exactly (train.py:147-148) — and
  keeps the best-PSNR parameter snapshot *in-graph* via ``jnp.where``
  (replaces the deepcopy at train.py:137), so the whole fit runs with a few
  dozen dispatches and zero per-step host syncs.
- growth fires every ``grow_iter`` (default 5000) steps on the chunk's final
  pre-update render (train.py:150-152), with the final fill-to-max at
  ``iterations - grow_iter`` (train.py:93-94).
- optimizer moments are zeroed at newly activated slots
  (cat_tensors_to_optimizer zero-padding, gaussianimage_covariance.py:269-272)
  and parameter updates are masked to active slots.

Evaluation keeps the reference protocol: 1 warmup render + 100 timed renders,
PSNR from float MSE, MS-SSIM (train.py:178-191).
"""

from __future__ import annotations

import functools
import time
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.gaussian_image import (
    GaussianConfig,
    GaussianParams,
    GaussianState,
    grow,
    init_state,
    prune,
    render,
)
from .losses import loss_fn, ms_ssim
from .metrics import psnr as psnr_fn
from .optim import make_adam


@struct.dataclass
class TrainConfig:
    iterations: int = struct.field(pytree_node=False, default=50000)
    lr: float = struct.field(pytree_node=False, default=0.018)
    prune_iter: int = struct.field(pytree_node=False, default=100)
    grow_iter: int = struct.field(pytree_node=False, default=5000)
    adaptive_add: bool = struct.field(pytree_node=False, default=True)
    prune: bool = struct.field(pytree_node=False, default=True)
    loss_type: str = struct.field(pytree_node=False, default="L2")
    lambda_value: float = struct.field(pytree_node=False, default=0.7)
    base_num_samples: int = struct.field(pytree_node=False, default=1000)
    lr_step_size: int = struct.field(pytree_node=False, default=20000)
    lr_gamma: float = struct.field(pytree_node=False, default=0.5)
    # per-group learning-rate multipliers (1.0 = reference parity). The
    # covariance model's positions live in raw pixels, so at lr=0.018 they
    # move ~0.018 px/step — an order of magnitude slower than the Cholesky
    # model's tanh-reparameterized positions; xyz_lr_scale > 1 compensates
    # (quality mode).
    xyz_lr_scale: float = struct.field(pytree_node=False, default=1.0)
    cov_lr_scale: float = struct.field(pytree_node=False, default=1.0)
    color_lr_scale: float = struct.field(pytree_node=False, default=1.0)
    # "adam" (reference default) or "adan" (the legacy-recipe optimizer the
    # reference auto-selects for non-Covariance models, train.py:256-262)
    opt_type: str = struct.field(pytree_node=False, default="adam")
    # hard bound on steps fused into ONE device execution: a single >60s
    # execution has been observed to take the TPU worker down through the
    # relay. 2500 is safe at Kodak step times (~13 ms); lower it for big
    # images (2K at ~100 ms/step needs <=500)
    max_dispatch_steps: int = struct.field(pytree_node=False, default=2500)
    # Re-sort the Gaussian stream by Morton code at every chunk boundary
    # (performance layout for the sweep raster backend: params + optimizer
    # moments permute TOGETHER, so the math is exact — only the summation
    # order inside the blend changes, and the per-tile cap clipping order
    # for binned backends at over-cap tiles). Default off = reference id
    # order.
    morton_resort: bool = struct.field(pytree_node=False, default=False)
    # L2 penalty on per-Gaussian color magnitude (quality lever, default off
    # = reference parity). Converged accumulation-blended fits grow colors
    # with a heavy tail ([-10.7, 29.0] on kodim01 at 50k) which is what the
    # 6-bit color quantizer chokes on (-12 dB at data init; see
    # EXPERIMENTS.md "QAT drop attribution") — a small color_reg tightens
    # the distribution the codec has to carry.
    color_reg: float = struct.field(pytree_node=False, default=0.0)


@struct.dataclass
class TrainState:
    gaussians: GaussianState
    opt_state: Any
    key: jax.Array
    step: jax.Array            # [] int32, completed iterations
    best_psnr: jax.Array       # [] f32
    best_iter: jax.Array       # [] int32
    best_params: GaussianParams
    best_active: jax.Array
    best_bound: jax.Array
    best_num_active: jax.Array


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    if tcfg.opt_type == "adan":
        from .optim import adan, step_lr
        return adan(step_lr(tcfg.lr, tcfg.lr_step_size, tcfg.lr_gamma))
    return make_adam(tcfg.lr, tcfg.lr_step_size, tcfg.lr_gamma)


def init_train_state(cfg: GaussianConfig, tcfg: TrainConfig, num_points: int,
                     seed: int = 3047, gaussians=None) -> TrainState:
    """Fresh TrainState (fresh optimizer + schedule at step 0).

    ``gaussians``: warm-start from an existing GaussianState instead of a
    random init — the reference's checkpoint-resume semantics
    (train_quantize.py:53-69 load + training_setup: the loaded attributes get
    a brand-new Adam/StepLR)."""
    key = jax.random.PRNGKey(seed)
    k_init, key = jax.random.split(key)
    gs = gaussians if gaussians is not None else init_state(cfg, num_points, k_init)
    tx = make_optimizer(tcfg)
    opt_state = tx.init(gs.params)
    return TrainState(
        gaussians=gs, opt_state=opt_state, key=key,
        step=jnp.zeros((), jnp.int32),
        best_psnr=jnp.full((), -jnp.inf),
        best_iter=jnp.zeros((), jnp.int32),
        best_params=gs.params, best_active=gs.active, best_bound=gs.bound,
        best_num_active=gs.num_active)


def _mask_updates(updates: GaussianParams, active: jax.Array) -> GaussianParams:
    m = active[:, None]
    return jax.tree.map(lambda u: jnp.where(m, u, 0.0), updates)


def _zero_state_rows(opt_state, mask: jax.Array):
    """Zero optimizer moment rows at ``mask`` (slot re-activation)."""

    def zero_rows(x):
        if isinstance(x, jnp.ndarray) and x.ndim >= 1 and x.shape[0] == mask.shape[0]:
            return jnp.where(mask.reshape((-1,) + (1,) * (x.ndim - 1)), 0.0, x)
        return x

    return jax.tree.map(zero_rows, opt_state)


def train_step(ts: TrainState, gt: jax.Array, cfg: GaussianConfig,
               tcfg: TrainConfig, tx: optax.GradientTransformation,
               render_fn=None):
    """One optimizer step (train_iter, gaussianimage_covariance.py:249-259).

    ``render_fn(state, cfg) -> [H, W, 3]`` overrides the render (e.g. the
    tile-sharded mesh render from ``parallel.sharded``); default is the
    single-device path. Returns (new_ts, (loss, psnr, pre-update render)).
    """
    gs = ts.gaussians
    _render = render if render_fn is None else render_fn

    def objective(params: GaussianParams):
        img = _render(gs.replace(params=params), cfg)
        loss = loss_fn(img, gt, tcfg.loss_type, tcfg.lambda_value)
        if tcfg.color_reg:
            m = gs.active[:, None]
            loss = loss + tcfg.color_reg * (
                jnp.sum(jnp.where(m, params.features, 0.0) ** 2)
                / jnp.maximum(jnp.sum(gs.active), 1))
        return loss, img

    (loss, img), grads = jax.value_and_grad(objective, has_aux=True)(gs.params)
    updates, opt_state = tx.update(grads, ts.opt_state, gs.params)
    updates = _mask_updates(updates, gs.active)
    if (tcfg.xyz_lr_scale, tcfg.cov_lr_scale, tcfg.color_lr_scale) != (1.0, 1.0, 1.0):
        updates = updates.replace(
            xyz=updates.xyz * tcfg.xyz_lr_scale,
            cov2d=updates.cov2d * tcfg.cov_lr_scale,
            features=updates.features * tcfg.color_lr_scale)
    params = optax.apply_updates(gs.params, updates)
    if cfg.psd_mode == "clamp":
        from ..models.gaussian_image import psd_clamp
        params = psd_clamp(params, gs.bound, cfg)

    step = ts.step + 1
    cur_psnr = psnr_fn(img, gt)
    improved = cur_psnr > ts.best_psnr
    take = lambda new, old: jax.tree.map(
        lambda a, b: jnp.where(improved, a, b), new, old)
    ts = ts.replace(
        gaussians=gs.replace(params=params),
        opt_state=opt_state, step=step,
        best_psnr=jnp.where(improved, cur_psnr, ts.best_psnr),
        best_iter=jnp.where(improved, step, ts.best_iter),
        # snapshot the *pre-update* params that produced this PSNR, matching
        # the reference which deepcopies state after train_iter (train.py:137)
        # — note the reference's state dict at that point contains the
        # POST-update params; we snapshot post-update too for parity:
        best_params=take(params, ts.best_params),
        best_active=take(gs.active, ts.best_active),
        best_bound=take(gs.bound, ts.best_bound),
        best_num_active=jnp.where(improved, gs.num_active, ts.best_num_active),
    )
    return ts, (loss, cur_psnr, img)


def _grow_ts(ts: TrainState, gt, cfg, tcfg, last_img, final_fill):
    k_grow, key = jax.random.split(ts.key)
    gs, n_added, new_mask = grow(
        ts.gaussians, cfg, last_img, gt, k_grow,
        final_fill=jnp.asarray(final_fill),
        base_num_samples=tcfg.base_num_samples)
    opt_state = _zero_state_rows(ts.opt_state, new_mask)
    return ts.replace(gaussians=gs, opt_state=opt_state, key=key), n_added


def _morton_resort(ts: TrainState, cfg: GaussianConfig) -> TrainState:
    """Permute the live Gaussian stream (params + optimizer moment rows +
    active/bound) into Morton order — a pure layout move: every per-row
    quantity moves together, so the optimization trajectory is unchanged
    up to float summation order in the blend."""
    from ..core.binning import morton_perm

    gs = ts.gaussians
    perm = morton_perm(gs.params.xyz, gs.active, cfg.H, cfg.W,
                       cfg.block_h, cfg.block_w)
    take = lambda x: jnp.take(x, perm, axis=0)
    gs = gs.replace(params=jax.tree.map(take, gs.params),
                    active=take(gs.active), bound=take(gs.bound))
    n = perm.shape[0]

    def permute_rows(x):
        if isinstance(x, jnp.ndarray) and x.ndim >= 1 and x.shape[0] == n:
            return jnp.take(x, perm, axis=0)
        return x

    return ts.replace(gaussians=gs,
                      opt_state=jax.tree.map(permute_rows, ts.opt_state))


def _train_chunk_impl(ts: TrainState, gt: jax.Array, cfg: GaussianConfig,
                      tcfg: TrainConfig, n_steps: int, do_prune: bool,
                      do_grow: bool, final_fill=False, render_fn=None,
                      carry_img=None):
    tx = make_optimizer(tcfg)
    # The sweep-family backends lean entirely on a spatially-ordered stream
    # (list backend id-order vs Morton: 93 vs 9.4 ms/step, r5_perf) — keep
    # it sorted for them regardless of the flag. Exact: params + opt
    # moments permute together, blending is order-free.
    from ..models.gaussian_image import resolve_backend
    if tcfg.morton_resort or resolve_backend(cfg) in ("sweep", "list",
                                                      "list_t"):
        ts = _morton_resort(ts, cfg)

    def body(carry, _):
        ts, _img = carry
        ts, (loss, p, img) = train_step(ts, gt, cfg, tcfg, tx, render_fn)
        return (ts, img), (loss, p)

    if carry_img is None:
        carry_img = jnp.zeros((cfg.H, cfg.W, 3))
    (ts, last_img), (losses, psnrs) = jax.lax.scan(
        body, (ts, carry_img), None, length=n_steps)

    n_pruned = jnp.zeros((), jnp.int32)
    if do_prune:
        gs, n_pruned = prune(ts.gaussians, cfg)
        ts = ts.replace(gaussians=gs)

    n_added = jnp.zeros((), jnp.int32)
    if do_grow:
        ts, n_added = _grow_ts(ts, gt, cfg, tcfg, last_img, final_fill)

    return ts, {"loss": losses, "psnr": psnrs, "n_pruned": n_pruned,
                "n_added": n_added}, last_img


@functools.partial(jax.jit, static_argnames=("cfg", "tcfg", "n_steps", "do_prune",
                                             "do_grow", "render_fn"))
def train_chunk(ts: TrainState, gt: jax.Array, cfg: GaussianConfig,
                tcfg: TrainConfig, n_steps: int, do_prune: bool,
                do_grow: bool, final_fill=False, render_fn=None):
    """``n_steps`` fused train steps + optional prune + optional growth.

    Returns (ts, metrics dict of per-chunk arrays).
    """
    ts, m, _ = _train_chunk_impl(ts, gt, cfg, tcfg, n_steps, do_prune, do_grow,
                                 final_fill, render_fn)
    return ts, m


@functools.partial(jax.jit, static_argnames=("cfg", "tcfg", "n_chunks", "chunk",
                                             "do_prune", "do_grow", "render_fn"))
def train_macro_chunk(ts: TrainState, gt: jax.Array, cfg: GaussianConfig,
                      tcfg: TrainConfig, n_chunks: int, chunk: int,
                      do_prune: bool, do_grow: bool, final_fill=False,
                      render_fn=None):
    """``n_chunks`` prune-cadence chunks fused into ONE jit dispatch.

    Shapes are static, so the prune at every ``chunk`` boundary is
    scan-compatible; growth (if any) fires once at the END of the macro chunk
    on the same pre-update render `train_chunk` would use — call with
    ``n_chunks*chunk == grow_iter`` and the result is step-for-step identical
    to ``n_chunks`` successive ``train_chunk`` calls. Exists because
    remote-dispatch overhead per call can rival the device time of a 100-step
    chunk; one macro chunk per grow period cuts the dispatch count by
    grow_iter/prune_iter (50x at the reference cadence)."""

    def body(carry, _):
        ts, img = carry
        ts, m, img = _train_chunk_impl(ts, gt, cfg, tcfg, chunk, do_prune,
                                       False, False, render_fn, carry_img=img)
        return (ts, img), (m["loss"], m["psnr"], m["n_pruned"])

    dummy = jnp.zeros((cfg.H, cfg.W, 3))
    (ts, last_img), (losses, psnrs, n_pruned) = jax.lax.scan(
        body, (ts, dummy), None, length=n_chunks)

    n_added = jnp.zeros((), jnp.int32)
    if do_grow:
        ts, n_added = _grow_ts(ts, gt, cfg, tcfg, last_img, final_fill)

    return ts, {"loss": losses.reshape(-1), "psnr": psnrs.reshape(-1),
                "n_pruned": jnp.sum(n_pruned), "n_added": n_added}


def restore_best(ts: TrainState) -> GaussianState:
    """Rebuild the best-PSNR GaussianState (train.py:158-164)."""
    return ts.gaussians.replace(
        params=ts.best_params, active=ts.best_active, bound=ts.best_bound,
        num_active=ts.best_num_active)


class FitResult(NamedTuple):
    state: GaussianState
    best_psnr: float
    best_iter: int
    train_time: float
    history: dict


def fit_image(gt: jax.Array, cfg: GaussianConfig, tcfg: TrainConfig,
              num_points: int, seed: int = 3047,
              log_every: Optional[int] = None, logger=None,
              checkpoint_dir: Optional[str] = None,
              checkpoint_every: int = 5000,
              resume: bool = False,
              stop_after_iter: Optional[int] = None,
              render_fn=None) -> FitResult:
    """Full single-image fit (train.py:120-176): chunked jit loop with the
    reference's prune/grow cadence, then restore the best snapshot.

    Robustness hooks (the reference restarts from scratch on any crash;
    long sweeps here survive backend aborts):
    - ``checkpoint_dir``: save the full TrainState every ``checkpoint_every``
      iterations (orbax; exact resume — the PRNG key rides in the state).
    - ``resume``: continue from the checkpoint if one exists.
    - ``stop_after_iter``: checkpoint and return early at the first dispatch
      boundary at or after this iteration (overshoot < max_dispatch_steps;
      time-budgeted runs — the returned FitResult is the best-so-far).
    """
    ts = init_train_state(cfg, tcfg, num_points, seed)
    gt = jnp.asarray(gt)
    chunk = tcfg.prune_iter
    assert tcfg.iterations % chunk == 0, "iterations must divide by prune_iter"
    history = {"loss": [], "psnr": []}

    # dispatch granularity: one jit call per grow period when the cadences
    # line up (remote dispatch overhead per call rivals the device time of a
    # 100-step chunk; train_macro_chunk is step-for-step identical) — but no
    # single dispatch above max_dispatch_steps: one >60s device execution
    # has been observed to take the TPU worker down through the relay
    # (cap-256 5000-step macros crash with "TPU worker crashed or restarted")
    MAX_MACRO_STEPS = max(chunk, tcfg.max_dispatch_steps // chunk * chunk)
    seg = tcfg.grow_iter if (tcfg.grow_iter % chunk == 0
                             and tcfg.iterations % tcfg.grow_iter == 0) else chunk
    sub = seg
    while sub > MAX_MACRO_STEPS:
        sub = sub // 2 if (sub // 2) % chunk == 0 else chunk

    ckpt_path = None
    start_iter = 0
    if checkpoint_dir is not None:
        import os
        from ..utils.checkpoint import load_checkpoint, save_checkpoint
        ckpt_path = os.path.join(checkpoint_dir, "fit_ckpt")
        if resume and os.path.exists(ckpt_path):
            ts, extra = load_checkpoint(ckpt_path, ts)
            start_iter = int(extra["next_iter"])
            if log_every:
                (logger.write if logger else print)(
                    f"resumed at iter {start_iter}")
            if start_iter >= tcfg.iterations:
                # completed run (the final checkpoint records
                # next_iter == iterations): a retried sweep that crashed
                # between fit completion and its result append lands here —
                # return the fitted best instead of re-entering the (empty)
                # schedule loop
                best = restore_best(ts)
                empty = jnp.zeros((0,), jnp.float32)
                return FitResult(
                    state=best, best_psnr=float(ts.best_psnr),
                    best_iter=int(ts.best_iter), train_time=0.0,
                    history={"loss": empty, "psnr": empty})

    # explicit dispatch schedule: grow periods split into <=MAX_MACRO_STEPS
    # sub-segments (grow fires only at the period's end, exactly as one big
    # macro would — bitwise-identical, see TestDispatchBound); stop/resume/
    # checkpoint all operate at sub-segment granularity
    sched = []
    for it0 in range(0, tcfg.iterations, seg):
        seg_end = it0 + seg
        for p0 in range(it0, seg_end, sub):
            sched.append((p0, min(p0 + sub, seg_end), seg_end))

    t0 = time.perf_counter()
    for p0, p1, seg_end in sched:
        if p1 <= start_iter:
            continue
        if p0 < start_iter:
            raise ValueError(
                f"checkpointed next_iter={start_iter} does not lie on the "
                f"current dispatch schedule (segment [{p0}, {p1})). The "
                f"checkpoint was written under different scheduling "
                f"parameters — current: max_dispatch_steps="
                f"{tcfg.max_dispatch_steps}, grow_iter={tcfg.grow_iter}, "
                f"prune_iter={tcfg.prune_iter}, iterations="
                f"{tcfg.iterations}. Resume with the run's original "
                f"settings, or delete the checkpoint to restart.")
        do_grow = (tcfg.adaptive_add and seg_end % tcfg.grow_iter == 0
                   and seg_end < tcfg.iterations)
        final_fill = seg_end == tcfg.iterations - tcfg.grow_iter
        last = p1 == seg_end
        n_chunks = (p1 - p0) // chunk
        if n_chunks == 1:
            ts, m = train_chunk(ts, gt, cfg, tcfg, chunk, tcfg.prune,
                                do_grow and last, final_fill and last,
                                render_fn)
        else:
            ts, m = train_macro_chunk(ts, gt, cfg, tcfg, n_chunks, chunk,
                                      tcfg.prune, do_grow and last,
                                      final_fill and last, render_fn)
        if log_every and last and (seg_end % log_every == 0
                                   or seg >= log_every):
            lp = float(m["psnr"][-1])
            msg = (f"iter {seg_end}: psnr {lp:.4f} best {float(ts.best_psnr):.4f} "
                   f"n {int(ts.gaussians.num_active)}")
            (logger.write if logger else print)(msg)
        history["loss"].append(m["loss"])
        history["psnr"].append(m["psnr"])
        stopping = stop_after_iter is not None and p1 >= stop_after_iter
        if ckpt_path and (p1 % checkpoint_every == 0 or stopping) \
                and p1 < tcfg.iterations:
            save_checkpoint(ckpt_path, ts, extra={"next_iter": p1})
        if stopping:
            break
    jax.block_until_ready(ts.gaussians.params.xyz)
    train_time = time.perf_counter() - t0
    if ckpt_path and p1 == tcfg.iterations:
        # final checkpoint at completion: downstream warm starts (the QAT
        # sweep loads restore_best of this state, train_quantize.py:53-69
        # semantics) must see the full-schedule best, not the last periodic
        # snapshot 10k iterations earlier
        save_checkpoint(ckpt_path, ts, extra={"next_iter": p1})

    best = restore_best(ts)
    history = {k: jnp.concatenate(v) for k, v in history.items()}
    return FitResult(state=best, best_psnr=float(ts.best_psnr),
                     best_iter=int(ts.best_iter), train_time=train_time,
                     history=history)


# module-level so the trace/compile caches persist across images in sweeps
@jax.jit
def _eval_metrics(a, b):
    return psnr_fn(a, b), ms_ssim(a, b)


def evaluate(state: GaussianState, gt: jax.Array, cfg: GaussianConfig,
             n_renders: int = 100, fast: bool = False,
             lpips_weights: Optional[str] = None) -> dict:
    """Reference eval protocol (train.py:178-191): n timed renders + metrics.

    The n renders run as ONE in-graph chained ``lax.scan`` per timing call
    (each render's input depends on the previous output so the runtime
    can't coalesce them), timed with the two-length marginal protocol —
    per-dispatch overhead through the remote relay is 0.1-3.4 s, so the
    reference's 100-individual-dispatch loop costs ~60 s/image of pure
    dispatch in sweeps and times the relay, not the render.

    ``fast=True`` uses the dense binning-free forward kernel (TPU only).
    ``lpips_weights``: path to an LPIPS-VGG weight .npz (train/lpips.py);
    when given, the returned dict gains an ``lpips`` entry
    (models/metrics.py:62-95 protocol). Timing sync is a host fetch
    (reliable on remote runtimes).
    """
    import numpy as _np

    if fast and jax.default_backend() == "tpu":
        from ..models.gaussian_image import render_fast as _render
    else:
        _render = render

    def render_scan_factory(n):
        @jax.jit
        def run(s, fb0):
            def body(fb, _):
                s2 = s.replace(params=s.params.replace(xyz=s.params.xyz + fb))
                img = _render(s2, cfg)
                return img[0, 0, 0] * 1e-7, None

            fb, _ = jax.lax.scan(body, fb0, None, length=n)
            s2 = s.replace(params=s.params.replace(xyz=s.params.xyz + fb))
            img = _render(s2, cfg)
            return img, img[0, 0, 0] * 1e-7

        return run

    n_small = max(1, n_renders // 5)
    times = {}
    fb_seed = 0.0
    out = None
    for n in ((n_small, n_renders) if n_renders > n_small else (n_renders,)):
        f = render_scan_factory(n)
        out, fb = f(state, jnp.zeros(()))          # compile + warm
        _ = _np.asarray(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out, fb = f(state, jnp.asarray(fb_seed))
            _ = _np.asarray(out)
            best = min(best, time.perf_counter() - t0)
            fb_seed += 1e-9
        times[n] = best
    if n_renders > n_small:
        delta = times[n_renders] - times[n_small]
        dt = (delta / (n_renders - n_small) if delta > 0.005
              else times[n_renders] / (n_renders + 1))
    else:
        dt = times[n_renders] / (n_renders + 1)
    gt = jnp.asarray(gt)
    psnr_v, msssim_v = _eval_metrics(out, gt)
    result = {
        "psnr": float(psnr_v),
        "ms_ssim": float(msssim_v),
        "eval_time": dt,
        "fps": 1.0 / dt,
        "num_points": int(state.num_active),
    }
    if lpips_weights is not None:
        from .lpips import lpips, params_from_npz

        result["lpips"] = float(lpips(out, gt, params_from_npz(lpips_weights)))
    return result
