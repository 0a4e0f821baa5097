"""GaussianImage model: parameter state, forward render, growth and pruning.

TPU-native redesign of the reference ``GaussianImage_Covariance``
(models/gaussianimage_covariance.py:16-509). The reference mutates tensor
*lengths* during training (densification concatenates rows, pruning drops
them, with live surgery on the Adam state,
models/gaussianimage_covariance.py:261-352). That is unusable under XLA's
static-shape compilation model, so here:

- every per-Gaussian buffer is allocated at ``max_num_points`` once;
- an ``active`` boolean mask replaces row insertion/removal;
- growth writes attributes into free slots and zeroes the optimizer moments
  there (the moral equivalent of ``cat_tensors_to_optimizer`` zero-padding
  exp_avg/exp_avg_sq, :269-272);
- pruning just clears mask bits (``_prune_optimizer``'s row filtering, :336-352,
  becomes a no-op: inactive rows produce exactly zero gradient, so their
  moments stay frozen and are re-zeroed on slot reuse);
- the SLV low-pass bound is a per-row buffer frozen at activation time with
  the value ``min(H*W / (9*pi*N_active), 300)`` at that moment
  (:63-69, :327-332) — N_active is a traced scalar, not a shape.

The whole train step, including grow/prune, is jit-compatible with zero host
syncs.

Parameterizations: ``covariance`` (ACTIVE path), ``cholesky``, ``scale_rot``
mirror the three reference model classes (gaussianimage_covariance.py /
gaussianimage_cholesky.py / gaussianimage_rs.py); only covariance runs
end-to-end in the reference, all three run here.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..core.gaussian2d import (
    BLOCK_H,
    BLOCK_W,
    Projected,
    cholesky_to_cov2d,
    project_gaussians_2d_covariance,
    psd_valid_mask,
    scale_rot_to_cov2d,
    slv_bound,
)
from ..core.binning import bin_gaussians
from ..core.render_tiled import rasterize_tiled


@struct.dataclass
class GaussianConfig:
    """Static model/rendering configuration (hashable, baked into jit)."""

    H: int = struct.field(pytree_node=False, default=512)
    W: int = struct.field(pytree_node=False, default=768)
    max_num_points: int = struct.field(pytree_node=False, default=5000)
    param: str = struct.field(pytree_node=False, default="covariance")
    slv: bool = struct.field(pytree_node=False, default=True)
    color_norm: bool = struct.field(pytree_node=False, default=False)
    clip_coe: float = struct.field(pytree_node=False, default=3.0)
    radius_clip: float = struct.field(pytree_node=False, default=1.0)
    tile_cap: int = struct.field(pytree_node=False, default=256)
    block_h: int = struct.field(pytree_node=False, default=BLOCK_H)
    block_w: int = struct.field(pytree_node=False, default=BLOCK_W)
    # 'auto' = flat top_k at Kodak scale, two-level 'hier' for large grids
    bin_method: str = struct.field(pytree_node=False, default="auto")
    # static per-Gaussian tile budget for the backward's inverse-map gradient
    # gather (kernels/raster_pallas._gather_grads); exact — falls back to the
    # scatter path in-graph whenever any bbox exceeds it. 0 (default) = the
    # occupancy-adaptive scatter, which measured faster on v5e (TPU XLA
    # scalar gathers serialize; see EXPERIMENTS.md round-3 A/B).
    grad_gather_tiles: int = struct.field(pytree_node=False, default=0)
    # rasterizer backend: 'pallas' (fused binned TPU kernels), 'xla'
    # (pure-JAX tiled path), 'dense'/'sweep'/'list'/'list_t' (the cap-free
    # chunk-family kernels), or 'auto' — resolved by ``resolve_backend``:
    # lane-major chunk-list ('list_t') on TPU when the tile grid divides its
    # tile-block size (measured -29% step time at Kodak, -41% at 2K vs
    # binned, r5_perf 2026-08-20), binned 'pallas' otherwise, 'xla' off-TPU.
    raster_backend: str = struct.field(pytree_node=False, default="auto")
    # PSD handling: 'prune' = reference behavior (drop non-PSD points,
    # non_semi_definite_prune); 'clamp' = quality mode — project the effective
    # covariance back onto the PSD cone after each update, so no capacity is
    # ever destroyed (the reference's churn removes up to half the points).
    psd_mode: str = struct.field(pytree_node=False, default="prune")


@struct.dataclass
class GaussianParams:
    """Learnable per-Gaussian attributes, [max_num_points, ...].

    ``cov2d`` holds the raw parameter; the effective covariance adds the
    per-row bound (get_cov2d_elements, gaussianimage_covariance.py:168-169).
    For param='cholesky' the 3 columns are (l11, l21, l22); for 'scale_rot'
    cov2d[:, :2] are scales and cov2d[:, 2] the rotation angle.
    """

    xyz: jax.Array       # [M, 2]
    cov2d: jax.Array     # [M, 3]
    features: jax.Array  # [M, 3]


@struct.dataclass
class GaussianState:
    params: GaussianParams
    active: jax.Array      # [M] bool
    bound: jax.Array       # [M, 3] per-row covariance floor (SLV rows or 0.5 default)
    num_active: jax.Array  # [] int32


def init_state(cfg: GaussianConfig, num_points: int, key: jax.Array) -> GaussianState:
    """Random init matching gaussianimage_covariance.py:52-69.

    xy ~ U(0,W) x U(0,H); cov2d ~ U(0,1)^3; colors zero; first ``num_points``
    slots active; SLV rows = low_pass(num_points) (or the constant
    [0.5, 0, 0.5] when SLV is off, :69).
    """
    M = cfg.max_num_points
    k1, k2 = jax.random.split(key)
    w_init = jax.random.uniform(k1, (M, 1)) * cfg.W
    h_init = jax.random.uniform(jax.random.fold_in(k1, 1), (M, 1)) * cfg.H
    xyz = jnp.concatenate([w_init, h_init], axis=1)
    cov2d = jax.random.uniform(k2, (M, 3))
    features = jnp.zeros((M, 3))
    active = jnp.arange(M) < num_points
    if cfg.slv:
        lp = slv_bound(cfg.H, cfg.W, num_points)
        bound = jnp.tile(jnp.stack([lp, jnp.zeros_like(lp), lp])[None, :], (M, 1))
    else:
        bound = jnp.tile(jnp.array([[0.5, 0.0, 0.5]]), (M, 1))
    return GaussianState(
        params=GaussianParams(xyz=xyz, cov2d=cov2d, features=features),
        active=active,
        bound=bound,
        num_active=jnp.asarray(num_points, jnp.int32),
    )


def effective_cov2d(params: GaussianParams, bound: jax.Array, cfg: GaussianConfig) -> jax.Array:
    """Covariance actually rendered, per parameterization.

    covariance: raw + per-row bound (gaussianimage_covariance.py:168-169).
    cholesky:  L L^T from raw params + bound added to the *cholesky* elements
               first (gaussianimage_cholesky.py adds its bound to L elements).
    scale_rot: Sigma = (R S)(R S)^T.
    """
    if cfg.param == "covariance":
        return params.cov2d + bound
    if cfg.param == "cholesky":
        return cholesky_to_cov2d(params.cov2d + bound)
    if cfg.param == "scale_rot":
        return scale_rot_to_cov2d(jnp.abs(params.cov2d[:, :2]) + 0.3,
                                  jax.nn.sigmoid(params.cov2d[:, 2]) * 2.0 * math.pi)
    raise ValueError(f"unknown parameterization {cfg.param!r}")


def colors_of(params: GaussianParams, cfg: GaussianConfig) -> jax.Array:
    """color activation: sigmoid iff color_norm (gaussianimage_covariance.py:74)."""
    return jax.nn.sigmoid(params.features) if cfg.color_norm else params.features


def means_of(params: GaussianParams, cfg: GaussianConfig) -> jax.Array:
    """coords activation is identity in the active path (:55)."""
    if cfg.param == "cholesky":
        # legacy model keeps means in atanh space -> tanh to [-1,1] -> pixels
        xy = jnp.tanh(params.xyz)
        return jnp.stack([0.5 * cfg.W * xy[:, 0] + 0.5 * cfg.W,
                          0.5 * cfg.H * xy[:, 1] + 0.5 * cfg.H], axis=-1)
    return params.xyz


def project(params: GaussianParams, state_active: jax.Array, bound: jax.Array,
            cfg: GaussianConfig,
            cov_override: Optional[jax.Array] = None,
            means_override: Optional[jax.Array] = None) -> Projected:
    cov = cov_override if cov_override is not None else effective_cov2d(params, bound, cfg)
    means = means_override if means_override is not None else means_of(params, cfg)
    proj = project_gaussians_2d_covariance(means, cov, cfg.H, cfg.W,
                                           clip_coe=cfg.clip_coe,
                                           radius_clip=cfg.radius_clip)
    # inactive slots are culled exactly like reference-pruned rows
    valid = proj.valid & state_active
    return proj._replace(valid=valid,
                         radii=jnp.where(valid, proj.radii, 0),
                         num_tiles_hit=jnp.where(valid, proj.num_tiles_hit, 0))


def resolve_backend(cfg: GaussianConfig) -> str:
    """Resolve ``raster_backend='auto'`` to a concrete backend (static,
    trace-time decision — shapes and platform are compile-time constants).

    On TPU: the lane-major chunk-list pair ('list_t') whenever the tile
    grid divides its tile-block size — it beat the binned pair at every
    measured point (Kodak 7.31 vs 10.32 ms/step, 2K 51.5 vs 87.9;
    results/r5_perf.jsonl) with bitwise-identical 600-step quality.
    Falls back to the binned 'pallas' kernels for odd tile grids (the
    list kernels then run tbs=1 and lose their streaming advantage), and
    to the tiled XLA path off-TPU (CPU interpret-mode Pallas is test-only).
    """
    backend = cfg.raster_backend
    if backend != "auto":
        return backend
    if jax.default_backend() != "tpu":
        return "xla"
    from ..core.gaussian2d import tile_bounds_for
    from ..kernels.raster_list_pallas import TB_T
    tb_x, tb_y = tile_bounds_for(cfg.H, cfg.W, cfg.block_h, cfg.block_w)
    return "list_t" if (tb_x * tb_y) % TB_T == 0 else "pallas"


def render(state: GaussianState, cfg: GaussianConfig,
           cov_override: Optional[jax.Array] = None,
           means_override: Optional[jax.Array] = None,
           colors_override: Optional[jax.Array] = None) -> jax.Array:
    """Full forward pass -> [H, W, 3] clamped to [0, 1].

    Mirrors GaussianImage_Covariance.forward (gaussianimage_covariance.py:187-217)
    = project -> bin -> rasterize -> clamp. The ``*_override`` hooks are the
    entry points for the quantized forward (forward_quantize, :384-410).
    """
    proj = project(state.params, state.active, state.bound, cfg,
                   cov_override=cov_override, means_override=means_override)
    colors = colors_override if colors_override is not None else colors_of(state.params, cfg)
    opacity = jnp.ones((cfg.max_num_points,), proj.xys.dtype)  # fixed 1 (:58)
    backend = resolve_backend(cfg)
    if backend == "dense":
        # binning-free differentiable path (no per-tile cap; quality mode)
        from ..kernels.raster_dense_pallas import rasterize_dense
        img = rasterize_dense(proj.xys, proj.conics, colors, opacity,
                              proj.radii, proj.valid, cfg.H, cfg.W,
                              cfg.block_h, cfg.block_w)
        return jnp.clip(img, 0.0, 1.0)
    if backend == "sweep":
        # chunk-skip sweep fwd+bwd: no binning, no gather, no gradient
        # scatter (no per-tile cap; quality mode). Fastest when the stream
        # is Morton-kept (TrainConfig.resort_every / morton_perm).
        from ..kernels.raster_dense_pallas import rasterize_sweep
        img = rasterize_sweep(proj.xys, proj.conics, colors, opacity,
                              proj.radii, proj.valid, cfg.H, cfg.W,
                              cfg.block_h, cfg.block_w)
        return jnp.clip(img, 0.0, 1.0)
    if backend in ("list", "list_t"):
        # chunk-LIST fwd+bwd: per-tile member-chunk lists (tiny [T, N/kc]
        # top_k) + per-chunk tile-block gradient accumulation — selection
        # machinery and gradient scatter both gone (quality mode, cap-free).
        # 'list_t' = the lane-major kernel bodies. Fastest Morton-kept
        # (TrainConfig.resort_every / morton_perm).
        from ..kernels.raster_list_pallas import (rasterize_list,
                                                  rasterize_list_t)
        raster = rasterize_list_t if backend == "list_t" else rasterize_list
        img = raster(proj.xys, proj.conics, colors, opacity,
                     proj.radii, proj.valid, cfg.H, cfg.W,
                     cfg.block_h, cfg.block_w)
        return jnp.clip(img, 0.0, 1.0)
    if cfg.bin_method == "pallas":
        from ..kernels.binning_pallas import bin_gaussians_pallas
        bins = bin_gaussians_pallas(proj, cfg.H, cfg.W, cap=cfg.tile_cap,
                                    block_h=cfg.block_h, block_w=cfg.block_w)
    else:
        bins = bin_gaussians(proj, cfg.H, cfg.W, cap=cfg.tile_cap,
                             block_h=cfg.block_h, block_w=cfg.block_w,
                             method=cfg.bin_method)
    if backend == "pallas":
        from ..kernels.raster_pallas import rasterize_pallas
        img = rasterize_pallas(proj.xys, proj.conics, colors, opacity,
                               bins.ids, bins.mask, proj.radii, cfg.H, cfg.W,
                               cfg.block_h, cfg.block_w, cfg.grad_gather_tiles)
    else:
        img = rasterize_tiled(proj.xys, proj.conics, colors, opacity,
                              bins.ids, bins.mask, cfg.H, cfg.W,
                              cfg.block_h, cfg.block_w)
    return jnp.clip(img, 0.0, 1.0)


def prepare_render(state: GaussianState, cfg: GaussianConfig,
                   cov_override: Optional[jax.Array] = None,
                   means_override: Optional[jax.Array] = None,
                   colors_override: Optional[jax.Array] = None,
                   cap: Optional[int] = None):
    """Bin-once stage of the decode fast path: project + bin + gather into
    per-tile attribute blocks (kernels.raster_pallas.Prepared). For a static
    attribute set (a decoded bitstream, an eval snapshot) this runs once and
    ``render_prepared`` renders frames from it with zero per-frame binning.
    """
    from ..kernels.raster_pallas import prepare_raster

    proj = project(state.params, state.active, state.bound, cfg,
                   cov_override=cov_override, means_override=means_override)
    bins = bin_gaussians(proj, cfg.H, cfg.W, cap=cap or cfg.tile_cap,
                         block_h=cfg.block_h, block_w=cfg.block_w,
                         method="top_k" if cfg.bin_method == "pallas" else cfg.bin_method)
    colors = colors_override if colors_override is not None else colors_of(state.params, cfg)
    opacity = jnp.ones((cfg.max_num_points,), proj.xys.dtype)
    return prepare_raster(proj.xys, proj.conics, colors, opacity,
                          bins.ids, bins.mask, cfg.H, cfg.W,
                          cfg.block_h, cfg.block_w)


def render_prepared(prep, cfg: GaussianConfig,
                    tiles_per_step: Optional[int] = None) -> jax.Array:
    """Per-frame render from a prepared block table -> [H, W, 3] in [0, 1].

    Uses the flattened forward-only kernel (raster_flat_pallas) — the
    decode-FPS path."""
    from ..kernels.raster_flat_pallas import rasterize_prepared_flat

    img = rasterize_prepared_flat(prep, cfg.H, cfg.W, cfg.block_h, cfg.block_w,
                                  tiles_per_step=tiles_per_step or 16)
    return jnp.clip(img, 0.0, 1.0)


def get_attributes(state: GaussianState, cfg: GaussianConfig) -> dict:
    """Host-side export of the fitted attribute arrays (active rows only).

    Reference: GaussianImage_Covariance.get_attributes
    (gaussianimage_covariance.py:181-185).
    """
    import numpy as np

    active = np.asarray(state.active)
    return {
        "coords": np.asarray(means_of(state.params, cfg))[active],
        "covs": np.asarray(effective_cov2d(state.params, state.bound, cfg))[active],
        "colors": np.asarray(colors_of(state.params, cfg))[active],
    }


def psd_clamp(params: GaussianParams, bound: jax.Array,
              cfg: GaussianConfig, margin: float = 0.995,
              min_var: float = 1e-3) -> GaussianParams:
    """Project the covariance parameters so the effective covariance is PSD.

    Quality-mode alternative to the reference's destructive prune: clamps the
    effective variances to >= min_var and the off-diagonal to
    ``margin * sqrt(var_x * var_y)``. Only meaningful for the 'covariance'
    parameterization (cholesky/scale_rot are PSD by construction).
    """
    if cfg.param != "covariance":
        return params
    eff = params.cov2d + bound
    a = jnp.maximum(eff[:, 0], min_var)
    c = jnp.maximum(eff[:, 2], min_var)
    lim = margin * jnp.sqrt(a * c)
    b = jnp.clip(eff[:, 1], -lim, lim)
    new_eff = jnp.stack([a, b, c], axis=-1)
    return params.replace(cov2d=new_eff - bound)


def render_fast(state: GaussianState, cfg: GaussianConfig,
                cov_override: Optional[jax.Array] = None,
                means_override: Optional[jax.Array] = None,
                colors_override: Optional[jax.Array] = None,
                sweep=False) -> jax.Array:
    """Forward-only render via the dense binning-free Pallas kernel.

    The decode/eval fast path: identical blending math, NO per-tile cap
    (blends every bbox member — the quality-mode semantics; differs from the
    reference's capped rasterizer only in >cap-occupancy tiles). Falls back
    to the regular path off-TPU. ``sweep=True`` selects the chunk-skip
    variant, ``sweep='range'`` the chunk-range variant (both fastest with
    a Morton-ordered stream)."""
    proj = project(state.params, state.active, state.bound, cfg,
                   cov_override=cov_override, means_override=means_override)
    colors = colors_override if colors_override is not None else colors_of(state.params, cfg)
    opacity = jnp.ones((cfg.max_num_points,), proj.xys.dtype)
    if sweep == "range":
        from ..kernels.raster_dense_pallas import rasterize_range_pallas
        img = rasterize_range_pallas(proj, colors, opacity, cfg.H, cfg.W,
                                     cfg.block_h, cfg.block_w)
    elif sweep == "list":
        from ..kernels.raster_list_pallas import rasterize_list_pallas
        img = rasterize_list_pallas(proj, colors, opacity, cfg.H, cfg.W,
                                    cfg.block_h, cfg.block_w)
    elif sweep == "list_t":
        from ..kernels.raster_list_pallas import rasterize_list_t_pallas
        img = rasterize_list_t_pallas(proj, colors, opacity, cfg.H, cfg.W,
                                      cfg.block_h, cfg.block_w)
    elif sweep:
        from ..kernels.raster_dense_pallas import rasterize_sweep_pallas
        img = rasterize_sweep_pallas(proj, colors, opacity, cfg.H, cfg.W,
                                     cfg.block_h, cfg.block_w)
    else:
        from ..kernels.raster_dense_pallas import rasterize_dense_pallas
        img = rasterize_dense_pallas(proj, colors, opacity, cfg.H, cfg.W,
                                     cfg.block_h, cfg.block_w)
    return jnp.clip(img, 0.0, 1.0)


def psd_mask_effective(state: GaussianState, cfg: GaussianConfig) -> jax.Array:
    """PSD check on the *effective* covariance (check_non_semi_definite
    defaults to get_cov2d_elements, gaussianimage_covariance.py:373-378)."""
    return psd_valid_mask(effective_cov2d(state.params, state.bound, cfg))


def prune(state: GaussianState, cfg: GaussianConfig) -> Tuple[GaussianState, jax.Array]:
    """Deactivate non-PSD Gaussians (non_semi_definite_prune, :354-371).

    Keeps the reference's guard: skip the prune entirely if it would leave
    zero points (:357). Returns (new_state, num_pruned).
    """
    ok = psd_mask_effective(state, cfg)
    new_active = state.active & ok
    n_new = jnp.sum(new_active, dtype=jnp.int32)
    do = n_new > 0
    active = jnp.where(do, new_active, state.active)
    num_active = jnp.where(do, n_new, state.num_active)
    pruned = state.num_active - num_active
    return state.replace(active=active, num_active=num_active), pruned


def grow(state: GaussianState, cfg: GaussianConfig, render_img: jax.Array,
         gt_image: jax.Array, key: jax.Array, final_fill: jax.Array,
         base_num_samples: int = 1000) -> Tuple[GaussianState, jax.Array, jax.Array]:
    """Error-guided densification under static shapes.

    Reference flow (train.py:85-118 + densification_postfix :307-334):
      errors = |render - gt| summed over channels; top-k error pixels become
      new points at those integer pixel coords with color 0 and
      cov = U(0,1)^3 + [0.5, 0, 0.5]; candidates whose raw cov is not PSD are
      rejected; k = min(1000, max - cur), or (max - cur) at the final grow.

    Static-shape version: always take ``max_num_points`` top-error pixels,
    build that many candidates, then activate the first ``n_add`` PSD-valid
    ones into the lowest-index free slots. ``final_fill`` (traced bool) lifts
    the 1000 cap. Returns (state, n_added, new_slot_mask) — the caller must
    zero optimizer moments at ``new_slot_mask`` (cat_tensors_to_optimizer
    zero-padding, :269-272).
    """
    M = cfg.max_num_points
    free = M - state.num_active
    n_add = jnp.where(final_fill, free, jnp.minimum(base_num_samples, free))

    errors = jnp.sum(jnp.abs(render_img - gt_image), axis=-1)  # [H, W]
    _, top_idx = jax.lax.top_k(errors.reshape(-1), M)
    cand_y = (top_idx // cfg.W).astype(jnp.float32)
    cand_x = (top_idx % cfg.W).astype(jnp.float32)
    cand_xy = jnp.stack([cand_x, cand_y], axis=-1)                  # [M, 2]
    cand_cov = jax.random.uniform(key, (M, 3)) + jnp.array([0.5, 0.0, 0.5])
    # reference rejects candidates whose RAW cov is non-PSD (:309)
    cand_rank = jnp.arange(M)
    cand_ok = psd_valid_mask(cand_cov) & (cand_rank < n_add)
    n_added = jnp.sum(cand_ok, dtype=jnp.int32)

    # compact accepted candidates to the front (stable order)
    order = jnp.argsort(~cand_ok, stable=True)
    cxy = cand_xy[order]
    ccov = cand_cov[order]

    # lowest-index free slots, compacted to the front
    slot_order = jnp.argsort(state.active, stable=True)  # False (free) first
    take = jnp.arange(M) < n_added
    # scatter candidate i -> slot slot_order[i] for i < n_added
    dest = slot_order
    upd_mask = take[:, None]

    def scatter_rows(buf, rows, upd_mask):
        return buf.at[dest].set(jnp.where(upd_mask, rows, buf[dest]))

    params = state.params
    new_xyz = scatter_rows(params.xyz, cxy, upd_mask)
    new_cov = scatter_rows(params.cov2d, ccov, upd_mask)
    new_feat = scatter_rows(params.features, jnp.zeros((M, 3)), upd_mask)
    new_active = state.active.at[dest].set(jnp.where(take, True, state.active[dest]))
    num_active = state.num_active + n_added

    # SLV rows for the newcomers use the post-growth count (:322 then :328)
    if cfg.slv:
        lp = slv_bound(cfg.H, cfg.W, num_active)
        new_rows = jnp.stack([lp, jnp.zeros_like(lp), lp])[None, :].repeat(M, 0)
        bound = scatter_rows(state.bound, new_rows, upd_mask)
    else:
        bound = state.bound

    new_slot_mask = jnp.zeros((M,), bool).at[dest].set(take)
    new_state = state.replace(
        params=GaussianParams(xyz=new_xyz, cov2d=new_cov, features=new_feat),
        active=new_active, bound=bound, num_active=num_active)
    return new_state, n_added, new_slot_mask
