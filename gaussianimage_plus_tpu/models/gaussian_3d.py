"""Legacy 3D Gaussian splatting image model (Gaussian3D).

Reference: models/gaussiansplatting_3d.py:28-194 — full 3DGS machinery bent
to 2D image fitting: points in [-1,1]^3, log-scale + quaternion covariances,
logit opacity (init 0.1), SH colors (dc random + rest zero), fixed camera
looking down +z at distance 8 with fov_x = pi/2, alpha-composited rendering
against a white background. Training is plain Adam/Adan + StepLR (no
grow/prune).

Everything is static-shape pure JAX: projection/compositing reuse
core/project3d.py and core/render_alpha.py.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..core.project3d import project_gaussians_3d
from ..core.render_alpha import depth_order_projection, rasterize_alpha_tiled
from ..core.sh import num_sh_bases, spherical_harmonics
from ..train.losses import loss_fn
from ..train.metrics import psnr as psnr_fn


@struct.dataclass
class Gaussian3DConfig:
    H: int = struct.field(pytree_node=False, default=512)
    W: int = struct.field(pytree_node=False, default=768)
    num_points: int = struct.field(pytree_node=False, default=5000)
    sh_degree: int = struct.field(pytree_node=False, default=3)
    tile_cap: int = struct.field(pytree_node=False, default=256)
    camera_z: float = struct.field(pytree_node=False, default=8.0)


@struct.dataclass
class Gaussian3DParams:
    xyz: jax.Array        # [N, 3] in [-1, 1]
    scaling: jax.Array    # [N, 3] log-scales
    rotation: jax.Array   # [N, 4] quaternions
    opacity: jax.Array    # [N, 1] logits
    features_dc: jax.Array    # [N, 1, 3]
    features_rest: jax.Array  # [N, K-1, 3]


def random_quats(key: jax.Array, n: int) -> jax.Array:
    """Uniform random rotations (random_quat_tensor,
    gaussiansplatting_3d.py:11-26)."""
    u, v, w = jnp.split(jax.random.uniform(key, (n, 3)), 3, axis=1)
    return jnp.concatenate([
        jnp.sqrt(1 - u) * jnp.sin(2 * math.pi * v),
        jnp.sqrt(1 - u) * jnp.cos(2 * math.pi * v),
        jnp.sqrt(u) * jnp.sin(2 * math.pi * w),
        jnp.sqrt(u) * jnp.cos(2 * math.pi * w),
    ], axis=1)


def init_params_3d(cfg: Gaussian3DConfig, key: jax.Array) -> Gaussian3DParams:
    """gaussiansplatting_3d.py:56-69: xyz uniform in [-1,1]^3; scales from
    mean 3-NN distance; opacity logit(0.1); dc random, rest zero."""
    n = cfg.num_points
    k1, k2, k3 = jax.random.split(key, 3)
    xyz = 2.0 * (jax.random.uniform(k1, (n, 3)) - 0.5)
    # mean distance of 3 nearest neighbors (k_nearest_sklearn equivalent)
    d2 = jnp.sum((xyz[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
    d2 = d2 + jnp.eye(n) * 1e9
    knn = jnp.sort(d2, axis=1)[:, :3]
    avg_dist = jnp.mean(jnp.sqrt(jnp.maximum(knn, 1e-12)), axis=1, keepdims=True)
    scaling = jnp.log(jnp.tile(avg_dist, (1, 3)))
    opacity = jnp.full((n, 1), math.log(0.1 / 0.9))  # logit(0.1)
    dim_sh = num_sh_bases(cfg.sh_degree)
    features_dc = jax.random.uniform(k2, (n, 1, 3))
    features_rest = jnp.zeros((n, dim_sh - 1, 3))
    return Gaussian3DParams(xyz=xyz, scaling=scaling,
                            rotation=random_quats(k3, n), opacity=opacity,
                            features_dc=features_dc, features_rest=features_rest)


def camera(cfg: Gaussian3DConfig):
    """Fixed camera: identity rotation, translation z=+8, fov_x = pi/2
    (gaussiansplatting_3d.py:73-84)."""
    focal = 0.5 * cfg.W / math.tan(0.5 * math.pi / 2.0)
    viewmat = jnp.array([[1.0, 0, 0, 0],
                         [0, 1.0, 0, 0],
                         [0, 0, 1.0, cfg.camera_z],
                         [0, 0, 0, 1.0]])
    return viewmat, focal


def render_3d(params: Gaussian3DParams, cfg: Gaussian3DConfig,
              background: jax.Array = None) -> jax.Array:
    """Gaussian3D.forward (gaussiansplatting_3d.py:117-140): project -> SH
    colors from the camera-relative view directions -> sigmoid -> alpha
    compositing -> [H, W, 3]."""
    viewmat, focal = camera(cfg)
    p3 = project_gaussians_3d(
        params.xyz, jnp.exp(params.scaling), 1.0, params.rotation, viewmat,
        focal, focal, cfg.W / 2.0, cfg.H / 2.0, cfg.H, cfg.W)
    # view dirs: from camera center (0,0,-z in world) to each point
    cam_pos = jnp.array([0.0, 0.0, -cfg.camera_z])
    viewdirs = params.xyz - cam_pos[None, :]
    coeffs = jnp.concatenate([params.features_dc, params.features_rest], axis=1)
    colors = jax.nn.sigmoid(spherical_harmonics(cfg.sh_degree, viewdirs, coeffs))
    opac = jax.nn.sigmoid(params.opacity).reshape(-1)
    proj_sorted, order = depth_order_projection(p3.proj, p3.depths)
    img = rasterize_alpha_tiled(proj_sorted, colors[order], opac[order],
                                cfg.H, cfg.W, background=background,
                                tile_cap=cfg.tile_cap)
    return jnp.clip(img, 0.0, 1.0)


def fit_image_3d(gt, cfg: Gaussian3DConfig, iterations: int = 2000,
                 lr: float = 0.01, loss_type: str = "Fusion2",
                 seed: int = 3047, opt: str = "adam"):
    """Minimal 3D training loop (SimpleTrainer with model_name=3DGS remaps to
    lr=0.001/adan in the reference, train.py:256-262; both optimizers are
    supported here)."""
    gt = jnp.asarray(gt)
    params = init_params_3d(cfg, jax.random.PRNGKey(seed))
    if opt == "adan":
        from ..train.optim import adan
        tx = adan(lambda c: lr * 0.5 ** (c // 20000))
    else:
        tx = optax.adam(lambda c: lr * 0.5 ** (c // 20000))
    opt_state = tx.init(params)

    @jax.jit
    def step(carry, gt):
        params, opt_state = carry
        def obj(p):
            img = render_3d(p, cfg)
            return loss_fn(img, gt, loss_type), img
        (l, img), g = jax.value_and_grad(obj, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, upd)
        return (params, opt_state), (l, psnr_fn(img, gt))

    carry = (params, opt_state)
    metrics = None
    for _ in range(iterations):
        carry, metrics = step(carry, gt)
    params, _ = carry
    return params, {"loss": float(metrics[0]), "psnr": float(metrics[1])}
