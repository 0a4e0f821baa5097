"""3D -> 2D EWA Gaussian projection (legacy 3DGS path).

Reference: ``project_gaussians`` (gsplat/gsplat/project_gaussians.py, CUDA
kernel forward.cu:12-103) and its pure-torch oracle
(_torch_impl.project_gaussians_forward): quaternion -> rotation, cov3d =
R S S R^T, EWA with the perspective Jacobian, the 0.3 screen-space blur
floor, pixel-center projection, z-culling against ``clip_thresh``. JAX
autodiff handles the backward (the reference hand-writes it in
backward.cu:1919-2105; these are plain 3x3 matrix products so autodiff
reproduces it).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .gaussian2d import Projected, compute_cov2d_bounds, tile_bbox, tile_bounds_for


class Projected3D(NamedTuple):
    proj: Projected
    depths: jax.Array     # [N] view-space z
    cov3d: jax.Array      # [N, 6] packed upper-triangular


def quat_to_rotmat(quats: jax.Array) -> jax.Array:
    """[N, 4] (w,x,y,z) -> [N, 3, 3], normalizing first (_torch_impl)."""
    q = quats / jnp.maximum(jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def scale_rot_to_cov3d(scales: jax.Array, glob_scale: float,
                       quats: jax.Array) -> jax.Array:
    """[N, 6] packed cov3d = (R S)(R S)^T (scale_rot_to_cov3d, _torch_impl)."""
    R = quat_to_rotmat(quats)                              # [N, 3, 3]
    M = R * (glob_scale * scales)[:, None, :]              # columns scaled
    C = jnp.einsum("nij,nkj->nik", M, M)                   # [N, 3, 3]
    return jnp.stack([C[:, 0, 0], C[:, 0, 1], C[:, 0, 2],
                      C[:, 1, 1], C[:, 1, 2], C[:, 2, 2]], axis=-1)


def project_cov3d_ewa(mean_view: jax.Array, cov3d: jax.Array, fx: float,
                      fy: float, tan_fovx: float, tan_fovy: float) -> jax.Array:
    """EWA: cov2d = J W Sigma W^T J^T + 0.3 I (project_cov3d_ewa,
    _torch_impl; forward.cu:60-77). ``mean_view`` is already view-space; the
    x/z, y/z terms are clamped to the frustum tangent bounds."""
    x, y, z = mean_view[:, 0], mean_view[:, 1], mean_view[:, 2]
    lim_x, lim_y = 1.3 * tan_fovx, 1.3 * tan_fovy
    tx = z * jnp.clip(x / z, -lim_x, lim_x)
    ty = z * jnp.clip(y / z, -lim_y, lim_y)
    zero = jnp.zeros_like(z)
    J = jnp.stack([
        jnp.stack([fx / z, zero, -fx * tx / (z * z)], -1),
        jnp.stack([zero, fy / z, -fy * ty / (z * z)], -1),
    ], axis=-2)                                            # [N, 2, 3]
    V = jnp.stack([
        jnp.stack([cov3d[:, 0], cov3d[:, 1], cov3d[:, 2]], -1),
        jnp.stack([cov3d[:, 1], cov3d[:, 3], cov3d[:, 4]], -1),
        jnp.stack([cov3d[:, 2], cov3d[:, 4], cov3d[:, 5]], -1),
    ], axis=-2)                                            # [N, 3, 3]
    cov2d = jnp.einsum("nij,njk,nlk->nil", J, V, J)        # [N, 2, 2]
    # screen-space blur floor (forward.cu:75: +0.3 on the diagonal)
    c00 = cov2d[:, 0, 0] + 0.3
    c11 = cov2d[:, 1, 1] + 0.3
    return jnp.stack([c00, cov2d[:, 0, 1], c11], axis=-1)


def project_gaussians_3d(means3d: jax.Array, scales: jax.Array,
                         glob_scale: float, quats: jax.Array,
                         viewmat: jax.Array, fx: float, fy: float,
                         cx: float, cy: float, H: int, W: int,
                         clip_thresh: float = 0.01,
                         clip_coe: float = 3.0) -> Projected3D:
    """Full 3DGS projection (project_gaussians binding + forward.cu:12-103)."""
    Rv = viewmat[:3, :3]
    Tv = viewmat[:3, 3]
    p_view = means3d @ Rv.T + Tv                           # [N, 3]
    z = p_view[:, 2]
    in_front = z >= clip_thresh
    zsafe = jnp.where(in_front, z, 1.0)
    p_view = p_view.at[:, 2].set(zsafe)

    cov3d = scale_rot_to_cov3d(scales, glob_scale, quats)
    tan_fovx = 0.5 * W / fx
    tan_fovy = 0.5 * H / fy
    cov2d = project_cov3d_ewa(p_view, cov3d, fx, fy, tan_fovx, tan_fovy)
    conic, radius, det_valid = compute_cov2d_bounds(cov2d, clip_coe)

    # pixel centers (project_pix: x/z * f + c)
    xys = jnp.stack([fx * p_view[:, 0] / zsafe + cx,
                     fy * p_view[:, 1] / zsafe + cy], axis=-1)

    valid = det_valid & in_front
    radii = jnp.where(valid, radius[:, 0], 0.0).astype(jnp.int32)
    tb = tile_bounds_for(H, W)
    xmin, xmax, ymin, ymax = tile_bbox(xys, radii.astype(jnp.float32), tb)
    area = (xmax - xmin) * (ymax - ymin)
    valid = valid & (area > 0)
    radii = jnp.where(valid, radii, 0)
    proj = Projected(xys=xys, conics=conic, radii=radii,
                     num_tiles_hit=jnp.where(valid, area, 0), valid=valid)
    return Projected3D(proj=proj, depths=jnp.where(valid, z, jnp.inf), cov3d=cov3d)
