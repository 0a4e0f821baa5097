"""Core 2D Gaussian math: parameterizations, conic/radius bounds, culling, SLV bound.

TPU-native re-design of the per-Gaussian projection stage of GaussianImage++.
Everything here is vectorized pure JAX (no kernels needed: the projection is
O(N) elementwise work), with semantics matching the reference CUDA kernels:

- ``compute_cov2d_bounds``: reference ``gsplat/gsplat/cuda/csrc/helpers.cuh:179-206``
  (adjugate inverse, eigenvalue floor 0.1, ``ceil(clip_coe * sqrt(eig))`` radii).
- ``project_gaussians_2d_covariance``: reference
  ``gsplat/gsplat/cuda/csrc/foward2d.cu:192-288`` (covariance passed through
  directly; cull on zero determinant, minor radius < radius_clip, empty tile
  bbox) and its hand-written VJP ``backward2d.cu:157-214`` (``v_cov2d = -X G X``
  via ``cov2d_to_conic_vjp`` helpers.cuh:384-395; ``v_mean = v_xy``; grads
  zeroed for culled points).
- Cholesky / scale-rot parameterizations: reference ``foward2d.cu:12-69`` and
  ``foward2d.cu:71-187`` — expressed as pure functions composed in front of the
  covariance path and differentiated by JAX autodiff (the reference's
  hand-written chain rules, ``backward2d.cu:8-51`` and ``:53-154``, are exactly
  the autodiff of these 2x2 formulas).
- SLV low-pass bound: reference ``models/gaussianimage_covariance.py:63-69``.
- PSD validity mask: reference ``models/gaussianimage_covariance.py:373-382``.

Unlike the reference, culled Gaussians are represented with a boolean
``valid`` mask instead of ``radii == 0`` sentinels, keeping every shape static
for XLA. NaN eigenvalues (indefinite covariance) are mapped to ``valid=False``
rather than undefined float->int casts.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# Reference tile size: gsplat/gsplat/cuda/csrc/config.h:1-3 (BLOCK_X=BLOCK_Y=16).
BLOCK_W = 16
BLOCK_H = 16

# Reference alpha cutoff 1/255: forward.cu:662 (`alpha < 1.f / 255.f`).
ALPHA_THRESHOLD = 1.0 / 255.0

# Reference eigenvalue discriminant floor: helpers.cuh:196 (`max(0.1f, b*b - det)`).
EIGEN_DISCRIMINANT_FLOOR = 0.1


class Projected(NamedTuple):
    """Per-Gaussian screen-space quantities produced by projection.

    Mirrors the reference 5-tuple ``(xys, depths, radii, conics,
    num_tiles_hit)`` (project_gaussians_2d_covariance.py:113) minus ``depths``
    (identically zero in the 2D pipeline, foward2d.cu:218) plus an explicit
    ``valid`` mask replacing the ``radii == 0`` culling sentinel.
    """

    xys: jax.Array        # [N, 2] pixel-space centers
    conics: jax.Array     # [N, 3] inverse covariance (upper triangular)
    radii: jax.Array      # [N] int32 major-axis bounding radius (pixels)
    num_tiles_hit: jax.Array  # [N] int32 tile bbox area
    valid: jax.Array      # [N] bool — survives all culling tests


def tile_bounds_for(H: int, W: int, block_h: int = BLOCK_H, block_w: int = BLOCK_W) -> Tuple[int, int]:
    """(tiles_x, tiles_y) grid covering a HxW image.

    Reference: models/gaussianimage_covariance.py:24-28.
    """
    return (-(-W // block_w), -(-H // block_h))


def slv_bound(H: int, W: int, num_points) -> jax.Array:
    """Scalar SLV low-pass variance floor ``min(H*W / (9*pi*N), 300)``.

    Added to the two variance channels of every Gaussian's covariance.
    Reference: models/gaussianimage_covariance.py:64 and :328.
    ``num_points`` may be a traced scalar (current active count), which is the
    key to keeping growth/prune jit-compatible.
    """
    n = jnp.asarray(num_points, jnp.float32)
    return jnp.minimum(H * W / (9.0 * math.pi * jnp.maximum(n, 1.0)), 300.0)


def psd_valid_mask(cov2d: jax.Array) -> jax.Array:
    """Positive-definiteness mask over packed covariances [N, 3].

    ``Sigma11*Sigma22 - Sigma12^2 > 0 and Sigma11 > 0 and Sigma22 > 0``.
    Reference: models/gaussianimage_covariance.py:377-378.
    """
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] ** 2
    return (det > 0) & (cov2d[:, 0] > 0) & (cov2d[:, 2] > 0)


def cholesky_to_cov2d(chol: jax.Array) -> jax.Array:
    """Packed covariance from lower-triangular elements [l11, l21, l22].

    ``Sigma = L L^T`` with ``L = [[l11, 0], [l21, l22]]`` giving
    ``(l11^2, l11*l21, l21^2 + l22^2)``.
    Reference Cholesky projection kernel: foward2d.cu:55-60
    (``cov2d = (l11*l11, l11*l21, l21*l21 + l22*l22)``).
    """
    l11, l21, l22 = chol[:, 0], chol[:, 1], chol[:, 2]
    return jnp.stack([l11 * l11, l11 * l21, l21 * l21 + l22 * l22], axis=-1)


def scale_rot_to_cov2d(scales: jax.Array, rotation: jax.Array) -> jax.Array:
    """Packed covariance from per-axis scales [N, 2] and angle [N] (radians).

    ``Sigma = (R S)(R S)^T`` with ``R = [[cos, -sin], [sin, cos]]`` and
    ``S = diag(scales)``. Reference scale-rot projection: foward2d.cu:157-164
    (``M = R * S; cov2d = M M^T``) built on ``rotmat2d``/``scale_to_mat2d``
    (helpers.cuh).
    """
    c, s = jnp.cos(rotation), jnp.sin(rotation)
    sx2 = scales[:, 0] ** 2
    sy2 = scales[:, 1] ** 2
    cov_xx = c * c * sx2 + s * s * sy2
    cov_xy = c * s * (sx2 - sy2)
    cov_yy = s * s * sx2 + c * c * sy2
    return jnp.stack([cov_xx, cov_xy, cov_yy], axis=-1)


def compute_cov2d_bounds(cov2d: jax.Array, clip_coe: float = 3.0):
    """Conic (inverse covariance) and bounding radii for packed covariances.

    Returns ``(conic [N,3], radius [N,2] float (major, minor), det_valid [N])``.

    Exact reference math (helpers.cuh:179-206):
      - ``det = xx*yy - xy^2``; invalid (culled) when ``det == 0``.
      - conic = adjugate / det.
      - eigenvalues ``v1,2 = b ± sqrt(max(0.1, b^2 - det))`` with
        ``b = (xx + yy)/2``.
      - ``radius = ceil(clip_coe * sqrt(eig))`` for each eigenvalue.

    Deviation: where the reference produces NaN radii for indefinite
    covariances (negative eigenvalues) and relies on undefined float->int
    casts, we clamp the eigenvalues to >= 0 before the sqrt so radii are
    finite; such Gaussians are culled by the minor-radius test downstream
    (minor radius 0 < radius_clip).
    """
    xx, xy, yy = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = xx * yy - xy * xy
    det_valid = det != 0.0
    inv_det = jnp.where(det_valid, 1.0 / jnp.where(det_valid, det, 1.0), 0.0)
    conic = jnp.stack([yy * inv_det, -xy * inv_det, xx * inv_det], axis=-1)

    b = 0.5 * (xx + yy)
    disc = jnp.sqrt(jnp.maximum(EIGEN_DISCRIMINANT_FLOOR, b * b - det))
    v1 = b + disc
    v2 = b - disc
    radius_major = jnp.ceil(clip_coe * jnp.sqrt(jnp.maximum(v1, 0.0)))
    radius_minor = jnp.ceil(clip_coe * jnp.sqrt(jnp.maximum(v2, 0.0)))
    radius = jnp.stack([radius_major, radius_minor], axis=-1)
    return conic, radius, det_valid


def tile_bbox(xys: jax.Array, radii: jax.Array, tile_bounds: Tuple[int, int],
              block_h: int = BLOCK_H, block_w: int = BLOCK_W):
    """Inclusive-min / exclusive-max tile bbox per Gaussian.

    Reference ``get_tile_bbox`` + ``get_bbox`` (helpers.cuh:16-49): the center
    and radius are mapped to tile units and clamped to the tile grid with
    ``min = clamp(int(c - r), 0, bounds)``, ``max = clamp(int(c + r + 1), 0,
    bounds)``. Note the reference truncates toward zero via C int casts; tile
    coordinates are non-negative after the clamp so floor == trunc for the
    values that survive, but the *pre-clamp* cast of a negative ``c - r``
    truncates toward 0 which coincides with the clamp to 0.
    """
    tb_x, tb_y = tile_bounds
    tile_cx = xys[:, 0] / block_w
    tile_cy = xys[:, 1] / block_h
    tile_rx = radii / block_w
    tile_ry = radii / block_h
    # int cast in C truncates toward zero; operands below are then clamped to
    # [0, bounds] so trunc/floor agree on every value that matters.
    xmin = jnp.clip(jnp.trunc(tile_cx - tile_rx).astype(jnp.int32), 0, tb_x)
    xmax = jnp.clip(jnp.trunc(tile_cx + tile_rx + 1.0).astype(jnp.int32), 0, tb_x)
    ymin = jnp.clip(jnp.trunc(tile_cy - tile_ry).astype(jnp.int32), 0, tb_y)
    ymax = jnp.clip(jnp.trunc(tile_cy + tile_ry + 1.0).astype(jnp.int32), 0, tb_y)
    return xmin, xmax, ymin, ymax


def _project_cov2d_fwd_impl(means2d: jax.Array, cov2d: jax.Array, H: int, W: int,
                            clip_coe: float, radius_clip: float):
    tb = tile_bounds_for(H, W)
    conic, radius, det_valid = compute_cov2d_bounds(cov2d, clip_coe)
    # Cull: minor radius below threshold (foward2d.cu:247-248).
    valid = det_valid & (radius[:, 1] >= radius_clip)
    radii = jnp.where(valid, radius[:, 0], 0.0).astype(jnp.int32)
    xmin, xmax, ymin, ymax = tile_bbox(means2d, radii.astype(jnp.float32), tb)
    tile_area = (xmax - xmin) * (ymax - ymin)
    # Cull: bbox fully outside the image (foward2d.cu:283-286).
    valid = valid & (tile_area > 0)
    radii = jnp.where(valid, radii, 0)
    num_tiles_hit = jnp.where(valid, tile_area, 0)
    return Projected(xys=means2d, conics=conic, radii=radii,
                     num_tiles_hit=num_tiles_hit, valid=valid)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _project_cov2d(means2d, cov2d, H, W, clip_coe, radius_clip):
    return _project_cov2d_fwd_impl(means2d, cov2d, H, W, clip_coe, radius_clip)


def _project_cov2d_fwd(means2d, cov2d, H, W, clip_coe, radius_clip):
    out = _project_cov2d_fwd_impl(means2d, cov2d, H, W, clip_coe, radius_clip)
    return out, (out.conics, out.valid)


def _project_cov2d_bwd(H, W, clip_coe, radius_clip, res, g: Projected):
    """Reference backward2d.cu:157-214.

    ``v_cov2d = -X G X`` with X = conic, G = symmetrized v_conic
    (cov2d_to_conic_vjp, helpers.cuh:384-395); off-diagonal contributions
    summed into the packed slot. ``v_mean = v_xy`` verbatim. Both zeroed for
    culled Gaussians (kernel early-returns when ``radii <= 0``).
    """
    conics, valid = res
    v_xy = g.xys
    v_conic = g.conics
    cx, cxy, cy = conics[:, 0], conics[:, 1], conics[:, 2]
    gx, gxy, gy = v_conic[:, 0], v_conic[:, 1], v_conic[:, 2]
    # X G X for symmetric 2x2 matrices X=[[cx,cxy],[cxy,cy]], G=[[gx,gxy],[gxy,gy]].
    m00 = cx * gx + cxy * gxy
    m01 = cx * gxy + cxy * gy
    m10 = cxy * gx + cy * gxy
    m11 = cxy * gxy + cy * gy
    s00 = m00 * cx + m01 * cxy
    s01 = m00 * cxy + m01 * cy
    s10 = m10 * cx + m11 * cxy
    s11 = m10 * cxy + m11 * cy
    v_cov2d = -jnp.stack([s00, s01 + s10, s11], axis=-1)
    vmask = valid[:, None]
    v_cov2d = jnp.where(vmask, v_cov2d, 0.0)
    v_mean2d = jnp.where(vmask, v_xy, 0.0)
    return (v_mean2d, v_cov2d)


_project_cov2d.defvjp(_project_cov2d_fwd, _project_cov2d_bwd)


def project_gaussians_2d_covariance(means2d: jax.Array, cov2d: jax.Array,
                                    H: int, W: int, clip_coe: float = 3.0,
                                    radius_clip: float = 1.0) -> Projected:
    """ACTIVE projection path: means already pixel-space, covariance direct.

    Reference binding: gsplat/gsplat/project_gaussians_2d_covariance.py:11-63,
    kernel foward2d.cu:192-288, VJP backward2d.cu:157-214. Differentiable in
    ``means2d`` and ``cov2d`` only (radii/num_tiles_hit/valid carry no
    gradient, matching the reference which returns None for them).
    """
    return _project_cov2d(means2d, cov2d, H, W, clip_coe, radius_clip)


def project_gaussians_2d_cholesky(means_ndc: jax.Array, chol: jax.Array,
                                  H: int, W: int, clip_coe: float = 3.0,
                                  radius_clip: float = 1.0) -> Projected:
    """Legacy Cholesky parameterization (#2).

    Means live in [-1, 1] and map to pixels via ``0.5 * size * x + 0.5 *
    size`` (foward2d.cu:40-41 commented form; the live line :37 uses the same
    ndc2pix convention the Cholesky kernel applies). Covariance from L L^T.
    JAX autodiff through these 2x2 formulas reproduces the reference's
    hand-written chain rule (backward2d.cu:8-51: ``v_l11 = 2 l11 G11 + 2 G12
    l21`` etc., and ``v_mean`` scaled by ``0.5 * img``).
    """
    center = jnp.stack([
        0.5 * W * means_ndc[:, 0] + 0.5 * W,
        0.5 * H * means_ndc[:, 1] + 0.5 * H,
    ], axis=-1)
    cov2d = cholesky_to_cov2d(chol)
    return _project_cov2d(center, cov2d, H, W, clip_coe, radius_clip)


def project_gaussians_2d_scale_rot(means2d: jax.Array, scales: jax.Array,
                                   rotation: jax.Array, H: int, W: int,
                                   clip_coe: float = 3.0,
                                   radius_clip: float = 1.0) -> Projected:
    """Legacy scale-rotation parameterization (#3).

    ``Sigma = (R S)(R S)^T`` (foward2d.cu:157-164); autodiff through the 2x2
    matrix products reproduces backward2d.cu:53-154.
    """
    cov2d = scale_rot_to_cov2d(scales, rotation)
    return _project_cov2d(means2d, cov2d, H, W, clip_coe, radius_clip)
