"""Real spherical harmonics evaluation, degrees 0..4.

Reference: gsplat/gsplat/sh.py:36-97 (custom Function -> CUDA
``compute_sh_forward/backward_kernel``, sh.cuh:212-254) and the pure-torch
port in models/utils.py:151-206 (eval_sh). Same hard-coded real-SH constants;
plain JAX autodiff supplies the backward (the CUDA backward is just the
transpose of this linear map — the reference's test_sh.py checks exactly
that).

Layout: coeffs [N, K, 3] with K = (deg+1)^2 bases; viewdirs [N, 3]
(not necessarily normalized — the reference normalizes inside).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# f32-accurate matmuls (MXU default rounds to bf16; see kernels/raster_pallas.py)
from .precision import MM_PRECISION  # single policy home

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)
C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
      -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
      0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def num_sh_bases(degree: int) -> int:
    """(degree+1)^2 — gsplat/gsplat/sh.py num_sh_bases."""
    return (degree + 1) ** 2


def eval_sh_bases(degree: int, dirs: jax.Array) -> jax.Array:
    """[N, K] basis values for unit directions (models/utils.py:151-206)."""
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    one = jnp.ones_like(x)
    out = [C0 * one]
    if degree >= 1:
        out += [-C1 * y, C1 * z, -C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
                C2[3] * xz, C2[4] * (xx - yy)]
    if degree >= 3:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [C3[0] * y * (3 * xx - yy), C3[1] * xy * z,
                C3[2] * y * (4 * zz - xx - yy),
                C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                C3[4] * x * (4 * zz - xx - yy),
                C3[5] * z * (xx - yy), C3[6] * x * (xx - 3 * yy)]
    if degree >= 4:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [C4[0] * xy * (xx - yy), C4[1] * yz * (3 * xx - yy),
                C4[2] * xy * (7 * zz - 1), C4[3] * yz * (7 * zz - 3),
                C4[4] * (zz * (35 * zz - 30) + 3),
                C4[5] * xz * (7 * zz - 3), C4[6] * (xx - yy) * (7 * zz - 1),
                C4[7] * xz * (xx - 3 * yy),
                C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))]
    return jnp.stack(out, axis=-1)


def spherical_harmonics(degree: int, viewdirs: jax.Array,
                        coeffs: jax.Array) -> jax.Array:
    """SH color eval: [N, K, 3] coeffs x normalized view dirs -> [N, 3].

    gsplat normalizes dirs inside the kernel (sh.cuh bases) — reproduced here.
    """
    dirs = viewdirs / jnp.maximum(
        jnp.linalg.norm(viewdirs, axis=-1, keepdims=True), 1e-12)
    bases = eval_sh_bases(degree, dirs)                    # [N, K]
    k = num_sh_bases(degree)
    return jnp.einsum("nk,nkc->nc", bases, coeffs[:, :k, :], precision=MM_PRECISION)
