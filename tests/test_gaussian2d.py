"""Unit tests for core 2D Gaussian math against hand-derived numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianimage_plus_tpu.core import (
    Projected,
    cholesky_to_cov2d,
    compute_cov2d_bounds,
    project_gaussians_2d_covariance,
    project_gaussians_2d_cholesky,
    project_gaussians_2d_scale_rot,
    psd_valid_mask,
    scale_rot_to_cov2d,
    slv_bound,
    tile_bbox,
    tile_bounds_for,
)


def random_cov2d(rng, n, psd_frac=0.8):
    """Mix of PSD and invalid covariances."""
    a = rng.uniform(0.3, 30.0, size=(n,))
    c = rng.uniform(0.3, 30.0, size=(n,))
    b = rng.uniform(-1.0, 1.0, size=(n,)) * np.sqrt(a * c) * 0.9
    cov = np.stack([a, b, c], axis=-1)
    flip = rng.uniform(size=n) > psd_frac
    cov[flip, 1] = np.sqrt(cov[flip, 0] * cov[flip, 2]) * 1.5  # indefinite
    return cov.astype(np.float32)


class TestCov2dBounds:
    def test_conic_is_inverse(self):
        rng = np.random.default_rng(0)
        cov = random_cov2d(rng, 256, psd_frac=1.0)
        conic, radius, ok = jax.jit(compute_cov2d_bounds)(jnp.asarray(cov))
        conic = np.asarray(conic)
        for i in range(0, 256, 17):
            S = np.array([[cov[i, 0], cov[i, 1]], [cov[i, 1], cov[i, 2]]])
            X = np.array([[conic[i, 0], conic[i, 1]], [conic[i, 1], conic[i, 2]]])
            np.testing.assert_allclose(S @ X, np.eye(2), atol=1e-4)

    def test_radius_formula(self):
        cov = jnp.array([[4.0, 0.0, 1.0]])  # eigvals 4, 1
        conic, radius, ok = compute_cov2d_bounds(cov, clip_coe=3.0)
        # b=2.5, det=4, disc=sqrt(max(0.1, 2.25))=1.5 -> v1=4, v2=1
        assert float(radius[0, 0]) == np.ceil(3.0 * 2.0)
        assert float(radius[0, 1]) == np.ceil(3.0 * 1.0)
        assert bool(ok[0])

    def test_eigen_floor(self):
        # b^2 - det < 0.1 -> disc floored at sqrt(0.1) (helpers.cuh:196)
        cov = jnp.array([[1.0, 0.0, 1.0]])  # b=1, det=1, b^2-det=0
        _, radius, _ = compute_cov2d_bounds(cov, clip_coe=3.0)
        v1 = 1.0 + np.sqrt(0.1)
        v2 = 1.0 - np.sqrt(0.1)
        assert float(radius[0, 0]) == np.ceil(3.0 * np.sqrt(v1))
        assert float(radius[0, 1]) == np.ceil(3.0 * np.sqrt(v2))

    def test_zero_det_invalid(self):
        cov = jnp.array([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0]])
        _, _, ok = compute_cov2d_bounds(cov)
        assert not bool(ok[0]) and not bool(ok[1])

    def test_indefinite_no_nan(self):
        cov = jnp.array([[-2.0, 0.0, -3.0]])  # negative definite, det=6
        conic, radius, ok = compute_cov2d_bounds(cov)
        assert bool(ok[0])  # det != 0 passes the reference's only test here
        assert np.all(np.isfinite(np.asarray(radius)))
        assert float(radius[0, 1]) == 0.0  # minor radius clamps to 0 -> culled later


class TestPSDMask:
    def test_matches_reference_rule(self):
        rng = np.random.default_rng(1)
        cov = random_cov2d(rng, 512, psd_frac=0.6)
        mask = np.asarray(psd_valid_mask(jnp.asarray(cov)))
        expected = (cov[:, 0] * cov[:, 2] - cov[:, 1] ** 2 > 0) & (cov[:, 0] > 0) & (cov[:, 2] > 0)
        np.testing.assert_array_equal(mask, expected)


class TestSLV:
    def test_formula(self):
        # models/gaussianimage_covariance.py:64
        v = float(slv_bound(512, 768, 2500))
        assert np.isclose(v, min(512 * 768 / (9 * np.pi * 2500), 300.0))
        assert float(slv_bound(4000, 4000, 10)) == 300.0


class TestParameterizations:
    def test_cholesky(self):
        chol = jnp.array([[2.0, 1.0, 3.0]])
        cov = np.asarray(cholesky_to_cov2d(chol))
        L = np.array([[2.0, 0.0], [1.0, 3.0]])
        S = L @ L.T
        np.testing.assert_allclose(cov[0], [S[0, 0], S[0, 1], S[1, 1]], rtol=1e-6)

    def test_scale_rot(self):
        scales = jnp.array([[2.0, 0.5]])
        theta = jnp.array([0.7])
        cov = np.asarray(scale_rot_to_cov2d(scales, theta))
        c, s = np.cos(0.7), np.sin(0.7)
        R = np.array([[c, -s], [s, c]])
        M = R @ np.diag([2.0, 0.5])
        S = M @ M.T
        np.testing.assert_allclose(cov[0], [S[0, 0], S[0, 1], S[1, 1]], rtol=1e-5, atol=1e-6)


class TestTileBbox:
    def test_against_loop_oracle(self):
        rng = np.random.default_rng(2)
        H, W = 96, 128
        tb = tile_bounds_for(H, W)
        n = 200
        xy = np.stack([rng.uniform(-30, W + 30, n), rng.uniform(-30, H + 30, n)], -1).astype(np.float32)
        radii = rng.integers(0, 60, n).astype(np.float32)
        xmin, xmax, ymin, ymax = (np.asarray(a) for a in tile_bbox(jnp.asarray(xy), jnp.asarray(radii), tb))
        for i in range(n):
            # helpers.cuh:26-29 with tile-space center/radius
            cx, cy = xy[i, 0] / 16.0, xy[i, 1] / 16.0
            rx, ry = radii[i] / 16.0, radii[i] / 16.0
            assert xmin[i] == min(max(0, int(cx - rx)), tb[0])
            assert xmax[i] == min(max(0, int(cx + rx + 1)), tb[0])
            assert ymin[i] == min(max(0, int(cy - ry)), tb[1])
            assert ymax[i] == min(max(0, int(cy + ry + 1)), tb[1])


class TestProjection:
    def _random_inputs(self, n=300, H=96, W=128, seed=3):
        rng = np.random.default_rng(seed)
        xy = np.stack([rng.uniform(0, W, n), rng.uniform(0, H, n)], -1).astype(np.float32)
        cov = random_cov2d(rng, n, psd_frac=0.85)
        return jnp.asarray(xy), jnp.asarray(cov), H, W

    def test_culling_consistency(self):
        xy, cov, H, W = self._random_inputs()
        proj = jax.jit(lambda a, b: project_gaussians_2d_covariance(a, b, H, W))(xy, cov)
        valid = np.asarray(proj.valid)
        radii = np.asarray(proj.radii)
        nth = np.asarray(proj.num_tiles_hit)
        assert np.all(radii[~valid] == 0)
        assert np.all(nth[~valid] == 0)
        assert np.all(radii[valid] > 0) or valid.sum() == 0
        assert np.all(nth[valid] > 0)
        conic, radius, ok = compute_cov2d_bounds(cov)
        # every valid point passed the minor-radius test (radius_clip=1.0)
        assert np.all(np.asarray(radius)[valid, 1] >= 1.0)

    def test_projection_grad_conic_vjp(self):
        """Hand-written -XGX VJP must equal autodiff under the reference's
        off-diagonal convention.

        The reference treats the packed off-diagonal cotangent as *per matrix
        element* (helpers.cuh:384-395 builds G with v_conic.y on BOTH
        off-diagonals and sums both off-diagonals of -XGX); its rasterizer
        backward compensates by emitting HALF the true packed off-diagonal
        cotangent (backward.cu:1313-1315). So the autodiff oracle here is the
        full-matrix loss w0*C00 + w1*(C01 + C10) + w2*C11 through a full 2x2
        matrix inverse.
        """
        xy, cov, H, W = self._random_inputs(n=64)
        rng = np.random.default_rng(4)
        weights = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))

        def via_custom(c):
            p = project_gaussians_2d_covariance(xy, c, H, W)
            return jnp.sum(jnp.where(p.valid[:, None], p.conics, 0.0) * weights)

        def via_autodiff(c):
            full = jnp.stack([
                jnp.stack([c[:, 0], c[:, 1]], -1),
                jnp.stack([c[:, 1], c[:, 2]], -1),
            ], -2)  # [N, 2, 2]
            inv = jnp.linalg.inv(full)
            w_full = jnp.stack([
                jnp.stack([weights[:, 0], weights[:, 1]], -1),
                jnp.stack([weights[:, 1], weights[:, 2]], -1),
            ], -2)
            p = project_gaussians_2d_covariance(xy, c, H, W)
            return jnp.sum(jnp.where(p.valid[:, None, None], w_full * inv, 0.0))

        g_custom = jax.grad(via_custom)(cov)
        g_auto = jax.grad(via_autodiff)(cov)
        np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto), rtol=2e-3, atol=1e-5)

    def test_mean_grad_identity(self):
        xy, cov, H, W = self._random_inputs(n=32)
        cot = jnp.ones((32, 2))

        def f(m):
            p = project_gaussians_2d_covariance(m, cov, H, W)
            return jnp.sum(p.xys * cot)

        g = np.asarray(jax.grad(f)(xy))
        valid = np.asarray(project_gaussians_2d_covariance(xy, cov, H, W).valid)
        np.testing.assert_allclose(g[valid], 1.0)
        np.testing.assert_allclose(g[~valid], 0.0)

    def test_cholesky_projection_grads(self):
        """Autodiff through L L^T must match the reference chain rule
        (backward2d.cu:8-51): v_l11 = 2*l11*G11 + l21*G12... expressed against
        the covariance-path gradient."""
        n, H, W = 16, 64, 64
        rng = np.random.default_rng(5)
        chol = jnp.asarray(np.stack([
            rng.uniform(1.0, 4.0, n), rng.uniform(-1.0, 1.0, n), rng.uniform(1.0, 4.0, n)
        ], -1).astype(np.float32))
        xy_ndc = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 2)).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))

        def f(ch):
            p = project_gaussians_2d_cholesky(xy_ndc, ch, H, W)
            return jnp.sum(jnp.where(p.valid[:, None], p.conics, 0.0) * cot)

        g = jax.grad(f)(chol)

        # chain rule by hand: v_chol = J^T v_cov with cov=(l11^2, l11 l21, l21^2+l22^2)
        def f_cov(c):
            p = project_gaussians_2d_covariance(
                jnp.stack([0.5 * W * xy_ndc[:, 0] + 0.5 * W,
                           0.5 * H * xy_ndc[:, 1] + 0.5 * H], -1), c, H, W)
            return jnp.sum(jnp.where(p.valid[:, None], p.conics, 0.0) * cot)

        v_cov = np.asarray(jax.grad(f_cov)(cholesky_to_cov2d(chol)))
        l11, l21, l22 = np.asarray(chol).T
        expected = np.stack([
            2 * l11 * v_cov[:, 0] + l21 * v_cov[:, 1],
            l11 * v_cov[:, 1] + 2 * l21 * v_cov[:, 2],
            2 * l22 * v_cov[:, 2],
        ], -1)
        np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-4, atol=1e-5)
