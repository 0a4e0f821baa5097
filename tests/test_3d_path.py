"""3D legacy path: SH, EWA projection, alpha compositing, end-to-end fit."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussianimage_plus_tpu.core.sh import eval_sh_bases, num_sh_bases, spherical_harmonics
from gaussianimage_plus_tpu.core.project3d import (
    project_cov3d_ewa,
    project_gaussians_3d,
    quat_to_rotmat,
    scale_rot_to_cov3d,
)
from gaussianimage_plus_tpu.core.render_alpha import (
    depth_order_projection,
    rasterize_alpha_tiled,
)
from gaussianimage_plus_tpu.models.gaussian_3d import (
    Gaussian3DConfig,
    fit_image_3d,
    init_params_3d,
    render_3d,
)


class TestSH:
    def test_dc_only(self):
        coeffs = jnp.zeros((4, 1, 3)).at[:, 0, :].set(2.0)
        dirs = jnp.array([[0, 0, 1.0]] * 4)
        out = spherical_harmonics(0, dirs, coeffs)
        np.testing.assert_allclose(np.asarray(out), 2.0 * 0.28209479, rtol=1e-6)

    def test_orthogonality_deg2(self):
        """Monte-Carlo orthonormality of the real SH basis."""
        rng = np.random.default_rng(0)
        v = rng.normal(size=(200000, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        B = np.asarray(eval_sh_bases(2, jnp.asarray(v.astype(np.float32))))
        gram = (B.T @ B) / v.shape[0] * (4 * np.pi)
        np.testing.assert_allclose(gram, np.eye(9), atol=0.08)

    def test_num_bases(self):
        assert [num_sh_bases(d) for d in range(5)] == [1, 4, 9, 16, 25]


class TestProjection3D:
    def test_quat_rotmat_orthonormal(self):
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
        R = np.asarray(quat_to_rotmat(q))
        for i in range(32):
            np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
            assert np.isclose(np.linalg.det(R[i]), 1.0, atol=1e-5)

    def test_cov3d_identity_quat(self):
        q = jnp.array([[1.0, 0, 0, 0]])
        s = jnp.array([[2.0, 3.0, 4.0]])
        c = np.asarray(scale_rot_to_cov3d(s, 1.0, q))[0]
        np.testing.assert_allclose(c, [4, 0, 0, 9, 0, 16], atol=1e-5)

    def test_ewa_against_numpy(self):
        mean_view = jnp.array([[0.5, -0.3, 5.0]])
        cov3d = jnp.array([[0.5, 0.1, 0.0, 0.6, 0.05, 0.7]])
        fx = fy = 300.0
        out = np.asarray(project_cov3d_ewa(mean_view, cov3d, fx, fy, 1.0, 1.0))[0]
        x, y, z = 0.5, -0.3, 5.0
        J = np.array([[fx / z, 0, -fx * x / z ** 2], [0, fy / z, -fy * y / z ** 2]])
        V = np.array([[0.5, 0.1, 0.0], [0.1, 0.6, 0.05], [0.0, 0.05, 0.7]])
        C = J @ V @ J.T
        np.testing.assert_allclose(out, [C[0, 0] + 0.3, C[0, 1], C[1, 1] + 0.3],
                                   rtol=1e-5)

    def test_behind_camera_culled(self):
        means = jnp.array([[0.0, 0.0, -20.0], [0.0, 0.0, 0.0]])  # view z = -12, 8
        scales = jnp.full((2, 3), 0.1)
        quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
        viewmat = jnp.eye(4).at[2, 3].set(8.0)
        p3 = project_gaussians_3d(means, scales, 1.0, quats, viewmat,
                                  256.0, 256.0, 128.0, 128.0, 256, 256)
        assert not bool(p3.proj.valid[0])
        assert bool(p3.proj.valid[1])


def numpy_alpha_composite(xys, conics, depths, colors, opac, H, W, bg):
    """Per-pixel loop oracle for the alpha blend (forward.cu:322-450)."""
    order = np.argsort(depths)
    img = np.zeros((H, W, 3))
    for i in range(H):
        for j in range(W):
            T = 1.0
            acc = np.zeros(3)
            for g in order:
                dx, dy = xys[g, 0] - j, xys[g, 1] - i
                sigma = 0.5 * (conics[g, 0] * dx * dx + conics[g, 2] * dy * dy) \
                    + conics[g, 1] * dx * dy
                if sigma < 0:
                    # note: the 3D kernel has no sigma<0 skip; sigma>=0 for PSD
                    pass
                alpha = min(0.999, opac[g] * np.exp(-sigma))
                if alpha < 1.0 / 255.0:
                    continue
                nT = T * (1 - alpha)
                if nT <= 1e-4:
                    break
                acc += colors[g] * alpha * T
                T = nT
            img[i, j] = acc + T * bg
    return img


class TestAlphaComposite:
    def test_vs_loop_oracle(self):
        rng = np.random.default_rng(2)
        H = W = 32
        n = 12
        xys = rng.uniform(4, 28, (n, 2)).astype(np.float32)
        var = rng.uniform(4, 30, (n, 2))
        cov = np.stack([var[:, 0], np.zeros(n), var[:, 1]], -1).astype(np.float32)
        depths = rng.uniform(1, 10, n).astype(np.float32)
        colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
        from gaussianimage_plus_tpu.core.gaussian2d import project_gaussians_2d_covariance
        proj = project_gaussians_2d_covariance(jnp.asarray(xys), jnp.asarray(cov), H, W)
        bg = np.array([1.0, 1.0, 1.0], np.float32)
        ps, order = depth_order_projection(proj, jnp.asarray(depths))
        img = np.asarray(rasterize_alpha_tiled(
            ps, jnp.asarray(colors)[order], jnp.asarray(opac)[order], H, W,
            background=jnp.asarray(bg)))
        valid = np.asarray(proj.valid)
        expected = numpy_alpha_composite(xys[valid], np.asarray(proj.conics)[valid],
                                         depths[valid], colors[valid],
                                         opac[valid], H, W, bg)
        np.testing.assert_allclose(img, expected, atol=2e-5)


class TestGaussian3DModel:
    def test_render_shape_and_fit(self):
        H, W = 32, 48
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        gt = np.stack([xx / W, yy / H, 0.5 * np.ones_like(xx)], -1)
        cfg = Gaussian3DConfig(H=H, W=W, num_points=96, sh_degree=1, tile_cap=96)
        params = init_params_3d(cfg, jax.random.PRNGKey(0))
        img = render_3d(params, cfg)
        assert img.shape == (H, W, 3)
        p0 = float(jnp.mean((img - gt) ** 2))
        params2, m = fit_image_3d(gt, cfg, iterations=150, lr=0.05,
                                  loss_type="L2", seed=0)
        img2 = render_3d(params2, cfg)
        assert float(jnp.mean((img2 - gt) ** 2)) < p0
