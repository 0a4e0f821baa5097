"""Dense oracle renderer vs a slow per-pixel numpy loop implementing the
reference blending rule verbatim (forward.cu:570-691)."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussianimage_plus_tpu.core import (
    project_gaussians_2d_covariance,
    render_dense,
    tile_membership,
    tile_cap_mask,
)


def make_scene(n=40, H=48, W=64, seed=0):
    rng = np.random.default_rng(seed)
    xy = np.stack([rng.uniform(0, W, n), rng.uniform(0, H, n)], -1).astype(np.float32)
    a = rng.uniform(2.0, 40.0, n)
    c = rng.uniform(2.0, 40.0, n)
    b = rng.uniform(-0.8, 0.8, n) * np.sqrt(a * c)
    cov = np.stack([a, b, c], -1).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacity = np.ones((n,), np.float32)
    return xy, cov, colors, opacity, H, W


def numpy_reference_render(xy, cov, colors, opacity, H, W, cap=256):
    """Triple-loop oracle: exact reference semantics incl. tile binning+cap."""
    n = xy.shape[0]
    conics = np.zeros((n, 3), np.float64)
    radii = np.zeros(n, np.int64)
    valid = np.zeros(n, bool)
    tb_x, tb_y = -(-W // 16), -(-H // 16)
    bboxes = np.zeros((n, 4), np.int64)
    for i in range(n):
        det = cov[i, 0] * cov[i, 2] - cov[i, 1] ** 2
        if det == 0:
            continue
        conics[i] = np.array([cov[i, 2], -cov[i, 1], cov[i, 0]]) / det
        b = 0.5 * (cov[i, 0] + cov[i, 2])
        disc = np.sqrt(max(0.1, b * b - det))
        v1, v2 = b + disc, b - disc
        r_major = np.ceil(3.0 * np.sqrt(max(v1, 0)))
        r_minor = np.ceil(3.0 * np.sqrt(max(v2, 0)))
        if r_minor < 1.0:
            continue
        cx, cy = xy[i, 0] / 16.0, xy[i, 1] / 16.0
        rx, ry = r_major / 16.0, r_major / 16.0
        xmin = min(max(0, int(cx - rx)), tb_x)
        xmax = min(max(0, int(cx + rx + 1)), tb_x)
        ymin = min(max(0, int(cy - ry)), tb_y)
        ymax = min(max(0, int(cy + ry + 1)), tb_y)
        if (xmax - xmin) * (ymax - ymin) <= 0:
            continue
        valid[i] = True
        radii[i] = int(r_major)
        bboxes[i] = [xmin, xmax, ymin, ymax]

    # per-tile member lists in index order, capped
    img = np.zeros((H, W, 3), np.float64)
    for ty in range(tb_y):
        for tx in range(tb_x):
            members = [i for i in range(n) if valid[i]
                       and bboxes[i, 0] <= tx < bboxes[i, 1]
                       and bboxes[i, 2] <= ty < bboxes[i, 3]][:cap]
            for pi in range(ty * 16, min((ty + 1) * 16, H)):
                for pj in range(tx * 16, min((tx + 1) * 16, W)):
                    acc = np.zeros(3)
                    for g in members:
                        dx = xy[g, 0] - pj
                        dy = xy[g, 1] - pi
                        sigma = 0.5 * (conics[g, 0] * dx * dx + conics[g, 2] * dy * dy) \
                            + conics[g, 1] * dx * dy
                        alpha = min(1.0, opacity[g] * np.exp(-sigma))
                        if sigma < 0 or alpha < 1.0 / 255.0:
                            continue
                        acc += colors[g] * alpha
                    img[pi, pj] = np.clip(acc, 0, 1)
    return img.astype(np.float32)


class TestRenderDense:
    def test_matches_loop_oracle(self):
        xy, cov, colors, opacity, H, W = make_scene()
        proj = project_gaussians_2d_covariance(jnp.asarray(xy), jnp.asarray(cov), H, W)
        img = np.asarray(render_dense(proj, jnp.asarray(colors), jnp.asarray(opacity), H, W))
        expected = numpy_reference_render(xy, cov, colors, opacity, H, W)
        np.testing.assert_allclose(img, expected, atol=2e-5)

    def test_tile_cap(self):
        # Pile many gaussians onto one tile; cap must keep only the first K.
        n, H, W = 30, 16, 16
        xy = np.full((n, 2), 8.0, np.float32)
        cov = np.tile(np.array([[9.0, 0.0, 9.0]], np.float32), (n, 1))
        colors = np.full((n, 3), 0.01, np.float32)
        opacity = np.ones((n,), np.float32)
        proj = project_gaussians_2d_covariance(jnp.asarray(xy), jnp.asarray(cov), H, W)
        img_cap = np.asarray(render_dense(proj, jnp.asarray(colors), jnp.asarray(opacity),
                                          H, W, tile_cap=10))
        expected = numpy_reference_render(xy, cov, colors, opacity, H, W, cap=10)
        np.testing.assert_allclose(img_cap, expected, atol=2e-5)
        img_nocap = np.asarray(render_dense(proj, jnp.asarray(colors), jnp.asarray(opacity),
                                            H, W, tile_cap=None))
        assert img_nocap[8, 8, 0] > img_cap[8, 8, 0]

    def test_membership_cap_rank(self):
        xy, cov, colors, opacity, H, W = make_scene(n=25, seed=7)
        proj = project_gaussians_2d_covariance(jnp.asarray(xy), jnp.asarray(cov), H, W)
        member = np.asarray(tile_membership(proj, H, W))
        capped = np.asarray(tile_cap_mask(jnp.asarray(member), 3))
        assert np.all(capped.sum(axis=1) <= 3)
        # capped members are the first members in index order
        for t in range(member.shape[0]):
            idx = np.nonzero(member[t])[0][:3]
            np.testing.assert_array_equal(np.nonzero(capped[t])[0], idx)

    def test_saturated_min_gradient_passthrough(self):
        """grad flows through min(1, alpha) even when saturated
        (backward.cu:1308-1323 semantics)."""
        H, W = 16, 16
        xy = jnp.array([[8.0, 8.0]])
        cov = jnp.array([[25.0, 0.0, 25.0]])
        colors = jnp.array([[0.5, 0.5, 0.5]])
        opacity = jnp.array([3.0])  # alpha saturates at the center

        def f(op):
            proj = project_gaussians_2d_covariance(xy, cov, H, W)
            img = render_dense(proj, colors, op, H, W)
            return img[8, 8, 0]

        g = float(jax.grad(f)(opacity)[0])
        # sigma=0 at center -> vis=1; v_opacity = vis * (color . v_out) = 0.5
        assert np.isclose(g, 0.5, atol=1e-6)
