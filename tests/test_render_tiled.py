"""Tiled rasterizer (binning + custom VJP) vs the dense oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussianimage_plus_tpu.core import project_gaussians_2d_covariance, render_dense
from gaussianimage_plus_tpu.core.binning import bin_gaussians, TileBins
from gaussianimage_plus_tpu.core.render_tiled import rasterize_tiled


def make_scene(n=60, H=48, W=80, seed=0, saturate=False):
    rng = np.random.default_rng(seed)
    xy = np.stack([rng.uniform(0, W, n), rng.uniform(0, H, n)], -1).astype(np.float32)
    a = rng.uniform(2.0, 60.0, n)
    c = rng.uniform(2.0, 60.0, n)
    b = rng.uniform(-0.8, 0.8, n) * np.sqrt(a * c)
    cov = np.stack([a, b, c], -1).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacity = (np.full((n,), 2.0) if saturate else np.ones((n,))).astype(np.float32)
    return (jnp.asarray(xy), jnp.asarray(cov), jnp.asarray(colors),
            jnp.asarray(opacity), H, W)


def tiled_render(xy, cov, colors, opacity, H, W, cap=256, method="scatter"):
    proj = project_gaussians_2d_covariance(xy, cov, H, W)
    bins = bin_gaussians(proj, H, W, cap=cap, method=method)
    img = rasterize_tiled(proj.xys, proj.conics, colors, opacity,
                          bins.ids, bins.mask, H, W)
    return jnp.clip(img, 0.0, 1.0), proj, bins


class TestBinning:
    def test_methods_agree(self):
        xy, cov, colors, opacity, H, W = make_scene(n=120, seed=3)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        b1 = bin_gaussians(proj, H, W, cap=16, method="scatter")
        for method in ("top_k", "rank"):
            b2 = bin_gaussians(proj, H, W, cap=16, method=method)
            np.testing.assert_array_equal(np.asarray(b1.mask),
                                          np.asarray(b2.mask), err_msg=method)
            np.testing.assert_array_equal(
                np.asarray(b1.ids)[np.asarray(b1.mask)],
                np.asarray(b2.ids)[np.asarray(b2.mask)], err_msg=method)
            np.testing.assert_array_equal(np.asarray(b1.count),
                                          np.asarray(b2.count), err_msg=method)

    def test_against_bruteforce(self):
        xy, cov, colors, opacity, H, W = make_scene(n=50, seed=4)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        bins = bin_gaussians(proj, H, W, cap=256)
        from gaussianimage_plus_tpu.core import tile_membership
        member = np.asarray(tile_membership(proj, H, W))
        ids, mask = np.asarray(bins.ids), np.asarray(bins.mask)
        for t in range(member.shape[0]):
            expect = np.nonzero(member[t])[0]
            got = ids[t][mask[t]]
            np.testing.assert_array_equal(got, expect[:256])

    def test_overfull_tiles_clip_deterministically(self):
        """When occupancy exceeds the cap, the FIRST cap members by Gaussian
        id survive — the reference's shared-memory batch order
        (forward.cu:673 takes the first 256 sorted intersections). Training
        at a sub-occupancy cap leans on this determinism (see EXPERIMENTS.md
        'tile-cap semantics trap'), so pin it."""
        xy, cov, colors, opacity, H, W = make_scene(n=200, seed=5)
        # concentrate everything in one tile to force overflow
        xy = jnp.full_like(xy, 8.0)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        from gaussianimage_plus_tpu.core import tile_membership
        member = np.asarray(tile_membership(proj, H, W))
        cap = 16
        for method in ("top_k", "scatter", "rank"):
            bins = bin_gaussians(proj, H, W, cap=cap, method=method)
            ids, mask = np.asarray(bins.ids), np.asarray(bins.mask)
            count = np.asarray(bins.count)
            for t in range(member.shape[0]):
                expect = np.nonzero(member[t])[0]
                np.testing.assert_array_equal(ids[t][mask[t]], expect[:cap],
                                              err_msg=f"{method} tile {t}")
                assert count[t] == min(len(expect), cap)


class TestTiledForward:
    def test_matches_dense(self):
        xy, cov, colors, opacity, H, W = make_scene()
        img_t, proj, _ = tiled_render(xy, cov, colors, opacity, H, W)
        img_d = render_dense(proj, colors, opacity, H, W)
        np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_d), atol=1e-5)

    def test_matches_dense_with_cap(self):
        xy, cov, colors, opacity, H, W = make_scene(n=80, seed=9)
        img_t, proj, _ = tiled_render(xy, cov, colors, opacity, H, W, cap=8)
        img_d = render_dense(proj, colors, opacity, H, W, tile_cap=8)
        np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_d), atol=1e-5)

    def test_jit(self):
        xy, cov, colors, opacity, H, W = make_scene(seed=2)
        f = jax.jit(lambda *a: tiled_render(*a, H, W)[0])
        img = f(xy, cov, colors, opacity)
        img2, _, _ = tiled_render(xy, cov, colors, opacity, H, W)
        np.testing.assert_allclose(np.asarray(img), np.asarray(img2), atol=1e-5)


class TestTiledVJP:
    def _grads(self, render_fn, xy, cov, colors, opacity, H, W, seed=11):
        rng = np.random.default_rng(seed)
        cot = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))

        def loss(args):
            img = render_fn(*args)
            return jnp.sum(img * cot)

        return jax.grad(loss)((xy, cov, colors, opacity))

    def test_vjp_matches_dense_autodiff(self):
        xy, cov, colors, opacity, H, W = make_scene(n=40, seed=5)

        def tiled(x, c, col, op):
            return tiled_render(x, c, col, op, H, W)[0]

        def dense(x, c, col, op):
            proj = project_gaussians_2d_covariance(x, c, H, W)
            return render_dense(proj, col, op, H, W)

        g_t = self._grads(tiled, xy, cov, colors, opacity, H, W)
        g_d = self._grads(dense, xy, cov, colors, opacity, H, W)
        for a, b, name in zip(g_t, g_d, ["xy", "cov", "colors", "opacity"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4, err_msg=name)

    def test_vjp_matches_dense_autodiff_saturated(self):
        """Saturated min(1,.) regime: both paths use the pass-through grad."""
        xy, cov, colors, opacity, H, W = make_scene(n=30, seed=6, saturate=True)

        def tiled(x, c, col, op):
            return tiled_render(x, c, col, op, H, W)[0]

        def dense(x, c, col, op):
            proj = project_gaussians_2d_covariance(x, c, H, W)
            return render_dense(proj, col, op, H, W)

        g_t = self._grads(tiled, xy, cov, colors, opacity, H, W)
        g_d = self._grads(dense, xy, cov, colors, opacity, H, W)
        for a, b, name in zip(g_t, g_d, ["xy", "cov", "colors", "opacity"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-4, err_msg=name)

    def test_color_grad_closed_form(self):
        """v_rgb = sum_p contrib * alpha — single gaussian, uniform cotangent."""
        H, W = 16, 16
        xy = jnp.array([[8.0, 8.0]])
        cov = jnp.array([[9.0, 0.0, 9.0]])
        colors = jnp.array([[0.3, 0.4, 0.5]])
        opacity = jnp.ones((1,))

        def f(col):
            img, _, _ = tiled_render(xy, cov, col, opacity, H, W)
            return jnp.sum(img[..., 0])

        g = float(jax.grad(f)(colors)[0, 0])
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        img_w = render_dense(proj, jnp.ones((1, 3)), opacity, H, W)
        # with color=1 each pixel holds clamped alpha; sum = total weight
        assert np.isclose(g, float(jnp.sum(img_w[..., 0])), rtol=1e-5)


class TestPallasBinning:
    def test_matches_topk(self):
        from gaussianimage_plus_tpu.kernels.binning_pallas import bin_gaussians_pallas
        for seed, n, H, W, cap in [(3, 120, 48, 80, 16), (7, 60, 64, 64, 256),
                                   (11, 300, 96, 128, 32)]:
            xy, cov, colors, opacity, H_, W_ = make_scene(n=n, H=H, W=W, seed=seed)
            proj = project_gaussians_2d_covariance(xy, cov, H, W)
            b_ref = bin_gaussians(proj, H, W, cap=cap, method="top_k")
            b_pal = bin_gaussians_pallas(proj, H, W, cap=cap)
            np.testing.assert_array_equal(np.asarray(b_pal.count), np.asarray(b_ref.count))
            np.testing.assert_array_equal(np.asarray(b_pal.mask), np.asarray(b_ref.mask))
            np.testing.assert_array_equal(
                np.asarray(b_pal.ids)[np.asarray(b_pal.mask)],
                np.asarray(b_ref.ids)[np.asarray(b_ref.mask)],
                err_msg=f"seed={seed}")


class TestNdChannels:
    def test_five_channel_raster(self):
        """Channel-generic accumulation (nd_rasterize_forward_sum capability,
        forward.cu:694-897): the tiled rasterizer is C-generic."""
        rng = np.random.default_rng(21)
        xy, cov, _, opacity, H, W = make_scene(n=30, seed=21)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        bins = bin_gaussians(proj, H, W, cap=64)
        C = 5
        colors = jnp.asarray(rng.uniform(0, 1, (30, C)).astype(np.float32))
        img = rasterize_tiled(proj.xys, proj.conics, colors, opacity,
                              bins.ids, bins.mask, H, W)
        assert img.shape == (H, W, C)
        # channel 0 of a 5-channel render == channel 0 of a 3-channel render
        img3 = rasterize_tiled(proj.xys, proj.conics, colors[:, :3], opacity,
                               bins.ids, bins.mask, H, W)
        np.testing.assert_allclose(np.asarray(img[..., 0]),
                                   np.asarray(img3[..., 0]), atol=1e-6)

    def test_five_channel_grads(self):
        rng = np.random.default_rng(22)
        xy, cov, _, opacity, H, W = make_scene(n=20, seed=22)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        bins = bin_gaussians(proj, H, W, cap=64)
        C = 5
        colors = jnp.asarray(rng.uniform(0, 1, (20, C)).astype(np.float32))

        def f(c):
            img = rasterize_tiled(proj.xys, proj.conics, c, opacity,
                                  bins.ids, bins.mask, H, W)
            return jnp.sum(img ** 2)

        g = jax.grad(f)(colors)
        assert g.shape == colors.shape and np.isfinite(np.asarray(g)).all()


class TestRowsHierBinning:
    def test_matches_flat_rows(self):
        """bin_gaussian_rows_hier == bin_gaussian_rows over assorted
        contiguous flat ranges (incl. mid-row starts, ranges past the grid
        end, and single-row shards)."""
        from gaussianimage_plus_tpu.core.binning import (
            bin_gaussian_rows, bin_gaussian_rows_hier)
        from gaussianimage_plus_tpu.core import project_gaussians_2d_covariance

        xy, cov, colors, opacity, H, W = make_scene(n=150, seed=41)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        T = (-(-H // 16)) * (-(-W // 16))
        for start, n_tiles in [(0, T), (3, 7), (5, 10), (T - 4, 8), (0, 5),
                               (8, T - 8)]:
            flat = bin_gaussian_rows(proj, H, W, start, n_tiles, cap=16)
            hier = bin_gaussian_rows_hier(proj, H, W, start, n_tiles, cap=16,
                                          band_rows=2, super_cap=256)
            assert int(hier.super_overflow) == 0
            np.testing.assert_array_equal(
                np.asarray(flat.mask), np.asarray(hier.mask),
                err_msg=f"mask start={start} n={n_tiles}")
            np.testing.assert_array_equal(
                np.asarray(flat.ids)[np.asarray(flat.mask)],
                np.asarray(hier.ids)[np.asarray(hier.mask)],
                err_msg=f"ids start={start} n={n_tiles}")
            np.testing.assert_array_equal(
                np.asarray(flat.count), np.asarray(hier.count),
                err_msg=f"count start={start} n={n_tiles}")

    def test_traced_start(self):
        """tile_start may be a traced scalar (a shard offset)."""
        from gaussianimage_plus_tpu.core.binning import (
            bin_gaussian_rows, bin_gaussian_rows_hier)
        from gaussianimage_plus_tpu.core import project_gaussians_2d_covariance

        xy, cov, colors, opacity, H, W = make_scene(n=80, seed=42)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        f = jax.jit(lambda s: bin_gaussian_rows_hier(
            proj, H, W, s, 6, cap=16, band_rows=2, super_cap=128))
        for start in (0, 4, 9):
            hier = f(jnp.asarray(start, jnp.int32))
            flat = bin_gaussian_rows(proj, H, W, start, 6, cap=16)
            np.testing.assert_array_equal(np.asarray(flat.mask),
                                          np.asarray(hier.mask))
            np.testing.assert_array_equal(
                np.asarray(flat.ids)[np.asarray(flat.mask)],
                np.asarray(hier.ids)[np.asarray(hier.mask)])


class TestHierBinning:
    def test_matches_flat_various_grids(self):
        """Two-level binning must equal flat binning exactly (ids, mask,
        count) across grid sizes, incl. grids not divisible by the
        super-tile size and Gaussians spanning super-tile borders."""
        for n, H, W, ss, seed in ((120, 48, 80, 2, 3), (200, 160, 240, 4, 5),
                                  (80, 176, 144, 8, 7), (300, 96, 96, 3, 9)):
            xy, cov, colors, opacity, H, W = make_scene(n=n, H=H, W=W, seed=seed)
            proj = project_gaussians_2d_covariance(xy, cov, H, W)
            flat = bin_gaussians(proj, H, W, cap=32, method="top_k")
            hier = bin_gaussians(proj, H, W, cap=32, method="hier",
                                 super_size=ss, super_cap=n)
            np.testing.assert_array_equal(np.asarray(flat.mask),
                                          np.asarray(hier.mask))
            np.testing.assert_array_equal(
                np.asarray(flat.ids)[np.asarray(flat.mask)],
                np.asarray(hier.ids)[np.asarray(hier.mask)])
            np.testing.assert_array_equal(np.asarray(flat.count),
                                          np.asarray(hier.count))

    def test_super_cap_overflow_drops_highest_ids(self):
        """When a super-tile exceeds super_cap, the lowest-index candidates
        are kept — same policy as the per-tile cap."""
        xy, cov, colors, opacity, H, W = make_scene(n=150, H=48, W=48, seed=1)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        hier = bin_gaussians(proj, H, W, cap=256, method="hier",
                             super_size=16, super_cap=16)
        flat = bin_gaussians(proj, H, W, cap=256, method="top_k")
        m_h, m_f = np.asarray(hier.mask), np.asarray(flat.mask)
        ids_h, ids_f = np.asarray(hier.ids), np.asarray(flat.ids)
        for t in range(m_h.shape[0]):
            kept, full = ids_h[t][m_h[t]], ids_f[t][m_f[t]]
            # kept is a prefix of the full (index-ascending) list
            np.testing.assert_array_equal(kept, full[:len(kept)])

    def test_render_identical_through_hier(self):
        xy, cov, colors, opacity, H, W = make_scene(n=100, seed=4)
        img_flat, _, _ = tiled_render(xy, cov, colors, opacity, H, W,
                                      method="top_k")
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        bins = bin_gaussians(proj, H, W, cap=256, method="hier", super_cap=100)
        img_hier = jnp.clip(rasterize_tiled(proj.xys, proj.conics, colors,
                                            opacity, bins.ids, bins.mask,
                                            H, W), 0.0, 1.0)
        np.testing.assert_array_equal(np.asarray(img_flat),
                                      np.asarray(img_hier))
