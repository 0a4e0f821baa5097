"""Pallas rasterizer (interpret mode on CPU) vs the XLA tiled path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gaussianimage_plus_tpu.core import project_gaussians_2d_covariance
from gaussianimage_plus_tpu.core.binning import bin_gaussians
from gaussianimage_plus_tpu.core.render_tiled import rasterize_tiled
from gaussianimage_plus_tpu.kernels.raster_pallas import rasterize_pallas


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


def setup(xy, cov, H, W, cap=64):
    proj = project_gaussians_2d_covariance(xy, cov, H, W)
    bins = bin_gaussians(proj, H, W, cap=cap)
    return proj, bins


class TestPallasForward:
    def test_matches_xla_tiled(self):
        xy, cov, colors, opacity, H, W = make_scene()
        proj, bins = setup(xy, cov, H, W)
        img_p = rasterize_pallas(proj.xys, proj.conics, colors, opacity,
                                 bins.ids, bins.mask, proj.radii, H, W)
        img_x = rasterize_tiled(proj.xys, proj.conics, colors, opacity,
                                bins.ids, bins.mask, H, W)
        np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                                   atol=1e-5, rtol=1e-5)

    def test_jit(self):
        xy, cov, colors, opacity, H, W = make_scene(seed=3)
        proj, bins = setup(xy, cov, H, W)
        f = jax.jit(lambda c: rasterize_pallas(proj.xys, proj.conics, c, opacity,
                                               bins.ids, bins.mask, proj.radii,
                                               H, W))
        img = f(colors)
        img_x = rasterize_tiled(proj.xys, proj.conics, colors, opacity,
                                bins.ids, bins.mask, H, W)
        np.testing.assert_allclose(np.asarray(img), np.asarray(img_x), atol=1e-5)


class TestPallasVJP:
    def _grads(self, raster, xy, cov, colors, opacity, H, W, bins, proj,
               seed=7, gather_tiles=None):
        rng = np.random.default_rng(seed)
        cot = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))

        def loss(args):
            xys, conics, col, op = args
            if gather_tiles is None:
                img = raster(xys, conics, col, op, bins.ids, bins.mask, H, W)
            else:
                img = raster(xys, conics, col, op, bins.ids, bins.mask,
                             proj.radii, H, W, 16, 16, gather_tiles)
            return jnp.sum(jnp.clip(img, 0, 1) * cot)

        return jax.grad(loss)((proj.xys, proj.conics, colors, opacity))

    def test_vjp_matches_xla(self):
        xy, cov, colors, opacity, H, W = make_scene(n=40, seed=5)
        proj, bins = setup(xy, cov, H, W)
        g_x = self._grads(rasterize_tiled, xy, cov, colors, opacity, H, W, bins, proj)
        for gt_budget in (0, 64):   # scatter path and inverse-map gather path
            g_p = self._grads(rasterize_pallas, xy, cov, colors, opacity,
                              H, W, bins, proj, gather_tiles=gt_budget)
            for a, b, name in zip(g_p, g_x, ["xys", "conics", "colors", "opacity"]):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-3,
                    err_msg=f"{name} gather_tiles={gt_budget}")

    def test_vjp_matches_xla_saturated(self):
        xy, cov, colors, opacity, H, W = make_scene(n=30, seed=6, saturate=True)
        proj, bins = setup(xy, cov, H, W)
        g_x = self._grads(rasterize_tiled, xy, cov, colors, opacity, H, W, bins, proj)
        for gt_budget in (0, 64):
            g_p = self._grads(rasterize_pallas, xy, cov, colors, opacity,
                              H, W, bins, proj, gather_tiles=gt_budget)
            for a, b, name in zip(g_p, g_x, ["xys", "conics", "colors", "opacity"]):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-3,
                    err_msg=f"{name} gather_tiles={gt_budget}")

    def test_gather_grads_with_clipped_tiles(self):
        """Inverse-map gather under cap clipping: Gaussians clipped out of an
        overfull tile must contribute zero gradient from that tile — exactly
        what the scatter path produces. Force overflow with a tiny cap."""
        xy, cov, colors, opacity, H, W = make_scene(n=60, seed=11)
        xy = jnp.concatenate([jnp.full((30, 2), 12.0), xy[30:]], axis=0)
        from gaussianimage_plus_tpu.core import project_gaussians_2d_covariance
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        bins = bin_gaussians(proj, H, W, cap=8)    # heavy clipping
        g_s = self._grads(rasterize_pallas, xy, cov, colors, opacity, H, W,
                          bins, proj, gather_tiles=0)
        g_g = self._grads(rasterize_pallas, xy, cov, colors, opacity, H, W,
                          bins, proj, gather_tiles=64)
        for a, b, name in zip(g_g, g_s, ["xys", "conics", "colors", "opacity"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5, err_msg=name)

    def test_adaptive_scatter_tiers_exact(self):
        """The occupancy-adaptive scatter (cols 64/128/full picked at runtime
        from max tile count) must match the XLA-tiled gradients at a large
        cap, both at low occupancy (tier 64) and with an overfull tile that
        forces a higher tier."""
        # low occupancy: every tile count <= 64 -> tier-64 scatter
        xy, cov, colors, opacity, H, W = make_scene(n=50, seed=21)
        proj, bins = setup(xy, cov, H, W, cap=256)
        g_p = self._grads(rasterize_pallas, xy, cov, colors, opacity, H, W,
                          bins, proj, gather_tiles=0)
        g_x = self._grads(rasterize_tiled, xy, cov, colors, opacity, H, W,
                          bins, proj)
        for a, b, name in zip(g_p, g_x, ["xys", "conics", "colors", "opacity"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=2e-3,
                                       err_msg=f"low-occ {name}")
        # one tile with ~100 members -> crosses the 64 tier
        xy2, cov2, colors2, opacity2, H, W = make_scene(n=120, seed=22)
        xy2 = jnp.concatenate([jnp.full((100, 2), 10.0), xy2[100:]], axis=0)
        proj2, bins2 = setup(xy2, cov2, H, W, cap=256)
        assert int(bins2.count.max()) > 64
        g_p2 = self._grads(rasterize_pallas, xy2, cov2, colors2, opacity2,
                           H, W, bins2, proj2, gather_tiles=0)
        g_x2 = self._grads(rasterize_tiled, xy2, cov2, colors2, opacity2,
                           H, W, bins2, proj2)
        for a, b, name in zip(g_p2, g_x2, ["xys", "conics", "colors", "opacity"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=2e-3,
                                       err_msg=f"overfull {name}")

    def test_gather_overflow_falls_back_to_scatter(self):
        """A bbox bigger than gather_tiles must trigger the in-graph scatter
        fallback — gradients stay exact, never silently truncated."""
        xy, cov, colors, opacity, H, W = make_scene(n=40, seed=12)
        cov = cov.at[0].set(jnp.array([3000.0, 0.0, 3000.0]))  # giant bbox
        from gaussianimage_plus_tpu.core import project_gaussians_2d_covariance
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        assert int(proj.num_tiles_hit.max()) > 2   # the giant covers >2 tiles
        bins = bin_gaussians(proj, H, W, cap=64)
        g_s = self._grads(rasterize_pallas, xy, cov, colors, opacity, H, W,
                          bins, proj, gather_tiles=0)
        g_g = self._grads(rasterize_pallas, xy, cov, colors, opacity, H, W,
                          bins, proj, gather_tiles=2)   # everything overflows
        for a, b, name in zip(g_g, g_s, ["xys", "conics", "colors", "opacity"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6, err_msg=name)


class TestDensePallas:
    def test_matches_uncapped_tiled(self):
        from gaussianimage_plus_tpu.kernels.raster_dense_pallas import rasterize_dense_pallas
        xy, cov, colors, opacity, H, W = make_scene(n=60, seed=13)
        proj, bins = setup(xy, cov, H, W, cap=64)  # 64 >> any tile count here
        img_d = rasterize_dense_pallas(proj, colors, opacity, H, W)
        img_b = rasterize_tiled(proj.xys, proj.conics, colors, opacity,
                                bins.ids, bins.mask, H, W)
        np.testing.assert_allclose(np.asarray(img_d), np.asarray(img_b),
                                   atol=1e-5, rtol=1e-5)

    def test_invalid_culled(self):
        from gaussianimage_plus_tpu.kernels.raster_dense_pallas import rasterize_dense_pallas
        xy, cov, colors, opacity, H, W = make_scene(n=20, seed=14)
        cov = cov.at[0].set(jnp.array([1.0, 2.0, 1.0]))  # non-invertible-ish det<0
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        img = rasterize_dense_pallas(proj, colors, opacity, H, W)
        assert np.isfinite(np.asarray(img)).all()


class TestSweepPallas:
    def test_matches_dense(self):
        from gaussianimage_plus_tpu.kernels.raster_dense_pallas import (
            rasterize_dense_pallas, rasterize_sweep_pallas)
        xy, cov, colors, opacity, H, W = make_scene(n=150, seed=21)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        img_s = rasterize_sweep_pallas(proj, colors, opacity, H, W, kc=32)
        img_d = rasterize_dense_pallas(proj, colors, opacity, H, W)
        np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_d),
                                   atol=1e-5, rtol=1e-5)

    def test_morton_order_invariant(self):
        """Permuting the Gaussian stream by Morton code must not change the
        sweep render (accumulation blending is order-free)."""
        from gaussianimage_plus_tpu.core.binning import morton_perm
        from gaussianimage_plus_tpu.kernels.raster_dense_pallas import (
            rasterize_sweep_pallas)
        xy, cov, colors, opacity, H, W = make_scene(n=120, seed=22)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        img_a = rasterize_sweep_pallas(proj, colors, opacity, H, W, kc=32)
        perm = morton_perm(proj.xys, proj.valid, H, W)
        proj_p = proj._replace(
            xys=proj.xys[perm], conics=proj.conics[perm],
            radii=proj.radii[perm], num_tiles_hit=proj.num_tiles_hit[perm],
            valid=proj.valid[perm])
        img_b = rasterize_sweep_pallas(proj_p, colors[perm], opacity[perm],
                                       H, W, kc=32)
        np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                                   atol=2e-5, rtol=1e-5)

    def test_range_matches_dense(self):
        from gaussianimage_plus_tpu.kernels.raster_dense_pallas import (
            rasterize_dense_pallas, rasterize_range_pallas)
        xy, cov, colors, opacity, H, W = make_scene(n=150, seed=23)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        img_r = rasterize_range_pallas(proj, colors, opacity, H, W, kc=32)
        img_d = rasterize_dense_pallas(proj, colors, opacity, H, W)
        np.testing.assert_allclose(np.asarray(img_r), np.asarray(img_d),
                                   atol=1e-5, rtol=1e-5)

    def test_range_matches_dense_morton(self):
        from gaussianimage_plus_tpu.core.binning import morton_perm
        from gaussianimage_plus_tpu.kernels.raster_dense_pallas import (
            rasterize_dense_pallas, rasterize_range_pallas)
        xy, cov, colors, opacity, H, W = make_scene(n=120, seed=24)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        img_d = rasterize_dense_pallas(proj, colors, opacity, H, W)
        perm = morton_perm(proj.xys, proj.valid, H, W)
        proj_p = proj._replace(
            xys=proj.xys[perm], conics=proj.conics[perm],
            radii=proj.radii[perm], num_tiles_hit=proj.num_tiles_hit[perm],
            valid=proj.valid[perm])
        img_r = rasterize_range_pallas(proj_p, colors[perm], opacity[perm],
                                       H, W, kc=32)
        np.testing.assert_allclose(np.asarray(img_r), np.asarray(img_d),
                                   atol=2e-5, rtol=1e-5)

    def test_range_decode_backend(self):
        """decompress_wo_ec(backend='range') == binned decode."""
        from gaussianimage_plus_tpu.compress import (
            QuantConfig, compress_wo_ec, decompress_wo_ec, init_quantizers)
        from gaussianimage_plus_tpu.compress.pipeline import morton_reorder
        from gaussianimage_plus_tpu.models import GaussianConfig
        from gaussianimage_plus_tpu.train import TrainConfig
        from gaussianimage_plus_tpu.train.trainer import init_train_state, train_chunk

        H, W = 48, 64
        cfg = GaussianConfig(H=H, W=W, max_num_points=96, tile_cap=48)
        tcfg = TrainConfig(iterations=100, grow_iter=50, prune_iter=50, lr=0.02)
        gt = jnp.asarray(np.random.default_rng(2).uniform(
            0, 1, (H, W, 3)).astype(np.float32))
        ts = init_train_state(cfg, tcfg, 48, seed=0)
        ts, _ = train_chunk(ts, gt, cfg, tcfg, 100, True, False)
        state = ts.gaussians
        qcfg = QuantConfig()
        bundle = init_quantizers(state, cfg, qcfg)
        enc = compress_wo_ec(bundle, state, cfg, qcfg)
        ref = decompress_wo_ec(bundle, enc, state.bound, cfg, qcfg)
        enc_m, bound_m = morton_reorder(enc, state.bound, cfg)
        out = decompress_wo_ec(bundle, enc_m, bound_m, cfg, qcfg,
                               backend="range")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    def test_invalid_last_in_morton_perm(self):
        from gaussianimage_plus_tpu.core.binning import morton_perm
        xy = jnp.asarray(np.random.default_rng(0).uniform(
            0, 40, (10, 2)).astype(np.float32))
        valid = jnp.asarray([True, False, True, True, False,
                             True, True, True, True, True])
        perm = morton_perm(xy, valid, 48, 48)
        v = np.asarray(valid)[np.asarray(perm)]
        assert not v[-2:].any() and v[:-2].all()


class TestDenseVJP:
    def test_dense_grads_match_tiled(self):
        from gaussianimage_plus_tpu.kernels.raster_dense_pallas import rasterize_dense
        xy, cov, colors, opacity, H, W = make_scene(n=40, seed=31)
        proj, bins = setup(xy, cov, H, W, cap=64)
        rng = np.random.default_rng(32)
        cot = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))

        def loss_dense(args):
            xys, conics, col, op = args
            img = rasterize_dense(xys, conics, col, op, proj.radii, proj.valid, H, W)
            return jnp.sum(jnp.clip(img, 0, 1) * cot)

        def loss_tiled(args):
            xys, conics, col, op = args
            img = rasterize_tiled(xys, conics, col, op, bins.ids, bins.mask, H, W)
            return jnp.sum(jnp.clip(img, 0, 1) * cot)

        g_d = jax.grad(loss_dense)((proj.xys, proj.conics, colors, opacity))
        g_t = jax.grad(loss_tiled)((proj.xys, proj.conics, colors, opacity))
        for a, b, name in zip(g_d, g_t, ["xys", "conics", "colors", "opacity"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=2e-3, err_msg=name)

    def test_dense_backend_trains(self):
        from gaussianimage_plus_tpu.models import GaussianConfig
        from gaussianimage_plus_tpu.train import TrainConfig, fit_image
        H, W = 32, 48
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        gt = np.stack([xx / W, yy / H, 0.5 * np.ones_like(xx)], -1)
        cfg = GaussianConfig(H=H, W=W, max_num_points=64, raster_backend="dense")
        tcfg = TrainConfig(iterations=200, grow_iter=100, prune_iter=50, lr=0.02)
        res = fit_image(gt, cfg, tcfg, num_points=30, seed=0)
        assert res.best_psnr > 14.0


class TestSweepVJP:
    def test_sweep_grads_match_dense(self):
        from gaussianimage_plus_tpu.kernels.raster_dense_pallas import (
            rasterize_dense, rasterize_sweep)
        xy, cov, colors, opacity, H, W = make_scene(n=40, seed=41)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        rng = np.random.default_rng(42)
        cot = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))

        def loss_of(raster):
            def loss(args):
                xys, conics, col, op = args
                img = raster(xys, conics, col, op, proj.radii, proj.valid, H, W)
                return jnp.sum(jnp.clip(img, 0, 1) * cot)
            return loss

        args = (proj.xys, proj.conics, colors, opacity)
        g_s = jax.grad(loss_of(rasterize_sweep))(args)
        g_d = jax.grad(loss_of(rasterize_dense))(args)
        # the two backwards accumulate per-tile contributions in different
        # orders (dense: per-chunk acc over tiles; sweep: per-tile adds), so
        # agreement is float-order-limited, not exact
        for a, b, name in zip(g_s, g_d, ["xys", "conics", "colors", "opacity"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=5e-4, err_msg=name)

    def test_sweep_backend_with_resort_matches_dense_fit(self):
        """fit_image at backend='sweep' + morton_resort must reach the same
        result as backend='dense' without resort: the sweep kernel is exact
        for any order and the resort permutes params + moments together."""
        from gaussianimage_plus_tpu.models import GaussianConfig
        from gaussianimage_plus_tpu.train import TrainConfig, fit_image
        H, W = 32, 48
        gt = np.asarray(np.random.default_rng(7).uniform(
            0, 1, (H, W, 3)), dtype=np.float32)
        tcfg = TrainConfig(iterations=200, grow_iter=100, prune_iter=50, lr=0.02)
        cfg_d = GaussianConfig(H=H, W=W, max_num_points=64, raster_backend="dense")
        cfg_s = GaussianConfig(H=H, W=W, max_num_points=64, raster_backend="sweep")
        res_d = fit_image(gt, cfg_d, tcfg, num_points=30, seed=0)
        res_s = fit_image(gt, cfg_s, tcfg.replace(morton_resort=True),
                          num_points=30, seed=0)
        # trajectories agree up to float summation order (which compounds
        # through 200 chaotic optimizer steps): compare outcomes, not rows
        assert res_s.best_psnr == pytest.approx(res_d.best_psnr, abs=2e-2)
        from gaussianimage_plus_tpu.models import render
        img_d = np.asarray(render(res_d.state, cfg_d))
        img_s = np.asarray(render(res_s.state, cfg_s))
        np.testing.assert_allclose(img_s, img_d, atol=2e-2)

    def test_resort_with_binned_backend_trains(self):
        """morton_resort composes with the default binned backend (id order
        only matters at over-cap tiles, absent here)."""
        from gaussianimage_plus_tpu.models import GaussianConfig
        from gaussianimage_plus_tpu.train import TrainConfig, fit_image
        H, W = 32, 48
        gt = np.asarray(np.random.default_rng(8).uniform(
            0, 1, (H, W, 3)), dtype=np.float32)
        cfg = GaussianConfig(H=H, W=W, max_num_points=64, tile_cap=64)
        tcfg = TrainConfig(iterations=200, grow_iter=100, prune_iter=50,
                           lr=0.02)
        res_a = fit_image(gt, cfg, tcfg, num_points=30, seed=1)
        res_b = fit_image(gt, cfg, tcfg.replace(morton_resort=True),
                          num_points=30, seed=1)
        assert res_b.best_psnr == pytest.approx(res_a.best_psnr, abs=2e-2)


class TestFlatForward:
    def test_flat_matches_chunked(self):
        """Flat decode kernel == chunked kernel == XLA on random scenes,
        including empty tiles and saturated alphas, at several tile blocks."""
        from gaussianimage_plus_tpu.kernels.raster_pallas import prepare_raster
        from gaussianimage_plus_tpu.kernels.raster_flat_pallas import (
            rasterize_prepared_flat)

        for seed, saturate in ((0, False), (1, True)):
            xy, cov, colors, opacity, H, W = make_scene(seed=seed,
                                                        saturate=saturate)
            proj, bins = setup(xy, cov, H, W)
            ref = rasterize_tiled(proj.xys, proj.conics, colors, opacity,
                                  bins.ids, bins.mask, H, W)
            prep = prepare_raster(proj.xys, proj.conics, colors, opacity,
                                  bins.ids, bins.mask, H, W)
            for tps in (1, 3, 16):
                img = rasterize_prepared_flat(prep, H, W, tiles_per_step=tps)
                np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                                           atol=1e-5, rtol=1e-5)
