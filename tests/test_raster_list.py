"""Chunk-list rasterizer pair (interpret mode on CPU) vs the dense oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussianimage_plus_tpu.core import project_gaussians_2d_covariance
from gaussianimage_plus_tpu.core.binning import morton_perm
from gaussianimage_plus_tpu.kernels.raster_dense_pallas import (
    rasterize_dense, rasterize_dense_pallas)
from gaussianimage_plus_tpu.kernels.raster_list_pallas import (
    list_backward, rasterize_list, rasterize_list_pallas)

from test_raster_pallas import make_scene


def _perm_proj(proj, perm):
    return proj._replace(
        xys=proj.xys[perm], conics=proj.conics[perm],
        radii=proj.radii[perm], num_tiles_hit=proj.num_tiles_hit[perm],
        valid=proj.valid[perm])


class TestListForward:
    def test_matches_dense(self):
        xy, cov, colors, opacity, H, W = make_scene(n=150, seed=31)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        img_l = rasterize_list_pallas(proj, colors, opacity, H, W, kc=32)
        img_d = rasterize_dense_pallas(proj, colors, opacity, H, W)
        np.testing.assert_allclose(np.asarray(img_l), np.asarray(img_d),
                                   atol=1e-5, rtol=1e-5)

    def test_matches_dense_morton(self):
        xy, cov, colors, opacity, H, W = make_scene(n=120, seed=32)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        img_d = rasterize_dense_pallas(proj, colors, opacity, H, W)
        perm = morton_perm(proj.xys, proj.valid, H, W)
        img_l = rasterize_list_pallas(_perm_proj(proj, perm), colors[perm],
                                      opacity[perm], H, W, kc=32)
        np.testing.assert_allclose(np.asarray(img_l), np.asarray(img_d),
                                   atol=2e-5, rtol=1e-5)

    def test_residual_interval_exact(self):
        """lmax=1 overflows every busy tile — the residual [lo2, hi2)
        interval must keep the render exact (never silently truncate)."""
        xy, cov, colors, opacity, H, W = make_scene(n=150, seed=33)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        img_l = rasterize_list_pallas(proj, colors, opacity, H, W,
                                      kc=16, lmax=1)
        img_d = rasterize_dense_pallas(proj, colors, opacity, H, W)
        np.testing.assert_allclose(np.asarray(img_l), np.asarray(img_d),
                                   atol=1e-5, rtol=1e-5)

    def test_lane_major_matches_dense(self):
        """The transposed-layout ([*, kc] lane-major) list kernel is the
        same math in a different vreg layout — must match the dense oracle
        in id order AND Morton order, including the residual interval."""
        from gaussianimage_plus_tpu.kernels.raster_list_pallas import (
            rasterize_list_t_pallas)
        xy, cov, colors, opacity, H, W = make_scene(n=150, seed=39)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        img_d = rasterize_dense_pallas(proj, colors, opacity, H, W)
        img_t = rasterize_list_t_pallas(proj, colors, opacity, H, W, kc=32)
        np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_d),
                                   atol=1e-5, rtol=1e-5)
        perm = morton_perm(proj.xys, proj.valid, H, W)
        img_tm = rasterize_list_t_pallas(_perm_proj(proj, perm), colors[perm],
                                         opacity[perm], H, W, kc=32, lmax=1)
        np.testing.assert_allclose(np.asarray(img_tm), np.asarray(img_d),
                                   atol=2e-5, rtol=1e-5)

    def test_striped_forward_exact(self):
        """Forcing a tiny SMEM list budget splits the forward into several
        tile-stripe pallas_calls — must stay exact (the 2K fix: >64K-element
        SMEM prefetch arrays fail server-side compile)."""
        from gaussianimage_plus_tpu.kernels import raster_list_pallas as rlp
        xy, cov, colors, opacity, H, W = make_scene(n=120, seed=41)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        img_d = rasterize_dense_pallas(proj, colors, opacity, H, W)
        old = rlp.SMEM_LIST_ELEMS
        try:
            rlp.SMEM_LIST_ELEMS = 16  # stripe = 1-2 tile blocks
            img_s = rasterize_list_pallas(proj, colors, opacity, H, W, kc=32)
            img_st = rlp.rasterize_list_t_pallas(proj, colors, opacity,
                                                 H, W, kc=32)
        finally:
            rlp.SMEM_LIST_ELEMS = old
        np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_d),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(img_st), np.asarray(img_d),
                                   atol=1e-5, rtol=1e-5)

    def test_invalid_culled(self):
        xy, cov, colors, opacity, H, W = make_scene(n=20, seed=34)
        cov = cov.at[0].set(jnp.array([1.0, 2.0, 1.0]))  # det<0 -> invalid
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        img_l = rasterize_list_pallas(proj, colors, opacity, H, W, kc=16)
        img_d = rasterize_dense_pallas(proj, colors, opacity, H, W)
        assert np.isfinite(np.asarray(img_l)).all()
        np.testing.assert_allclose(np.asarray(img_l), np.asarray(img_d),
                                   atol=1e-5, rtol=1e-5)


class TestListVJP:
    def _grads(self, raster, proj, colors, opacity, H, W, seed=7):
        rng = np.random.default_rng(seed)
        cot = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))

        def f(xys, conics, cols, opac):
            return raster(xys, conics, cols, opac, proj.radii, proj.valid,
                          H, W)

        _, vjp = jax.vjp(f, proj.xys, proj.conics, colors, opacity)
        return vjp(cot)

    def test_list_grads_match_dense(self):
        xy, cov, colors, opacity, H, W = make_scene(n=150, seed=35)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        g_l = self._grads(rasterize_list, proj, colors, opacity, H, W)
        g_d = self._grads(rasterize_dense, proj, colors, opacity, H, W)
        # accumulation-order-limited agreement (dense: per-chunk acc over
        # all tiles; list: per-chunk acc over listed tile-blocks)
        for a, b, name in zip(g_l, g_d, ["xys", "conics", "colors", "opacity"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4, err_msg=name)

    def test_list_grads_match_dense_morton(self):
        xy, cov, colors, opacity, H, W = make_scene(n=120, seed=36)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        perm = morton_perm(proj.xys, proj.valid, H, W)
        proj_p = _perm_proj(proj, perm)
        g_l = self._grads(rasterize_list, proj_p, colors[perm],
                          opacity[perm], H, W)
        g_d = self._grads(rasterize_dense, proj_p, colors[perm],
                          opacity[perm], H, W)
        for a, b, name in zip(g_l, g_d, ["xys", "conics", "colors", "opacity"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4, err_msg=name)

    def test_lane_major_grads_match_dense(self):
        """rasterize_list_t's fwd+bwd (lane-major bodies) must agree with
        the dense pair to accumulation-order limits."""
        from gaussianimage_plus_tpu.kernels.raster_list_pallas import (
            rasterize_list_t)
        xy, cov, colors, opacity, H, W = make_scene(n=120, seed=40)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        perm = morton_perm(proj.xys, proj.valid, H, W)
        proj_p = _perm_proj(proj, perm)
        g_t = self._grads(rasterize_list_t, proj_p, colors[perm],
                          opacity[perm], H, W)
        g_d = self._grads(rasterize_dense, proj_p, colors[perm],
                          opacity[perm], H, W)
        for a, b, name in zip(g_t, g_d, ["xys", "conics", "colors", "opacity"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4, err_msg=name)

    def test_backward_overflow_falls_back_dense(self):
        """mtb=1 overflows every chunk — the lax.cond fallback must keep
        gradients exact."""
        from gaussianimage_plus_tpu.kernels.raster_dense_pallas import (
            dense_backward)
        xy, cov, colors, opacity, H, W = make_scene(n=80, seed=37)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        rng = np.random.default_rng(5)
        v_img = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))
        g_l = list_backward(proj, colors, opacity, v_img, H, W, kc=16, mtb=1)
        g_d = dense_backward(proj, colors, opacity, v_img, H, W)
        for a, b, name in zip(g_l, g_d, ["xys", "conics", "colors", "opacity"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6, err_msg=name)

    def test_backward_small_mtb_no_overflow(self):
        """A small-but-sufficient mtb exercises the clamped prefetch-indexed
        streaming path (tcnt < mtb for some chunks, == for others)."""
        from gaussianimage_plus_tpu.kernels.raster_dense_pallas import (
            dense_backward)
        xy, cov, colors, opacity, H, W = make_scene(n=60, seed=38)
        proj = project_gaussians_2d_covariance(xy, cov, H, W)
        rng = np.random.default_rng(6)
        v_img = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))
        g_l = list_backward(proj, colors, opacity, v_img, H, W, kc=16,
                            mtb=60)  # T/tb at 48x80 is 30 blocks: no overflow
        g_d = dense_backward(proj, colors, opacity, v_img, H, W)
        for a, b, name in zip(g_l, g_d, ["xys", "conics", "colors", "opacity"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4, err_msg=name)


class TestListBackend:
    def test_list_backend_trains(self):
        """One fit through raster_backend='list' matches the dense backend
        step-for-step (same seeds, same recipe)."""
        import dataclasses

        from gaussianimage_plus_tpu.models import GaussianConfig
        from gaussianimage_plus_tpu.train import TrainConfig
        from gaussianimage_plus_tpu.train.trainer import (init_train_state,
                                                          train_chunk)

        H, W = 48, 64
        gt = jnp.asarray(np.random.default_rng(3).uniform(
            0, 1, (H, W, 3)).astype(np.float32))
        tcfg = TrainConfig(iterations=60, grow_iter=30, prune_iter=30, lr=0.02)
        psnrs = {}
        for backend in ("dense", "list"):
            cfg = GaussianConfig(H=H, W=W, max_num_points=64, tile_cap=48,
                                 raster_backend=backend)
            ts = init_train_state(cfg, tcfg, 32, seed=0)
            ts, logs = train_chunk(ts, gt, cfg, tcfg, 60, True, False)
            psnrs[backend] = float(logs["psnr"][-1])
        assert abs(psnrs["list"] - psnrs["dense"]) < 1e-3, psnrs

    def test_list_decode_backend(self):
        """decompress_wo_ec(backend='list') == binned decode."""
        from gaussianimage_plus_tpu.compress import (
            QuantConfig, compress_wo_ec, decompress_wo_ec, init_quantizers)
        from gaussianimage_plus_tpu.compress.pipeline import morton_reorder
        from gaussianimage_plus_tpu.models import GaussianConfig
        from gaussianimage_plus_tpu.train import TrainConfig
        from gaussianimage_plus_tpu.train.trainer import (init_train_state,
                                                          train_chunk)

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
                               backend="list")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


class TestBackendResolution:
    """resolve_backend ('auto' semantics) + grid-aware lmax defaults."""

    def test_auto_resolves_xla_off_tpu(self):
        from gaussianimage_plus_tpu.models import GaussianConfig, resolve_backend
        cfg = GaussianConfig(H=64, W=64, max_num_points=32)
        assert jax.default_backend() == "cpu"
        assert resolve_backend(cfg) == "xla"

    def test_explicit_backends_pass_through(self):
        from gaussianimage_plus_tpu.models import GaussianConfig, resolve_backend
        for b in ("pallas", "xla", "dense", "sweep", "list", "list_t"):
            cfg = GaussianConfig(H=64, W=64, max_num_points=32,
                                 raster_backend=b)
            assert resolve_backend(cfg) == b

    def test_auto_divisibility_guard_on_tpu(self, monkeypatch):
        # fake a TPU platform: list_t only when T % TB_T == 0
        from gaussianimage_plus_tpu.models import GaussianConfig
        from gaussianimage_plus_tpu.models import gaussian_image as gi
        from gaussianimage_plus_tpu.kernels.raster_list_pallas import TB_T
        monkeypatch.setattr(gi.jax, "default_backend", lambda: "tpu")
        cfg_even = GaussianConfig(H=512, W=768, max_num_points=64)   # T=1536
        assert 1536 % TB_T == 0
        assert gi.resolve_backend(cfg_even) == "list_t"
        cfg_odd = GaussianConfig(H=48, W=48, max_num_points=64)      # T=9
        assert 9 % TB_T != 0
        assert gi.resolve_backend(cfg_odd) == "pallas"

    def test_grid_aware_lmax_default(self):
        from gaussianimage_plus_tpu.kernels.raster_list_pallas import (
            BIG_T, LMAX, LMAX_BIG, _default_lmax)
        assert _default_lmax(512, 768, 16, 16) == LMAX        # T=1536
        assert _default_lmax(1344, 2040, 16, 16) == LMAX_BIG  # T=10752
        assert BIG_T <= 10752

    def test_trainer_resorts_through_auto(self, monkeypatch):
        # the id-order trap: auto->list_t must trigger the Morton resort
        from gaussianimage_plus_tpu.models import GaussianConfig
        from gaussianimage_plus_tpu.models import gaussian_image as gi
        from gaussianimage_plus_tpu.train import trainer as tr
        monkeypatch.setattr(gi.jax, "default_backend", lambda: "tpu")
        cfg = GaussianConfig(H=512, W=768, max_num_points=64)
        assert gi.resolve_backend(cfg) in ("sweep", "list", "list_t")
