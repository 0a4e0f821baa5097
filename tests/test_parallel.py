"""Mesh parallelism on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianimage_plus_tpu.models import GaussianConfig, init_state, render
from gaussianimage_plus_tpu.train import TrainConfig
from gaussianimage_plus_tpu.train.trainer import init_train_state, train_chunk
from gaussianimage_plus_tpu.parallel import (
    batch_train_chunk,
    batch_train_chunk_dp,
    fit_batch,
    fit_image_tile_sharded,
    init_batch_train_state,
    make_mesh,
    make_tile_sharded_render,
    shard_batch,
)

needs_devices = pytest.mark.skipif(len(jax.devices()) < 8,
                                   reason="needs 8 virtual devices")


def tiny_setup(B=8, H=32, W=64):
    cfg = GaussianConfig(H=H, W=W, max_num_points=64, tile_cap=32)
    tcfg = TrainConfig(iterations=100, grow_iter=50, prune_iter=50, lr=0.02)
    rng = np.random.default_rng(0)
    gts = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    return cfg, tcfg, gts


class TestDataParallel:
    @needs_devices
    def test_sharded_matches_unsharded(self):
        cfg, tcfg, gts = tiny_setup()
        tss0 = init_batch_train_state(cfg, tcfg, 32, 8, seed=5)
        # unsharded
        out_a, m_a = batch_train_chunk(tss0, gts, cfg, tcfg, 10, True, False)
        # sharded over 8 devices
        mesh = make_mesh((8,), ("data",))
        tss_s = shard_batch(tss0, mesh)
        gts_s = shard_batch(gts, mesh)
        out_b, m_b = batch_train_chunk(tss_s, gts_s, cfg, tcfg, 10, True, False)
        np.testing.assert_allclose(np.asarray(out_a.gaussians.params.xyz),
                                   np.asarray(out_b.gaussians.params.xyz),
                                   atol=1e-5)

    @needs_devices
    def test_dp_shardmap_matches_vmap(self):
        """The per-device-unbatched DP chunk must equal the vmapped one
        (including prune + grow, which exercise scatter/top_k per image)."""
        cfg, tcfg, gts = tiny_setup()
        mesh = make_mesh((8,), ("data",))
        tss0 = init_batch_train_state(cfg, tcfg, 32, 8, seed=5)
        out_a, m_a = batch_train_chunk(tss0, gts, cfg, tcfg, 10, True, True)
        tss_s = shard_batch(tss0, mesh)
        gts_s = shard_batch(gts, mesh)
        out_b, m_b = batch_train_chunk_dp(tss_s, gts_s, cfg, tcfg, 10, True,
                                          True, False, mesh)
        for get in (lambda o: o.gaussians.params.xyz,
                    lambda o: o.gaussians.params.cov2d,
                    lambda o: o.gaussians.active,
                    lambda o: o.best_psnr):
            np.testing.assert_allclose(np.asarray(get(out_a)),
                                       np.asarray(get(out_b)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(m_a["psnr"]),
                                   np.asarray(m_b["psnr"]), atol=1e-4)

    @needs_devices
    def test_fit_batch_runs(self):
        cfg, tcfg, gts = tiny_setup()
        mesh = make_mesh((8,), ("data",))
        tss = fit_batch(gts, cfg, tcfg, num_points=32, mesh=mesh, seed=1)
        psnrs = np.asarray(tss.best_psnr)
        assert psnrs.shape == (8,)
        assert np.isfinite(psnrs).all() and (psnrs > 5).all()


class TestTileSharded:
    @needs_devices
    @pytest.mark.parametrize("H,W", [(32, 64), (30, 52)])
    def test_render_matches_unsharded(self, H, W):
        """Sharded render == unsharded render, incl. non-multiple-of-16 dims
        (the padded tiles are cropped before anything sees them)."""
        cfg, _, _ = tiny_setup(H=H, W=W)
        mesh = make_mesh((4,), ("tile",))
        state = init_state(cfg, 32, jax.random.PRNGKey(2))
        render_fn = make_tile_sharded_render(mesh, cfg, axis="tile")
        img_s = jax.jit(lambda s: render_fn(s, cfg))(state)
        img_r = jax.jit(lambda s: render(s, cfg))(state)
        assert img_s.shape == (H, W, 3)
        np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_r),
                                   atol=1e-5)

    @needs_devices
    @pytest.mark.parametrize("H,W", [(32, 64), (30, 52)])
    def test_render_matches_unsharded_hier(self, H, W):
        """Sharded render with the row-band hier binner (the 2K composition,
        bin_gaussian_rows_hier) == unsharded render."""
        import dataclasses
        cfg, _, _ = tiny_setup(H=H, W=W)
        cfg = dataclasses.replace(cfg, bin_method="hier")
        mesh = make_mesh((4,), ("tile",))
        state = init_state(cfg, 32, jax.random.PRNGKey(2))
        render_fn = make_tile_sharded_render(mesh, cfg, axis="tile")
        img_s = jax.jit(lambda s: render_fn(s, cfg))(state)
        img_r = jax.jit(lambda s: render(
            s, dataclasses.replace(cfg, bin_method="top_k")))(state)
        np.testing.assert_allclose(np.asarray(img_s), np.asarray(img_r),
                                   atol=1e-5)

    @needs_devices
    @pytest.mark.parametrize("H,W", [(32, 64), (30, 52)])
    def test_full_chunk_parity_with_grow_prune(self, H, W):
        """Tile-sharded train_chunk (grow + prune + best snapshot) must track
        the unsharded chunk, including covariance gradients (the halved-c2
        cotangent convention) and odd image sizes (ADVICE #1: padded pixels
        must not leak into the loss)."""
        cfg, tcfg, gts = tiny_setup(H=H, W=W)
        gt = gts[0]
        mesh = make_mesh((4,), ("tile",))
        render_fn = make_tile_sharded_render(mesh, cfg, axis="tile")
        ts0 = init_train_state(cfg, tcfg, 32, seed=7)
        out_a, m_a = train_chunk(ts0, gt, cfg, tcfg, 50, True, True)
        out_b, m_b = train_chunk(ts0, gt, cfg, tcfg, 50, True, True,
                                 render_fn=render_fn)
        np.testing.assert_allclose(np.asarray(m_a["psnr"]),
                                   np.asarray(m_b["psnr"]), atol=1e-3)
        np.testing.assert_allclose(np.asarray(out_a.gaussians.params.xyz),
                                   np.asarray(out_b.gaussians.params.xyz),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(out_a.gaussians.params.cov2d),
                                   np.asarray(out_b.gaussians.params.cov2d),
                                   atol=2e-4)
        np.testing.assert_array_equal(np.asarray(out_a.gaussians.active),
                                      np.asarray(out_b.gaussians.active))

    @needs_devices
    def test_fit_image_tile_sharded(self):
        """End-to-end sharded fit improves PSNR and returns a usable state."""
        cfg, tcfg, gts = tiny_setup()
        mesh = make_mesh((2,), ("tile",))
        res = fit_image_tile_sharded(gts[0], cfg, tcfg, num_points=32,
                                     mesh=mesh, seed=3)
        assert res.best_psnr > 10.0
