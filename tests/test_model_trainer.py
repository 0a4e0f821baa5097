"""Model state-machine (grow/prune) invariants and trainer integration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gaussianimage_plus_tpu.models import (
    GaussianConfig,
    GaussianState,
    effective_cov2d,
    grow,
    init_state,
    prune,
    render,
)
from gaussianimage_plus_tpu.train import TrainConfig, fit_image, init_train_state, train_chunk
from gaussianimage_plus_tpu.core import slv_bound


def small_cfg(**kw):
    defaults = dict(H=32, W=48, max_num_points=64)
    defaults.update(kw)
    return GaussianConfig(**defaults)


class TestInitState:
    def test_layout(self):
        cfg = small_cfg()
        st = init_state(cfg, 20, jax.random.PRNGKey(0))
        assert int(st.num_active) == 20
        assert np.asarray(st.active).sum() == 20
        xy = np.asarray(st.params.xyz)
        assert xy[:, 0].max() <= cfg.W and xy[:, 1].max() <= cfg.H
        lp = float(slv_bound(cfg.H, cfg.W, 20))
        np.testing.assert_allclose(np.asarray(st.bound)[0], [lp, 0.0, lp], rtol=1e-6)

    def test_render_shape(self):
        cfg = small_cfg()
        st = init_state(cfg, 20, jax.random.PRNGKey(0))
        img = render(st, cfg)
        assert img.shape == (cfg.H, cfg.W, 3)
        assert float(jnp.min(img)) >= 0.0 and float(jnp.max(img)) <= 1.0


class TestPrune:
    def test_deactivates_non_psd(self):
        cfg = small_cfg()
        st = init_state(cfg, 30, jax.random.PRNGKey(1))
        # corrupt 5 active rows to be non-PSD even after the bound
        bad = jnp.arange(5)
        cov = st.params.cov2d.at[bad].set(jnp.array([-500.0, 0.0, -500.0]))
        st = st.replace(params=st.params.replace(cov2d=cov))
        st2, n_pruned = prune(st, cfg)
        assert int(n_pruned) == 5
        assert int(st2.num_active) == 25
        assert not np.any(np.asarray(st2.active)[:5])

    def test_guard_all_invalid(self):
        """Reference skips the prune if nothing would remain (:357)."""
        cfg = small_cfg()
        st = init_state(cfg, 10, jax.random.PRNGKey(2))
        cov = jnp.tile(jnp.array([[-1000.0, 0.0, -1000.0]]), (cfg.max_num_points, 1))
        st = st.replace(params=st.params.replace(cov2d=cov))
        st2, n_pruned = prune(st, cfg)
        assert int(st2.num_active) == 10  # untouched
        assert int(n_pruned) == 0


class TestGrow:
    def test_adds_at_error_peaks(self):
        cfg = small_cfg()
        st = init_state(cfg, 10, jax.random.PRNGKey(3))
        gt = jnp.zeros((cfg.H, cfg.W, 3))
        rendered = jnp.zeros((cfg.H, cfg.W, 3))
        # error peak at pixel (y=7, x=33)
        gt = gt.at[7, 33].set(1.0)
        st2, n_added, new_mask = grow(st, cfg, rendered, gt, jax.random.PRNGKey(4),
                                      final_fill=jnp.asarray(False), base_num_samples=4)
        assert int(n_added) >= 1
        # the top-error candidate that survived PSD lands on the peak pixel
        new_rows = np.asarray(st2.params.xyz)[np.asarray(new_mask)]
        assert any(np.allclose(r, [33.0, 7.0]) for r in new_rows)
        assert int(st2.num_active) == 10 + int(n_added)
        # new rows carry the post-growth SLV bound
        lp = float(slv_bound(cfg.H, cfg.W, int(st2.num_active)))
        got = np.asarray(st2.bound)[np.asarray(new_mask)]
        np.testing.assert_allclose(got[:, 0], lp, rtol=1e-6)

    def test_cap_and_final_fill(self):
        cfg = small_cfg(max_num_points=32)
        st = init_state(cfg, 10, jax.random.PRNGKey(5))
        gt = jnp.ones((cfg.H, cfg.W, 3))
        rendered = jnp.zeros_like(gt)
        st2, n_added, _ = grow(st, cfg, rendered, gt, jax.random.PRNGKey(6),
                               final_fill=jnp.asarray(False), base_num_samples=5)
        assert int(n_added) <= 5
        st3, n_added3, _ = grow(st2, cfg, rendered, gt, jax.random.PRNGKey(7),
                                final_fill=jnp.asarray(True))
        # final fill adds up to all remaining slots (minus PSD rejects)
        assert int(st3.num_active) <= 32
        assert int(st3.num_active) >= int(st2.num_active)

    def test_jit_compatible(self):
        cfg = small_cfg()
        st = init_state(cfg, 10, jax.random.PRNGKey(8))
        gt = jnp.ones((cfg.H, cfg.W, 3))
        f = jax.jit(lambda s, k: grow(s, cfg, jnp.zeros_like(gt), gt, k,
                                      final_fill=jnp.asarray(False)))
        st2, n, m = f(st, jax.random.PRNGKey(9))
        assert int(st2.num_active) == 10 + int(n)


class TestTrainer:
    def test_fit_improves(self):
        H, W = 32, 48
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        gt = np.stack([xx / W, yy / H, 0.5 * np.ones_like(xx)], -1)
        cfg = small_cfg()
        tcfg = TrainConfig(iterations=200, grow_iter=100, prune_iter=50, lr=0.02)
        res = fit_image(gt, cfg, tcfg, num_points=30, seed=0)
        assert res.best_psnr > 18.0
        assert np.all(np.diff([float(p) for p in res.history["psnr"][::50]]) > -5)

    def test_inactive_slots_frozen(self):
        cfg = small_cfg()
        tcfg = TrainConfig(iterations=50, grow_iter=1000, prune_iter=50, lr=0.02,
                           adaptive_add=False, prune=False)
        ts = init_train_state(cfg, tcfg, 16, seed=1)
        before = np.asarray(ts.gaussians.params.xyz)[16:]
        gt = jnp.full((cfg.H, cfg.W, 3), 0.7)
        ts2, _ = train_chunk(ts, gt, cfg, tcfg, 50, False, False)
        after = np.asarray(ts2.gaussians.params.xyz)[16:]
        np.testing.assert_array_equal(before, after)

    def test_best_snapshot_monotone(self):
        cfg = small_cfg()
        tcfg = TrainConfig(iterations=100, grow_iter=1000, prune_iter=50, lr=0.02,
                           adaptive_add=False)
        ts = init_train_state(cfg, tcfg, 16, seed=2)
        gt = jnp.full((cfg.H, cfg.W, 3), 0.3)
        ts, m1 = train_chunk(ts, gt, cfg, tcfg, 50, True, False)
        best1 = float(ts.best_psnr)
        ts, m2 = train_chunk(ts, gt, cfg, tcfg, 50, True, False)
        assert float(ts.best_psnr) >= best1
        assert float(ts.best_psnr) >= float(np.max(np.asarray(m2["psnr"])))


class TestPsdClamp:
    def test_projects_to_psd(self):
        from gaussianimage_plus_tpu.models.gaussian_image import psd_clamp
        from gaussianimage_plus_tpu.core import psd_valid_mask
        cfg = small_cfg()
        st = init_state(cfg, 30, jax.random.PRNGKey(7))
        # corrupt: negative variances and huge off-diagonals
        bad = st.params.cov2d.at[:10, 0].set(-50.0).at[10:20, 1].set(100.0)
        p = psd_clamp(st.params.replace(cov2d=bad), st.bound, cfg)
        ok = psd_valid_mask(p.cov2d + st.bound)
        assert bool(jnp.all(ok))

    def test_noop_when_already_psd(self):
        from gaussianimage_plus_tpu.models.gaussian_image import psd_clamp
        cfg = small_cfg()
        st = init_state(cfg, 30, jax.random.PRNGKey(8))
        p = psd_clamp(st.params, st.bound, cfg)
        np.testing.assert_allclose(np.asarray(p.cov2d),
                                   np.asarray(st.params.cov2d), atol=1e-6)

    def test_clamp_mode_trains_without_capacity_loss(self):
        cfg = small_cfg(psd_mode="clamp")
        tcfg = TrainConfig(iterations=100, grow_iter=1000, prune_iter=50, lr=0.05,
                           adaptive_add=False, prune=False)
        ts = init_train_state(cfg, tcfg, 32, seed=3)
        gt = jnp.full((cfg.H, cfg.W, 3), 0.6)
        ts, _ = train_chunk(ts, gt, cfg, tcfg, 100, False, False)
        assert int(ts.gaussians.num_active) == 32
        from gaussianimage_plus_tpu.models import psd_mask_effective
        ok = np.asarray(psd_mask_effective(ts.gaussians, cfg))[:32]
        assert ok.all()


class TestMacroChunk:
    def test_matches_sequential_chunks(self):
        """One macro dispatch (scan of prune chunks + grow) must be
        step-for-step identical to the equivalent train_chunk sequence."""
        from gaussianimage_plus_tpu.train.trainer import train_macro_chunk

        cfg = small_cfg()
        tcfg = TrainConfig(iterations=200, grow_iter=100, prune_iter=50, lr=0.05)
        gt = jnp.asarray(np.random.default_rng(3).uniform(
            0, 1, (cfg.H, cfg.W, 3)).astype(np.float32))
        ts_a = init_train_state(cfg, tcfg, 16, seed=11)
        ts_b = ts_a
        psnrs_a = []
        for ci in range(2):
            do_grow = ci == 1
            ts_a, m = train_chunk(ts_a, gt, cfg, tcfg, 50, True, do_grow, False)
            psnrs_a.append(np.asarray(m["psnr"]))
        ts_b, mb = train_macro_chunk(ts_b, gt, cfg, tcfg, 2, 50, True, True, False)
        np.testing.assert_allclose(np.concatenate(psnrs_a),
                                   np.asarray(mb["psnr"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ts_a.gaussians.params.xyz),
                                   np.asarray(ts_b.gaussians.params.xyz),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ts_a.gaussians.active),
                                      np.asarray(ts_b.gaussians.active))
        assert float(ts_a.best_psnr) == pytest.approx(float(ts_b.best_psnr), abs=1e-5)


class TestDispatchBound:
    def test_max_dispatch_steps_is_transparent(self):
        """fit_image with a dispatch bound that splits each grow period must
        produce exactly the same result as the unbounded schedule (a single
        >60s device execution kills the TPU worker through the relay, so
        long fits are split; the split must be semantics-free)."""
        from gaussianimage_plus_tpu.train.trainer import fit_image

        cfg = small_cfg()
        gt = jnp.asarray(np.random.default_rng(5).uniform(
            0, 1, (cfg.H, cfg.W, 3)).astype(np.float32))
        big = TrainConfig(iterations=400, grow_iter=200, prune_iter=50,
                          lr=0.05, max_dispatch_steps=2500)
        small = big.replace(max_dispatch_steps=100)
        res_a = fit_image(gt, cfg, big, num_points=16, seed=7)
        res_b = fit_image(gt, cfg, small, num_points=16, seed=7)
        np.testing.assert_array_equal(np.asarray(res_a.state.params.xyz),
                                      np.asarray(res_b.state.params.xyz))
        assert res_a.best_psnr == res_b.best_psnr


class TestFitResume:
    def test_kill_and_resume_matches_uninterrupted(self, tmp_path):
        """A fit stopped mid-way and resumed from its checkpoint must land on
        the same result as an uninterrupted fit (backend-abort recovery)."""
        from gaussianimage_plus_tpu.train.trainer import fit_image

        cfg = small_cfg()
        tcfg = TrainConfig(iterations=200, grow_iter=100, prune_iter=50, lr=0.05)
        gt = np.random.default_rng(5).uniform(
            0, 1, (cfg.H, cfg.W, 3)).astype(np.float32)
        res_full = fit_image(gt, cfg, tcfg, num_points=16, seed=9)
        ck = str(tmp_path / "ck")
        res_half = fit_image(gt, cfg, tcfg, num_points=16, seed=9,
                             checkpoint_dir=ck, checkpoint_every=100,
                             stop_after_iter=100)
        res_resumed = fit_image(gt, cfg, tcfg, num_points=16, seed=9,
                                checkpoint_dir=ck, resume=True)
        assert res_resumed.best_psnr == pytest.approx(res_full.best_psnr, abs=1e-4)
        np.testing.assert_allclose(np.asarray(res_resumed.state.params.xyz),
                                   np.asarray(res_full.state.params.xyz),
                                   atol=1e-5)

    def test_resume_on_completed_run_returns_fitted_result(self, tmp_path):
        """fit_image(resume=True) on an already-COMPLETED run (the final
        checkpoint records next_iter == iterations) must return the fitted
        best instead of crashing — a watchdog-retried sweep that died between
        fit completion and its JSONL append lands exactly here."""
        from gaussianimage_plus_tpu.train.trainer import fit_image

        cfg = small_cfg()
        tcfg = TrainConfig(iterations=200, grow_iter=100, prune_iter=50, lr=0.05)
        gt = np.random.default_rng(5).uniform(
            0, 1, (cfg.H, cfg.W, 3)).astype(np.float32)
        ck = str(tmp_path / "ck")
        res_full = fit_image(gt, cfg, tcfg, num_points=16, seed=9,
                             checkpoint_dir=ck, checkpoint_every=100)
        res_retry = fit_image(gt, cfg, tcfg, num_points=16, seed=9,
                              checkpoint_dir=ck, resume=True)
        assert res_retry.best_psnr == pytest.approx(res_full.best_psnr, abs=1e-6)
        np.testing.assert_array_equal(np.asarray(res_retry.state.params.xyz),
                                      np.asarray(res_full.state.params.xyz))
        assert res_retry.history["psnr"].shape == (0,)


class TestColorReg:
    def test_zero_reg_is_reference_parity(self):
        """color_reg=0 must be bit-identical to the unregularized step."""
        cfg = small_cfg()
        gt = jnp.asarray(np.random.default_rng(9).uniform(
            0, 1, (cfg.H, cfg.W, 3)).astype(np.float32))
        a = fit_via(cfg, gt, color_reg=0.0)
        b = fit_via(cfg, gt)  # field default
        np.testing.assert_array_equal(a, b)

    def test_reg_shrinks_color_norm(self):
        cfg = small_cfg()
        gt = jnp.asarray(np.random.default_rng(9).uniform(
            0, 1, (cfg.H, cfg.W, 3)).astype(np.float32))
        base = fit_via(cfg, gt, ret="colors")
        reg = fit_via(cfg, gt, color_reg=1e-2, ret="colors")
        assert float(np.square(reg).mean()) < float(np.square(base).mean())


def fit_via(cfg, gt, ret="xyz", **tkw):
    from gaussianimage_plus_tpu.train.trainer import fit_image
    from gaussianimage_plus_tpu.models.gaussian_image import colors_of

    tcfg = TrainConfig(iterations=200, grow_iter=100, prune_iter=50, lr=0.05,
                       **tkw)
    res = fit_image(gt, cfg, tcfg, num_points=16, seed=3)
    if ret == "colors":
        act = np.asarray(res.state.active)
        return np.asarray(colors_of(res.state.params, cfg))[act]
    return np.asarray(res.state.params.xyz)
