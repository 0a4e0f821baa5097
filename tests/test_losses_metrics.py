"""Losses/metrics vs scipy oracles and closed forms."""

import numpy as np
import jax.numpy as jnp
import scipy.ndimage

from gaussianimage_plus_tpu.train import loss_fn, ms_ssim, psnr, ssim
from gaussianimage_plus_tpu.train.metrics import clamped_psnr


def scipy_ssim(x, y, win_size=11, sigma=1.5, data_range=1.0):
    """Gaussian-window SSIM oracle on [H, W] single channel."""
    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    t = np.arange(win_size) - (win_size - 1) / 2.0
    g = np.exp(-t * t / (2 * sigma * sigma))
    g /= g.sum()
    win = np.outer(g, g)

    def filt(a):
        full = scipy.ndimage.correlate(a, win, mode="constant")
        r = (win_size - 1) // 2
        return full[r:-r, r:-r]

    mx, my = filt(x), filt(y)
    sxx = filt(x * x) - mx * mx
    syy = filt(y * y) - my * my
    sxy = filt(x * y) - mx * my
    num = (2 * mx * my + C1) * (2 * sxy + C2)
    den = (mx * mx + my * my + C1) * (sxx + syy + C2)
    return np.mean(num / den)


class TestSSIM:
    def test_vs_scipy(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (40, 40)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.1, (40, 40)), 0, 1).astype(np.float32)
        ours = float(ssim(jnp.asarray(x)[..., None], jnp.asarray(y)[..., None]))
        ref = scipy_ssim(x, y)
        assert np.isclose(ours, ref, atol=2e-5)

    def test_identity(self):
        x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (32, 32, 3)).astype(np.float32))
        assert float(ssim(x, x)) > 0.9999
        assert float(ms_ssim(x, x)) > 0.999

    def test_ms_ssim_small_image_finite(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(0, 1, (64, 96, 3)).astype(np.float32))
        y = jnp.asarray(rng.uniform(0, 1, (64, 96, 3)).astype(np.float32))
        v = float(ms_ssim(x, y))
        assert np.isfinite(v) and 0.0 <= v <= 1.0


class TestLossDispatch:
    def test_l2_l1(self):
        rng = np.random.default_rng(3)
        p = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
        t = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
        assert np.isclose(float(loss_fn(p, t, "L2")), float(jnp.mean((p - t) ** 2)))
        assert np.isclose(float(loss_fn(p, t, "L1")), float(jnp.mean(jnp.abs(p - t))))

    def test_fusion3(self):
        rng = np.random.default_rng(4)
        p = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
        t = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
        expect = 0.7 * float(jnp.mean((p - t) ** 2)) + 0.3 * float(jnp.mean(jnp.abs(p - t)))
        assert np.isclose(float(loss_fn(p, t, "Fusion3")), expect, rtol=1e-6)


class TestPSNR:
    def test_formula(self):
        p = jnp.full((4, 4, 3), 0.5)
        t = jnp.full((4, 4, 3), 0.6)
        assert np.isclose(float(psnr(p, t)), 10 * np.log10(1.0 / 0.01), atol=1e-3)

    def test_clamped(self):
        p = jnp.zeros((2, 2, 3))
        t = jnp.ones((2, 2, 3))
        assert np.isclose(float(clamped_psnr(p, t)), 0.0, atol=1e-4)


def test_avg_pool2_matches_torch_odd_dims():
    """pytorch_msssim downsample = F.avg_pool2d(kernel=2, padding=dim%2,
    count_include_pad=True); must match bitwise on odd and even dims."""
    import torch
    import torch.nn.functional as F
    from gaussianimage_plus_tpu.train.losses import _avg_pool2

    rng = np.random.default_rng(7)
    for H, W in ((7, 9), (8, 9), (7, 8), (8, 8)):
        x = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
        ref = F.avg_pool2d(torch.tensor(x).permute(0, 3, 1, 2), kernel_size=2,
                           padding=(H % 2, W % 2)).permute(0, 2, 3, 1).numpy()
        got = np.asarray(_avg_pool2(jnp.asarray(x)))
        np.testing.assert_array_equal(ref, got)
