"""LPIPS architecture parity vs an independent torch mirror.

Pretrained weights are unavailable offline, so these tests prove the JAX
implementation computes exactly the lpips-package forward for ANY weights:
a torch mirror built from torch.nn primitives (the same ones the package
uses) is run with identical random weights and must agree to float
tolerance. With the real VGG+lin weights dropped in via params_from_npz /
params_from_torch, the metric is the real LPIPS with no code change.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussianimage_plus_tpu.train.lpips import (
    LIN_CHANNELS,
    POOL_BEFORE,
    SLICE_ENDS,
    VGG_CHANNELS,
    lpips,
    params_from_npz,
    random_params,
    save_npz,
)

torch = pytest.importorskip("torch")


def torch_lpips_mirror(params, im0, im1):
    """lpips.LPIPS(net='vgg', eval mode) re-derived from the package source
    with explicit torch ops; weights injected instead of pretrained."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def prep(im):
        x = torch.tensor(np.asarray(im)).permute(2, 0, 1)[None]
        x = 2.0 * x - 1.0
        return (x - shift) / scale

    def slices(x):
        feats = []
        for i in range(13):
            if i in POOL_BEFORE:
                x = F.max_pool2d(x, 2, 2)
            w = torch.tensor(np.asarray(params.conv_w[i]))
            b = torch.tensor(np.asarray(params.conv_b[i]))
            x = F.relu(F.conv2d(x, w, b, padding=1))
            if i in SLICE_ENDS:
                feats.append(x)
        return feats

    def unit_norm(x):
        n = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
        return x / (n + 1e-10)

    f0, f1 = slices(prep(im0)), slices(prep(im1))
    total = torch.zeros(())
    for a, b, lw in zip(f0, f1, params.lin_w):
        d = (unit_norm(a) - unit_norm(b)) ** 2
        w = torch.tensor(np.asarray(lw)).view(1, -1, 1, 1)
        total = total + F.conv2d(d, w).mean()
    return float(total)


class TestLPIPS:
    def setup_method(self, _):
        self.params = random_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        self.im0 = rng.uniform(0, 1, (33, 47, 3)).astype(np.float32)
        self.im1 = rng.uniform(0, 1, (33, 47, 3)).astype(np.float32)

    def test_matches_torch_mirror(self):
        got = float(lpips(jnp.asarray(self.im0), jnp.asarray(self.im1),
                          self.params))
        ref = torch_lpips_mirror(self.params, self.im0, self.im1)
        assert got == pytest.approx(ref, rel=1e-4, abs=1e-6)

    def test_identity_is_zero_and_symmetric(self):
        a, b = jnp.asarray(self.im0), jnp.asarray(self.im1)
        assert float(lpips(a, a, self.params)) == pytest.approx(0.0, abs=1e-7)
        assert float(lpips(a, b, self.params)) == pytest.approx(
            float(lpips(b, a, self.params)), rel=1e-5)
        assert float(lpips(a, b, self.params)) > 0.0

    def test_architecture_shapes(self):
        assert len(self.params.conv_w) == len(VGG_CHANNELS) == 13
        for w, c in zip(self.params.conv_w, VGG_CHANNELS):
            assert w.shape[0] == c and w.shape[2:] == (3, 3)
        assert tuple(w.shape[0] for w in self.params.lin_w) == LIN_CHANNELS

    def test_committed_fixture(self):
        """Pin vs a COMMITTED torch-mirror output (tests/fixtures/) so the
        numeric contract holds even where torch is absent; real-weight
        validation stays environment-gated (no pretrained VGG offline —
        same gate as the reference's `pip install lpips` download,
        models/metrics.py:48-117)."""
        import pathlib
        fx = np.load(pathlib.Path(__file__).parent / "fixtures"
                     / "lpips_fixture.npz")
        params = random_params(jax.random.PRNGKey(int(fx["seed"])))
        got = float(lpips(jnp.asarray(fx["im0"]), jnp.asarray(fx["im1"]),
                          params))
        assert got == pytest.approx(float(fx["expected_torch"]),
                                    rel=1e-4, abs=1e-6)

    def test_npz_round_trip(self, tmp_path):
        p = str(tmp_path / "w.npz")
        save_npz(p, self.params)
        loaded = params_from_npz(p)
        got = float(lpips(jnp.asarray(self.im0), jnp.asarray(self.im1), loaded))
        ref = float(lpips(jnp.asarray(self.im0), jnp.asarray(self.im1),
                          self.params))
        assert got == pytest.approx(ref, rel=1e-6)
