"""Adan optimizer vs a numpy re-derivation of the reference update."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussianimage_plus_tpu.train.optim import adan


def numpy_adan_steps(x0, grads, lr=0.01, betas=(0.98, 0.92, 0.99), eps=1e-8,
                     wd=0.0):
    """_single_tensor_adan (optimizer.py:237-294), no_prox=False, no clip."""
    b1, b2, b3 = betas
    m = np.zeros_like(x0); n = np.zeros_like(x0); d = np.zeros_like(x0)
    prev = None
    x = x0.copy()
    for t, g in enumerate(grads, start=1):
        if prev is None:
            prev = g.copy()  # step 1: neg_pre_grad = -g -> diff = 0
        diff = g - prev
        m = b1 * m + (1 - b1) * g
        d = b2 * d + (1 - b2) * diff
        gd = g + b2 * diff
        n = b3 * n + (1 - b3) * gd * gd
        bc1 = 1 - b1 ** t; bc2 = 1 - b2 ** t; bc3s = np.sqrt(1 - b3 ** t)
        denom = np.sqrt(n) / bc3s + eps
        x = x - (lr / bc1) * m / denom - (lr * b2 / bc2) * d / denom
        x = x / (1 + lr * wd)
        prev = g.copy()
    return x


class TestAdan:
    def test_matches_reference_math(self):
        rng = np.random.default_rng(0)
        x0 = rng.normal(size=(6,)).astype(np.float32)
        grads = [rng.normal(size=(6,)).astype(np.float32) for _ in range(5)]

        tx = adan(0.01, weight_decay=0.003)
        params = jnp.asarray(x0)
        st = tx.init(params)
        for g in grads:
            upd, st = tx.update(jnp.asarray(g), st, params)
            params = params + upd
        expected = numpy_adan_steps(x0, grads, lr=0.01, wd=0.003)
        np.testing.assert_allclose(np.asarray(params), expected, rtol=2e-4, atol=1e-6)

    def test_trains(self):
        tx = adan(0.1)
        x = jnp.array([5.0, -3.0])
        st = tx.init(x)
        for _ in range(200):
            g = 2 * x
            upd, st = tx.update(g, st, x)
            x = x + upd
        assert float(jnp.abs(x).max()) < 1.0  # converging from 5.0
