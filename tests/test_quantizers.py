"""Quantizer semantics vs closed-form expectations (quantize.py parity)."""

import numpy as np
import jax
import jax.numpy as jnp

from gaussianimage_plus_tpu.compress import (
    ResidualVQState,
    fake_quantize_half,
    hybrid_compress,
    hybrid_decompress,
    hybrid_forward,
    hybrid_init,
    hybrid_size,
    init_residual_vq,
    log_compress,
    log_decompress,
    log_forward,
    residual_vq_decode,
    residual_vq_forward,
    uniform_compress,
    uniform_decompress,
    uniform_forward,
    uniform_init,
)


class TestUniform:
    def test_init_formula(self):
        x = jnp.array([[0.0, 10.0], [4.0, 30.0], [2.0, 20.0]])
        p = uniform_init(x, bits=4)  # qmax 15
        np.testing.assert_allclose(np.asarray(p.scale), [4 / 15, 20 / 15], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p.beta), [0.0, 10.0], rtol=1e-6)

    def test_roundtrip_error_bound(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-5, 5, (500, 2)).astype(np.float32))
        p = uniform_init(x, bits=8)
        dq, code = uniform_compress(p, x, bits=8)
        # max error = scale/2 per channel
        err = np.abs(np.asarray(dq - x))
        assert (err <= np.asarray(p.scale)[None, :] / 2 + 1e-6).all()
        # decompress(code) == dq
        np.testing.assert_allclose(np.asarray(uniform_decompress(p, code)),
                                   np.asarray(dq), rtol=1e-6)
        assert np.asarray(code).min() >= 0 and np.asarray(code).max() <= 255

    def test_ste_gradient(self):
        x = jnp.array([[1.234]])
        p = uniform_init(jnp.array([[0.0], [10.0]]), bits=8)

        def f(x):
            dq, _ = uniform_forward(p, x, bits=8)
            return jnp.sum(dq)

        # inside the clamp range, STE grad wrt x is exactly 1
        g = float(jax.grad(f)(x)[0, 0])
        assert np.isclose(g, 1.0, atol=1e-6)

    def test_scale_beta_gradients_flow(self):
        x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (50, 2)).astype(np.float32))
        p = uniform_init(x, bits=6)

        def f(p):
            dq, _ = uniform_forward(p, x, bits=6)
            return jnp.sum(dq ** 2)

        g = jax.grad(f)(p)
        assert np.all(np.isfinite(np.asarray(g.scale)))
        assert np.any(np.asarray(g.scale) != 0)
        assert np.any(np.asarray(g.beta) != 0)


class TestLog:
    def test_positive_reconstruction(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.uniform(0.1, 300.0, (400, 2)).astype(np.float32))
        dq, code, state = log_forward(x, bits=10)
        # log-domain quantization: relative error bounded by exp(scale/2)-1
        rel = np.abs(np.asarray(dq) / np.asarray(x) - 1)
        bound = np.exp(float(state.scale) / 2) - 1 + 1e-4
        assert rel.max() <= bound
        np.testing.assert_allclose(np.asarray(log_decompress(state, code)),
                                   np.asarray(dq), rtol=1e-5)

    def test_unsigned_dequant(self):
        """Non-learned variant drops the sign (quantize.py:233)."""
        x = jnp.array([[-2.0], [4.0]])
        dq, _, _ = log_forward(x, bits=8)
        assert (np.asarray(dq) > 0).all()


class TestHybrid:
    def test_channel_split(self):
        rng = np.random.default_rng(3)
        var = rng.uniform(1.0, 100.0, (200, 2))
        cov = rng.uniform(-5.0, 5.0, (200, 1))
        x = jnp.asarray(np.concatenate([var[:, :1], cov, var[:, 1:]], 1).astype(np.float32))
        params = hybrid_init(x, cov_bits=10)
        dq, code, log_state = hybrid_forward(params, x, bits=10, cov_bits=10)
        assert dq.shape == x.shape
        # variance channels always positive post-dequant
        assert (np.asarray(dq)[:, [0, 2]] > 0).all()
        # compress/decompress roundtrip
        dq2, code2, ls2 = hybrid_compress(params, x, bits=10, cov_bits=10)
        rec = hybrid_decompress(params, ls2, code2)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(dq2), rtol=1e-5)

    def test_size(self):
        assert hybrid_size(10, 10) == 10.0
        assert hybrid_size(8, 14) == (14 + 16) / 3


class TestFp16:
    def test_value_and_grad(self):
        x = jnp.array([1.0001], jnp.float32)
        y = fake_quantize_half(x)
        assert np.asarray(y)[0] == np.float32(np.float16(1.0001))
        g = jax.grad(lambda x: jnp.sum(fake_quantize_half(x)))(x)
        np.testing.assert_allclose(np.asarray(g), 1.0)


class TestResidualVQ:
    def test_two_layer_reconstruction(self):
        rng = np.random.default_rng(4)
        # clustered data
        centers = rng.uniform(0, 1, (8, 3))
        x = jnp.asarray((centers[rng.integers(0, 8, 300)] +
                         rng.normal(0, 0.01, (300, 3))).astype(np.float32))
        state = init_residual_vq(x, num_quantizers=2, codebook_size=8,
                                 key=jax.random.PRNGKey(0), kmeans_iters=5)
        out, commit, idx, state2 = residual_vq_forward(state, x, update=False)
        err = float(jnp.mean((out - x) ** 2))
        assert err < 0.02 ** 2 * 10
        assert idx.shape == (300, 2)
        rec = residual_vq_decode(state, idx)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(out), atol=1e-6)

    def test_ema_update_moves_codebook(self):
        rng = np.random.default_rng(5)
        x0 = jnp.asarray(rng.uniform(0, 1, (100, 3)).astype(np.float32))
        state = init_residual_vq(x0, 1, 8, jax.random.PRNGKey(1))
        x1 = x0 + 0.5
        _, _, _, state2 = residual_vq_forward(state, x1, update=True)
        assert not np.allclose(np.asarray(state.layers[0].embed),
                               np.asarray(state2.layers[0].embed))

    def test_ste_gradient(self):
        x = jnp.asarray(np.random.default_rng(6).uniform(0, 1, (50, 3)).astype(np.float32))
        state = init_residual_vq(x, 2, 8, jax.random.PRNGKey(2))

        def f(x):
            out, _, _, _ = residual_vq_forward(state, x, update=False)
            return jnp.sum(out * 2.0)

        g = np.asarray(jax.grad(f)(x))
        np.testing.assert_allclose(g, 2.0, atol=1e-6)
