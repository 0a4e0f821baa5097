"""Attribute quantizers: LSQ uniform, log-domain, hybrid, fp16, residual VQ.

Functional JAX re-design of the reference ``quantize.py``. Each quantizer is a
pure function over an explicit parameter/state pytree (no modules):

- ``UniformQuantizer`` (quantize.py:39-155): learned per-channel
  ``scale``/``beta``; ``code = clamp((x - beta)/scale, qmin, qmax)``; STE
  round. NOTE the reference computes the LSQ gradient scaling then overwrites
  it (``s_scale, beta_scale = self.scale, self.beta``, quantize.py:135) — so
  gradients to scale/beta are the plain STE gradients of the dequant
  expression. We implement exactly that (no grad_scale).
- ``LogQuantizer`` (quantize.py:158-258): uniform quantization of
  ``log(|x| + 1e-6)``; the non-learned variant (the one actually used inside
  HybridQuant) recomputes beta/scale from the batch min/max on every call and
  dequantizes WITHOUT the sign (quantize.py:233 — variances are positive).
- ``HybridQuant`` (quantize.py:336-389): covariance (N,3) splits into
  variance channels 0,2 -> non-learned LogQuantizer and the off-diagonal
  channel 1 -> learned UniformQuantizer; ``size() = (cov_bits + 2*bits)/3``.
- ``FakeQuantizationHalf`` (quantize.py:27-37): fp16 round-trip, identity
  gradient.
- ``VectorQuantizer`` (quantize.py:261-333): wraps a ResidualVQ with kmeans
  init and EMA codebooks (vector_quantize_pytorch semantics) — see
  :mod:`residual_vq`.

STE everywhere via ``x + stop_gradient(round(x) - x)`` (quantize.py:23-24).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def ste_round(x: jax.Array) -> jax.Array:
    """round with identity gradient (quantize.py:23-24)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def fake_quantize_half(x: jax.Array) -> jax.Array:
    """fp16 round-trip with identity gradient (quantize.py:27-37)."""
    h = jax.lax.stop_gradient(x.astype(jnp.float16).astype(x.dtype) - x)
    return x + h


# --------------------------------------------------------------------------
# Uniform (LSQ-style) quantizer
# --------------------------------------------------------------------------

class UniformQuantParams(NamedTuple):
    """Learned per-channel affine grid. Trained with Adam(lr=1e-3) +
    StepLR(10000, 0.5) in the reference (gaussianimage_covariance.py:119-146)."""
    scale: jax.Array  # [C]
    beta: jax.Array   # [C]


def uniform_qrange(bits: int, signed: bool = False) -> Tuple[int, int]:
    if signed:
        return -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
    return 0, 2 ** bits - 1


def uniform_init(x: jax.Array, bits: int, signed: bool = False) -> UniformQuantParams:
    """Data-driven init from per-channel min/max (quantize.py:72-85):
    ``scale = (max - min)/(qmax - qmin)``; ``beta = min - qmin*scale``."""
    qmin, qmax = uniform_qrange(bits, signed)
    t_min = jnp.min(x, axis=0)
    t_max = jnp.max(x, axis=0)
    scale = (t_max - t_min) / (qmax - qmin)
    scale = jnp.where(scale == 0, 1e-8, scale)
    beta = t_min - qmin * scale
    return UniformQuantParams(scale=scale, beta=beta)


def uniform_forward(params: UniformQuantParams, x: jax.Array, bits: int,
                    signed: bool = False):
    """Training-time fake-quantize (quantize.py:125-141). Returns
    (dequant, code). Gradients flow to x (STE) and to scale/beta through the
    dequant expression + clamp, exactly as torch autodiff of the reference."""
    qmin, qmax = uniform_qrange(bits, signed)
    code = jnp.clip((x - params.beta) / params.scale, qmin, qmax)
    quant = ste_round(code)
    dequant = quant * params.scale + params.beta
    return dequant, quant


def uniform_compress(params: UniformQuantParams, x: jax.Array, bits: int,
                     signed: bool = False):
    """(dequant, integer codes) — quantize.py:149-152."""
    qmin, qmax = uniform_qrange(bits, signed)
    code = jnp.round(jnp.clip((x - params.beta) / params.scale, qmin, qmax))
    return code * params.scale + params.beta, code


def uniform_decompress(params: UniformQuantParams, code: jax.Array):
    return code * params.scale + params.beta


# --------------------------------------------------------------------------
# Log quantizer (non-learned variant — the one used for variances)
# --------------------------------------------------------------------------

class LogQuantState(NamedTuple):
    """Snapshot of the log-domain grid (refreshed each call when training;
    frozen at compress time for decode)."""
    beta: jax.Array   # min of log(|x|+eps) — scalar (reference takes a global
                      # min over all elements, quantize.py:223)
    scale: jax.Array


def log_forward(x: jax.Array, bits: int):
    """Non-learned log quantization (quantize.py:219-234): recomputes the
    grid from the batch each call; dequant = exp(grid) WITHOUT sign.
    Returns (dequant, code, state)."""
    qmin, qmax = uniform_qrange(bits, signed=False)
    log_x = jnp.log(jnp.abs(x) + 1e-6)
    beta = jnp.min(log_x)      # global min (torch.min over all elements)
    max_log = jnp.max(log_x)
    scale = (max_log - beta) / (qmax - qmin)
    scale = jnp.where(scale == 0, 1e-8, scale)
    code = jnp.clip((log_x - beta) / scale, qmin, qmax)
    quant = ste_round(code)
    dequant = jnp.exp(quant * scale + beta)
    return dequant, quant, LogQuantState(beta=beta, scale=scale)


def log_compress(x: jax.Array, bits: int):
    """quantize.py:243-254 (non-learned path re-inits from data)."""
    dequant, quant, state = log_forward(x, bits)
    code = jax.lax.stop_gradient(jnp.round(
        jnp.clip((jnp.log(jnp.abs(x) + 1e-6) - state.beta) / state.scale,
                 *uniform_qrange(bits, signed=False))))
    return jnp.exp(code * state.scale + state.beta), code, state


def log_decompress(state: LogQuantState, code: jax.Array):
    return jnp.exp(code * state.scale + state.beta)


# --------------------------------------------------------------------------
# Hybrid covariance quantizer
# --------------------------------------------------------------------------

class HybridQuantParams(NamedTuple):
    cov: UniformQuantParams  # learned, off-diagonal channel


def hybrid_init(cov2d_elements: jax.Array, cov_bits: int) -> HybridQuantParams:
    """quantize.py:351-353: var channels non-learned (no params); cov channel
    UniformQuantizer init on column 1."""
    return HybridQuantParams(cov=uniform_init(cov2d_elements[:, 1:2], cov_bits))


def hybrid_forward(params: HybridQuantParams, x: jax.Array, bits: int,
                   cov_bits: int):
    """quantize.py:355-366. x is the effective covariance [N, 3]; channels
    0,2 through the log quantizer, channel 1 through the uniform quantizer.
    Returns (dequant [N,3], code [N,3], log_state)."""
    var = x[:, ::2]
    cov = x[:, 1:2]
    dq_var, code_var, log_state = log_forward(var, bits)
    dq_cov, code_cov = uniform_forward(params.cov, cov, cov_bits)
    dequant = jnp.concatenate([dq_var[:, 0:1], dq_cov, dq_var[:, 1:2]], axis=1)
    code = jnp.concatenate([code_var[:, 0:1], code_cov, code_var[:, 1:]], axis=1)
    return dequant, code, log_state


def hybrid_compress(params: HybridQuantParams, x: jax.Array, bits: int,
                    cov_bits: int):
    var = x[:, ::2]
    cov = x[:, 1:2]
    dq_var, code_var, log_state = log_compress(var, bits)
    dq_cov, code_cov = uniform_compress(params.cov, cov, cov_bits)
    dequant = jnp.concatenate([dq_var[:, 0:1], dq_cov, dq_var[:, 1:2]], axis=1)
    code = jnp.concatenate([code_var[:, 0:1], code_cov, code_var[:, 1:]], axis=1)
    return dequant, code, log_state


def hybrid_decompress(params: HybridQuantParams, log_state: LogQuantState,
                      code: jax.Array):
    var = log_decompress(log_state, code[:, ::2])
    cov = uniform_decompress(params.cov, code[:, 1:2])
    return jnp.concatenate([var[:, 0:1], cov, var[:, 1:2]], axis=1)


def hybrid_size(bits: int, cov_bits: int) -> float:
    """Per-element bit width: (cov_bits + 2*var_bits)/3 (quantize.py:368-369)."""
    return (cov_bits + 2 * bits) / 3.0
