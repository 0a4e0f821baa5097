"""Residual vector quantization with EMA codebooks and k-means init.

Functional JAX counterpart of the ``vector-quantize-pytorch`` machinery the
reference wraps for color attributes (quantize.py:261-333: ``VectorQuantize``
/ ``ResidualVQ`` with dim=3, codebook_size=8, num_quantizers=2, decay=0.8,
commitment_weight=1.0, kmeans_init=True, kmeans_iters=5 — instantiated at
gaussianimage_covariance.py:137-138 for ``--color_quant vq``).

Semantics implemented (the subset the reference exercises):
- codebook init by k-means over the first batch;
- nearest-neighbor assignment (L2);
- EMA codebook update: ``N_k <- d*N_k + (1-d)*count_k``,
  ``m_k <- d*m_k + (1-d)*sum_assigned``, ``embed_k = m_k / N_k`` (Laplace
  smoothed);
- straight-through estimator out = x + sg(q - x);
- commitment loss ``mse(sg(q), x) * weight``;
- residual stages: each layer quantizes the remaining residual; decode sums
  ``embed[idx_l]`` over layers (quantize.py:326-333).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class VQCodebook(NamedTuple):
    embed: jax.Array         # [K, D]
    cluster_size: jax.Array  # [K] EMA counts
    embed_avg: jax.Array     # [K, D] EMA sums


class ResidualVQState(NamedTuple):
    layers: Tuple[VQCodebook, ...]


def kmeans(x: jax.Array, k: int, iters: int, key: jax.Array) -> jax.Array:
    """Plain Lloyd k-means; returns [k, D] centers."""
    n = x.shape[0]
    idx = jax.random.choice(key, n, (k,), replace=n < k)
    centers = x[idx]

    def step(centers, _):
        d = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)
        counts = onehot.sum(0)
        sums = onehot.T @ x
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centers)
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


def init_residual_vq(x: jax.Array, num_quantizers: int, codebook_size: int,
                     key: jax.Array, kmeans_iters: int = 5) -> ResidualVQState:
    """k-means init per layer on the successive residuals of the init batch."""
    layers = []
    resid = x
    for i in range(num_quantizers):
        centers = kmeans(resid, codebook_size, kmeans_iters, jax.random.fold_in(key, i))
        cb = VQCodebook(embed=centers,
                        cluster_size=jnp.ones((codebook_size,), x.dtype),
                        embed_avg=centers)
        d = jnp.sum((resid[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        assign = jnp.argmin(d, axis=1)
        resid = resid - centers[assign]
        layers.append(cb)
    return ResidualVQState(layers=tuple(layers))


def _vq_layer(cb: VQCodebook, x: jax.Array, decay: float, update: bool):
    d = jnp.sum((jax.lax.stop_gradient(x)[:, None, :] - cb.embed[None, :, :]) ** 2, axis=-1)
    assign = jnp.argmin(d, axis=1)
    quant = cb.embed[assign]
    if update:
        onehot = jax.nn.one_hot(assign, cb.embed.shape[0], dtype=x.dtype)
        counts = onehot.sum(0)
        sums = onehot.T @ jax.lax.stop_gradient(x)
        cluster_size = decay * cb.cluster_size + (1 - decay) * counts
        embed_avg = decay * cb.embed_avg + (1 - decay) * sums
        n = cluster_size.sum()
        smoothed = (cluster_size + 1e-5) / (n + cb.embed.shape[0] * 1e-5) * n
        embed = embed_avg / smoothed[:, None]
        cb = VQCodebook(embed=embed, cluster_size=cluster_size, embed_avg=embed_avg)
    return cb, quant, assign


def residual_vq_forward(state: ResidualVQState, x: jax.Array,
                        decay: float = 0.8, commitment_weight: float = 1.0,
                        update: bool = True):
    """Returns (out with STE, commit_loss, indices [N, L], new_state)."""
    resid = x
    out = jnp.zeros_like(x)
    indices = []
    new_layers = []
    commit = 0.0
    for cb in state.layers:
        cb, quant, assign = _vq_layer(cb, resid, decay, update)
        commit = commit + jnp.mean((jax.lax.stop_gradient(quant) - resid) ** 2)
        out = out + quant
        resid = resid - jax.lax.stop_gradient(quant)
        indices.append(assign)
        new_layers.append(cb)
    out_ste = x + jax.lax.stop_gradient(out - x)
    return (out_ste, commitment_weight * commit,
            jnp.stack(indices, axis=1), ResidualVQState(layers=tuple(new_layers)))


def residual_vq_decode(state: ResidualVQState, indices: jax.Array) -> jax.Array:
    """Sum of per-layer codebook rows (quantize.py:326-333)."""
    out = 0.0
    for i, cb in enumerate(state.layers):
        out = out + cb.embed[indices[:, i]]
    return out


def residual_vq_bits(state: ResidualVQState, indices: jax.Array) -> float:
    """Raw size accounting: codebook fp32 bits + ceil(log2(max_idx)) per index
    (analysis_wo_ec VQ branch, gaussianimage_covariance.py:477-493)."""
    codebook_bits = sum(int(np.prod(cb.embed.shape)) * 32 for cb in state.layers)
    return codebook_bits


import numpy as np  # noqa: E402  (used in bits accounting only)
