"""Optimizers: reference-parity Adam schedule + an optax Adan transform.

- The active recipe is torch ``Adam(lr, eps=1e-15)`` + ``StepLR(step_size=
  20000, gamma=0.5)`` stepped every iteration
  (models/gaussianimage_covariance.py:98-101). optax.adam with
  ``eps=1e-15, eps_root=0`` applies the identical update
  ``lr * m_hat / (sqrt(v_hat) + eps)``.
- ``adan``: optax re-implementation of the reference's Adan optimizer
  (optimizer.py:39-469, betas (0.98, 0.92, 0.99)) used by the legacy
  Cholesky/RS/3D recipes (train.py:256-262 remaps opt_type to 'adan').
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def step_lr(base_lr: float, step_size: int = 20000, gamma: float = 0.5):
    """torch.optim.lr_scheduler.StepLR stepped once per iteration."""

    def schedule(count):
        return base_lr * gamma ** (count // step_size)

    return schedule


def make_adam(lr: float, step_size: int = 20000, gamma: float = 0.5,
              eps: float = 1e-15) -> optax.GradientTransformation:
    """Reference training optimizer (gaussianimage_covariance.py:98-101)."""
    return optax.adam(learning_rate=step_lr(lr, step_size, gamma),
                      b1=0.9, b2=0.999, eps=eps, eps_root=0.0)


class AdanState(NamedTuple):
    count: jax.Array
    exp_avg: optax.Updates      # m_t
    exp_avg_sq: optax.Updates   # n_t
    exp_avg_diff: optax.Updates # diff_t
    prev_grad: optax.Updates    # g_{t-1}


def adan(learning_rate, betas=(0.98, 0.92, 0.99), eps: float = 1e-8,
         weight_decay: float = 0.0, no_prox: bool = False) -> optax.GradientTransformation:
    """Adan (arXiv 2208.06677) exactly as _single_tensor_adan
    (optimizer.py:237-294) with max_grad_norm=0 (no clipping), including the
    first-step convention ``neg_pre_grad = -g_1`` so ``diff_1 = 0``.

    Returns *updates* (deltas to add to params), matching optax convention;
    the ``no_prox=False`` decoupled decay divides the updated param by
    ``1 + lr*wd`` which is folded into the update here.
    """
    b1, b2, b3 = betas
    sched = learning_rate if callable(learning_rate) else (lambda _: learning_rate)

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return AdanState(count=jnp.zeros((), jnp.int32), exp_avg=z,
                         exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
                         exp_avg_diff=jax.tree.map(jnp.zeros_like, params),
                         prev_grad=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        count = state.count + 1
        lr = sched(state.count)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        bc3_sqrt = jnp.sqrt(1.0 - b3 ** count.astype(jnp.float32))
        is_first = count == 1

        def per_leaf(g, m, n, d, pg, p):
            prev = jnp.where(is_first, g, pg)           # step 1: diff = 0
            diff = g - prev
            m_new = b1 * m + (1 - b1) * g
            d_new = b2 * d + (1 - b2) * diff
            gd = g + b2 * diff
            n_new = b3 * n + (1 - b3) * gd * gd
            denom = jnp.sqrt(n_new) / bc3_sqrt + eps
            step = lr / bc1 * m_new + (lr * b2 / bc2) * d_new
            if no_prox:
                upd = -lr * weight_decay * p - step / denom
            else:
                # param' = (param - step/denom) / (1 + lr*wd)
                upd = (p - step / denom) / (1.0 + lr * weight_decay) - p
            return upd, m_new, n_new, d_new, g

        leaves = jax.tree.map(
            per_leaf, grads, state.exp_avg, state.exp_avg_sq,
            state.exp_avg_diff, state.prev_grad,
            params if params is not None else jax.tree.map(jnp.zeros_like, grads))
        # unzip the 5-tuples
        treedef = jax.tree.structure(grads)
        flat = treedef.flatten_up_to(leaves)
        upd = treedef.unflatten([t[0] for t in flat])
        m = treedef.unflatten([t[1] for t in flat])
        n = treedef.unflatten([t[2] for t in flat])
        d = treedef.unflatten([t[3] for t in flat])
        pg = treedef.unflatten([t[4] for t in flat])
        return upd, AdanState(count=count, exp_avg=m, exp_avg_sq=n,
                              exp_avg_diff=d, prev_grad=pg)

    return optax.GradientTransformation(init, update)
