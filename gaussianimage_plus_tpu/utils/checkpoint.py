"""Checkpoint save/load via Orbax.

TPU-native replacement for the reference's torch.save checkpoints
(train.py:173-175: ``{"gs": state_dict, "num_gs", "psnr", "ms-ssim",
"slv_bound"}``) and the resume path (train.py:61-77) that rebuilds the model
at the checkpointed point count and restores the SLV bound rows. Here the
whole GaussianState (params + active mask + bound rows + count) is one pytree
so resume is exact by construction.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax
import numpy as np


def save_checkpoint(path, state, extra: Optional[dict] = None) -> None:
    """Write GaussianState (+ scalar metadata) under ``path`` (a directory)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    payload = {"state": state}
    if extra:
        payload["extra"] = {k: np.asarray(v) for k, v in extra.items()}
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def _rebuild(template, data):
    """Fill ``template``'s pytree with values from the orbax-restored nested
    dict, matching by attribute/key names (dict ordering differs from
    dataclass field order, so positional unflatten would scramble leaves)."""
    from jax.tree_util import tree_map_with_path, GetAttrKey, DictKey, SequenceKey

    def fetch(path, leaf):
        node = data
        for k in path:
            if isinstance(k, GetAttrKey):
                node = node[k.name]
            elif isinstance(k, DictKey):
                node = node[k.key]
            elif isinstance(k, SequenceKey):
                node = node[k.idx]
            else:
                node = node[str(k)]
        return jnp_asarray_like(node, leaf)

    def jnp_asarray_like(v, leaf):
        import jax.numpy as jnp

        return jnp.asarray(v, dtype=leaf.dtype).reshape(leaf.shape)

    return tree_map_with_path(fetch, template)


def load_checkpoint(path, template_state):
    """Restore (GaussianState, extra dict). ``template_state`` supplies the
    pytree structure/shapes (build with init_state at the same config)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            restored = ckptr.restore(path)
        except ValueError:
            # checkpoints written from another platform (e.g. TPU) carry
            # sharding metadata the default restore can't satisfy here;
            # restore every leaf as plain numpy instead (_rebuild re-casts)
            meta = ckptr.metadata(path).item_metadata
            tree = meta.tree if hasattr(meta, "tree") else meta
            args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
            restored = ckptr.restore(path, restore_args=args)
    state = _rebuild(template_state, restored["state"])
    return state, restored.get("extra", {})
