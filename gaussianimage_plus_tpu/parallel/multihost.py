"""Multi-host runtime: initialization + cross-host batched fitting.

The reference is strictly single-process/single-GPU (train.py:39); this module
supplies the pod-scale story from BASELINE.json's north star: thousands of
images sharded across hosts/chips, one Gaussian set per image, no cross-image
communication — scaling efficiency should be bounded only by per-host input
skew.

Usage on each host of a pod slice:

    from gaussianimage_plus_tpu.parallel import multihost
    multihost.initialize()              # jax.distributed.initialize()
    tss = multihost.fit_global_batch(my_images, cfg, tcfg, num_points)

``fit_global_batch`` forms the global mesh over all devices, shards the
global image batch, and runs the chunked trainer; each host feeds only its
addressable shard (jax.make_array_from_process_local_data).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var defaults; no-op when already
    initialized or single-process."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized


def global_mesh(axis: str = "data") -> Mesh:
    return Mesh(np.asarray(jax.devices()), (axis,))


def shard_global_batch(local_images: np.ndarray, mesh: Mesh,
                       axis: str = "data"):
    """Assemble a globally-sharded image batch from per-process local data."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_images)


def fit_global_batch(local_images, cfg, tcfg, num_points: int,
                     seed: int = 3047, progress=None, axis: str = "data"):
    """Distributed analog of parallel.fit_batch: the global batch axis spans
    every device in the pod slice.

    Uses the shard_map per-device-unbatched chunk (``batch_train_chunk_dp``)
    whenever the global batch divides the device count — the vmapped chunk
    costs ~5x per image (see ``batch_train_chunk_dp``'s docstring) and must
    never be the pod-scale default."""
    from .sharded import (batch_train_chunk, batch_train_chunk_dp,
                          init_batch_train_state, shard_batch)

    mesh = global_mesh(axis)
    n_local = np.asarray(local_images).shape[0]
    n_global = n_local * jax.process_count()
    tss = init_batch_train_state(cfg, tcfg, num_points, n_global, seed)
    tss = shard_batch(tss, mesh, axis)
    images = shard_global_batch(np.asarray(local_images), mesh, axis)
    use_dp = n_global % mesh.shape[axis] == 0
    if not use_dp:
        import warnings

        warnings.warn(
            f"fit_global_batch: global batch {n_global} not divisible by "
            f"{mesh.shape[axis]} devices; falling back to the vmapped chunk "
            f"(~5x per-image overhead).", stacklevel=2)
    chunk = tcfg.prune_iter
    for ci in range(tcfg.iterations // chunk):
        it_end = (ci + 1) * chunk
        do_grow = (tcfg.adaptive_add and it_end % tcfg.grow_iter == 0
                   and it_end < tcfg.iterations)
        final_fill = it_end == tcfg.iterations - tcfg.grow_iter
        if use_dp:
            tss, m = batch_train_chunk_dp(tss, images, cfg, tcfg, chunk,
                                          tcfg.prune, do_grow, final_fill,
                                          mesh, axis)
        else:
            tss, m = batch_train_chunk(tss, images, cfg, tcfg, chunk,
                                       tcfg.prune, do_grow, final_fill)
        if progress is not None:
            progress(it_end, m)
    return tss
