"""Mesh construction and sharding helpers.

The reference parallelizes with single-process ``torch.nn.DataParallel``
(reference train.py:132-134): replicate module, scatter batch dim 0, gather
outputs to GPU 0, compute the loss on the gathered global batch. The TPU-native
design is a 1-D ``jax.sharding.Mesh`` over all chips with the batch sharded on
its ``data`` axis and parameters replicated; the train step is a single
``jax.jit`` over global arrays, so XLA inserts the gradient/metric psums over
ICI automatically.

Crucially this preserves the reference's *global-batch* loss semantics: the
selective coverage term ``mean(sigmoid(g))`` (selective_loss.py:71-72) is a
mean over the gathered batch in the reference; under jit-over-sharded-arrays
``jnp.mean`` is exactly that global mean (SURVEY.md §2.2, §7 risk 1) — no
per-shard approximation creeps in.

Multi-host: the same mesh spans DCN after ``jax.distributed.initialize``; data
loading shards per host via ``PatchLoader``'s sharding argument.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` chips (all by default).

    ``n_devices`` mirrors the reference's ``--local_rank`` list length: the
    CLI keeps the flag, but on TPU only the count selects mesh size.
    """
    devices = jax.devices()
    n = len(devices) if n_devices is None else min(n_devices, len(devices))
    return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: sharded on dim 0 across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Parameters / optimizer state: fully replicated."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """device_put a host batch dict sharded across the mesh."""
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    """device_put a pytree (params/state) replicated across the mesh."""
    s = replicated_sharding(mesh)
    return jax.device_put(tree, s)
