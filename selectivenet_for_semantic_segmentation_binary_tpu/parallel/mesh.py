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
SPATIAL_AXIS = "spatial"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` chips (all by default).

    ``n_devices`` mirrors the reference's ``--local_rank`` list length: the
    CLI keeps the flag, but on TPU only the count selects mesh size.
    """
    devices = jax.devices()
    n = len(devices) if n_devices is None else min(n_devices, len(devices))
    return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: sharded on dim 0 across the data axis; on a 2-D
    (DATA_AXIS, SPATIAL_AXIS) training mesh additionally sharded on dim 1
    (image rows) across the spatial axis — XLA/GSPMD then spatially
    partitions every conv with automatic halo exchange, preserving the
    global-batch loss/BN semantics bit-for-bit up to fp reduction order
    (tests/test_spatial_train.py)."""
    if SPATIAL_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def make_mesh_dp_sp(n_devices: Optional[int], sp_ways: int,
                    batch_size: int, patch_size: int) -> Mesh:
    """The train/eval device mesh: 1-D data-parallel by default; ``sp_ways s``
    builds the 2-D (DATA_AXIS, SPATIAL_AXIS) mesh instead, and
    ``batch_sharding`` then shards batches (dp, sp) on (examples, image
    rows). The jitted step itself is unchanged — it runs over global arrays,
    so XLA/GSPMD spatially partitions every conv with automatic halo exchange
    and the global-batch loss/BN semantics are preserved by construction
    (the segmentation analog of sequence parallelism, SURVEY.md §2.2; trains
    patches too large for one chip's HBM). Divisibility is validated here so
    CLI errors are actionable."""
    sp = int(sp_ways or 1)
    if sp <= 1:
        mesh = make_mesh(n_devices)
        if batch_size % mesh.devices.size != 0:
            raise ValueError(
                f"batch_size {batch_size} must be divisible by the mesh "
                f"size {mesh.devices.size}"
            )
        return mesh
    if jax.process_count() > 1:
        # Multi-host SP is supported when every process's local devices tile
        # whole (dp-row x all-sp-columns) rectangles of the 2-D mesh — i.e.
        # sp divides the local device count. Then each process still owns a
        # contiguous slice of EXAMPLES with full images (pixel-row sharding
        # happens between its own chips), so PatchLoader's contiguous
        # 1/process_count example slicing and put_global assembly are correct
        # unchanged; the layout is verified below, not assumed. sp spanning
        # processes would need pixel-row-sliced host decode — rejected.
        if n_devices is not None and n_devices < len(jax.devices()):
            raise ValueError("--sp_ways > 1 on a fleet must use all devices: "
                             f"n_devices {n_devices} < {len(jax.devices())}")
        if jax.local_device_count() % sp != 0:
            raise ValueError(
                f"--sp_ways {sp} must divide the per-process device count "
                f"{jax.local_device_count()} on a multi-process fleet (an "
                "sp group spanning processes would shard pixel rows across "
                "hosts, which the host loader does not slice)")
    n = len(jax.devices()) if n_devices is None else min(n_devices,
                                                         len(jax.devices()))
    if n % sp != 0:
        raise ValueError(f"sp_ways {sp} must divide the device count {n}")
    dp = n // sp
    if batch_size % dp != 0:
        raise ValueError(f"batch_size {batch_size} must be divisible by "
                         f"the data-parallel ways {dp} (= {n} devices / "
                         f"sp_ways {sp})")
    if patch_size % (8 * sp) != 0:
        # 8 = 2^#pools: keeps every pool/upconv stage row-aligned per shard
        raise ValueError(f"patch_size {patch_size} must be divisible by "
                         f"8 * sp_ways = {8 * sp}")
    from .spatial import make_mesh_2d

    mesh = make_mesh_2d(dp, sp)
    if jax.process_count() > 1:
        _verify_fleet_sp_layout(mesh.devices)
    return mesh


def _verify_fleet_sp_layout(grid) -> None:
    """Verify (don't assume) the process->mesh layout the loader relies on:
    every dp row lives on ONE process; the dp rows of process p are exactly
    the contiguous block matching its contiguous example slice; and every
    process owns an EQUAL number of dp rows (the loader slices every global
    batch into uniform 1/process_count example blocks — a heterogeneous
    fleet would otherwise fail later and less legibly inside
    make_array_from_process_local_data). Holds for jax.devices()'
    process-major ordering; if a backend ever orders differently, fail
    loudly instead of silently training on permuted data.

    ``grid``: the (dp, sp) device array of the 2-D mesh.
    """
    row_procs = [{d.process_index for d in row} for row in grid]
    if any(len(s) != 1 for s in row_procs):
        raise ValueError("--sp_ways mesh layout error: a spatial row "
                         "spans processes; device ordering is not "
                         "process-major on this backend")
    flat = [next(iter(s)) for s in row_procs]
    if flat != sorted(flat):
        raise ValueError("--sp_ways mesh layout error: process blocks "
                         "are not contiguous over the data axis")
    counts = {p: flat.count(p) for p in set(flat)}
    if len(set(counts.values())) != 1:
        raise ValueError("--sp_ways mesh layout error: processes own "
                         f"unequal dp-row blocks ({counts}); every "
                         "process must contribute the same device count")


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
