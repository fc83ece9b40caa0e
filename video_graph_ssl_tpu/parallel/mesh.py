"""Device mesh + sharding helpers — the TPU replacement for the reference's
NCCL/DDP runtime (tools/train_video_contrast_dis.py:42-76,182-242).

Single-controller JAX: one process sees all devices; there is no
``mp.spawn``, no process groups, no explicit broadcast.  A ``Mesh`` over the
chips plus ``NamedSharding`` annotations on the batch and state make XLA
insert every collective the reference hand-rolled:

| reference (NCCL)                         | here                              |
|------------------------------------------|-----------------------------------|
| DDP gradient allreduce                   | implicit psum in sharded jit      |
| ``_global_gather`` all_gather of keys    | global-view batch (no code)       |
| ``_broadcast_memory`` param broadcast    | replicated NamedSharding          |
| ShuffleBN per-node shuffles              | global-batch BN stats / shard_map |
|                                          | local-BN + pmean'd stats          |

Multi-host TPU slices only additionally need ``jax.distributed.initialize``
before mesh construction (``maybe_initialize_distributed``).  Batch feeding
then has two shapes:

- every host builds the FULL global batch and ``shard_batch`` slices out the
  rows its local chips own (correct but loads world_size× too much data); or
- each host loads ONLY its rows — ``process_batch_slice`` tells the loader
  which global-batch rows belong to this process (the multi-host counterpart
  of the reference's ``DistributedSampler``, lib/data/build.py:49) and
  ``shard_batch(..., local=True)`` assembles the global device array from
  the per-process chunks.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> None:
    """Initialize the multi-host JAX runtime when launched on a multi-host
    slice (controlled by standard TPU env vars); no-op on a single host."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(
    mesh_shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a device mesh. ``-1`` infers that axis from the device count."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def mesh_from_cfg(cfg, devices=None) -> Mesh:
    return make_mesh(tuple(cfg.TPU.MESH_SHAPE), tuple(cfg.TPU.MESH_AXES),
                     devices)


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def process_batch_slice(
    global_batch: int, mesh: Mesh, data_axis: str = "data"
) -> tuple:
    """Global-batch rows ``[lo, hi)`` owned by THIS process's addressable
    devices under the standard leading-dim sharding.

    The multi-host counterpart of the reference's ``DistributedSampler``
    (lib/data/build.py:49): pass the result to ``Loader(batch_slice=...)``
    so each host decodes only its own rows, then assemble with
    ``shard_batch(..., local=True)``.  Derived from the sharding's own
    device→index map, so it is correct for any mesh/device ordering; raises
    if this process's rows are not one contiguous, equal-share range.
    """
    s = batch_sharding(mesh, data_axis)
    imap = s.addressable_devices_indices_map((int(global_batch),))
    spans = sorted({
        (idx[0].start or 0,
         int(global_batch) if idx[0].stop is None else idx[0].stop)
        for idx in imap.values()
    })  # set: devices on replicated mesh axes share a span
    lo, hi = spans[0][0], spans[-1][1]
    expect = lo
    for a, b in spans:
        if a != expect:
            raise ValueError(
                f"process rows not contiguous under {data_axis!r} sharding: "
                f"{spans}")
        expect = b
    n_proc = jax.process_count()
    if (hi - lo) * n_proc != int(global_batch):
        raise ValueError(
            f"unequal per-process share: rows [{lo},{hi}) of {global_batch} "
            f"across {n_proc} processes")
    return int(lo), int(hi)


def _to_global(x, sharding, local: bool):
    """Form a global device array in a process-count-agnostic way.

    Single process: plain ``device_put``.  Multi-process: assemble from
    per-process chunks (``local=True`` — x holds only this process's rows)
    or from the full-size host value present on every process
    (``local=False`` — replicated specs, or a globally-built batch that
    each process slices itself before calling).
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    if local:
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
    else:
        global_shape = x.shape
    return jax.make_array_from_process_local_data(sharding, x, global_shape)


def shard_batch(batch, mesh: Mesh, data_axis: str = "data",
                local: bool = False):
    """Device-put a host batch with the leading dim sharded over ``data``.

    Multi-host: with ``local=True`` every leaf holds only this process's
    rows (from ``Loader(batch_slice=process_batch_slice(...))``); with the
    default ``local=False`` every process passes the identical FULL global
    batch and this function slices out the locally-owned rows — correct on
    any topology, at world_size× host-IO cost.
    """
    s = batch_sharding(mesh, data_axis)
    if jax.process_count() == 1 or local:
        return jax.tree_util.tree_map(lambda x: _to_global(x, s, local), batch)

    def _slice_put(x):
        lo, hi = process_batch_slice(np.shape(x)[0], mesh, data_axis)
        return jax.make_array_from_process_local_data(
            s, np.asarray(x)[lo:hi], np.shape(x))

    return jax.tree_util.tree_map(_slice_put, batch)


def replicate_state(state, mesh: Mesh):
    """Replicate a state pytree across the mesh (the functional analogue of
    the reference's rank-0 ``dist.broadcast`` of memory/params,
    train_video_contrast_dis.py:233-242).  Multi-host: every process holds
    the same host value (same-seed init), assembled into one replicated
    global array — still no explicit broadcast."""
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: _to_global(x, r, local=False),
                                  state)


def pad_batch_to_multiple(batch, multiple: int):
    """Pad every array's leading dim up to a multiple (repeating the last
    element) so eval tails shard over the mesh; returns (batch, real_n).

    Training drops the tail (drop_last); eval must score every video, so
    tools pad, run, and slice the outputs back to ``real_n``.
    """
    leaves = jax.tree_util.tree_leaves(batch)
    n = leaves[0].shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch, n

    def _pad(x):
        reps = np.repeat(x[-1:], pad, axis=0)
        return np.concatenate([np.asarray(x), reps], axis=0)

    return jax.tree_util.tree_map(_pad, batch), n


def local_batch_size(global_batch: int, mesh: Mesh, data_axis: str = "data") -> int:
    n = mesh.shape[data_axis]
    if global_batch % n:
        raise ValueError(
            f"Global batch {global_batch} not divisible by data-axis size {n}"
        )
    return global_batch // n
