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
before mesh construction (``maybe_initialize_distributed``).
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


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Device-put a host batch with the leading dim sharded over ``data``."""
    s = batch_sharding(mesh, data_axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate_state(state, mesh: Mesh):
    """Replicate a state pytree across the mesh (the functional analogue of
    the reference's rank-0 ``dist.broadcast`` of memory/params,
    train_video_contrast_dis.py:233-242)."""
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), state)


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
