"""Parallelism: mesh construction, shardings, and collective helpers."""

from .mesh import (
    pad_batch_to_multiple,
    batch_sharding,
    local_batch_size,
    make_mesh,
    maybe_initialize_distributed,
    mesh_from_cfg,
    replicate_state,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "mesh_from_cfg",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate_state",
    "local_batch_size",
    "pad_batch_to_multiple",
    "maybe_initialize_distributed",
]
