"""Parallelism: mesh construction, shardings, and collective helpers."""

from .sequence import (
    graph_aug_sequence_parallel,
    ring_propagate,
    ring_similarity,
    rowfold_bernoulli_sample,
)
from .mesh import (
    pad_batch_to_multiple,
    batch_sharding,
    local_batch_size,
    make_mesh,
    maybe_initialize_distributed,
    mesh_from_cfg,
    process_batch_slice,
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
    "process_batch_slice",
    "maybe_initialize_distributed",
    "graph_aug_sequence_parallel",
    "ring_similarity",
    "ring_propagate",
    "rowfold_bernoulli_sample",
]
