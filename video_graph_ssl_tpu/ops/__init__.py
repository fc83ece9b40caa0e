"""Ops: the GCA temporal-graph core, pooling, and Pallas kernels.

Public surface mirrors ``lib/ops/__init__.py`` (``get_agg``) plus the
graph-aug module that the reference exposed via ``build_aug_block``.
"""

from .pooling import get_agg, temporal_aggregate
from .temporal_graph import (
    GCN,
    TemporalGraphAug,
    compute_heat,
    compute_ppr,
    hop_weight_matrix,
    relaxed_bernoulli_sample,
    temporal_hop_matrix,
)

__all__ = [
    "get_agg",
    "temporal_aggregate",
    "GCN",
    "TemporalGraphAug",
    "temporal_hop_matrix",
    "hop_weight_matrix",
    "relaxed_bernoulli_sample",
    "compute_ppr",
    "compute_heat",
]
