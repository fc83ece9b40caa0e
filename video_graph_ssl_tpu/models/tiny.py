"""Tiny 3D backbone for tests and dry-runs.

Not part of the reference inventory — exists so the test suite and the
multi-chip dry-run can exercise the full pipeline (wrappers, graph aug,
memories, sharding) with seconds-scale CPU compiles instead of the
minutes-scale S3D graph.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.temporal_graph import TemporalGraphAug
from .layers import BasicConv3d, max_pool_3d

TINY3D_FEATURE_DIM = 64


class Tiny3D(nn.Module):
    num_classes: Optional[int] = None
    aug_points: Tuple[int, ...] = ()
    graph_cfg: Optional[Dict[str, Any]] = None
    remat: bool = False
    partial_bn: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        gcfg = dict(self.graph_cfg or {})
        x = x.astype(self.dtype)
        x = BasicConv3d(16, 3, 2, 1, name="stage0", **kw)(x, train)
        bt = train and not self.partial_bn
        if 1 in self.aug_points:
            x = TemporalGraphAug(name="graph_aug_1", dtype=self.dtype,
                                 param_dtype=self.param_dtype, **gcfg)(x, train)
        x = BasicConv3d(32, 3, 2, 1, name="stage1", **kw)(x, bt)
        x = max_pool_3d(x, (1, 2, 2), (1, 2, 2))
        x = BasicConv3d(TINY3D_FEATURE_DIM, 1, 1, 0, name="stage2", **kw)(x, bt)
        feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        if self.num_classes is None:
            return feat
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=self.param_dtype, name="fc")(feat)

    @property
    def feature_dim(self) -> int:
        return TINY3D_FEATURE_DIM
