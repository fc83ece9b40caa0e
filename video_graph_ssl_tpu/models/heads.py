"""Projection / prediction heads for the contrastive wrappers.

Counterparts of the reference's lib/modeling/project_head.py:
``ProjectHead`` (linear-or-MLP + L2 normalize, :12-34), SimSiam's 3-layer
``ProjectionMLP`` with BN (:36-59) and 2-layer ``PredictionMLP`` (:62-75).
Heads run in float32 — they are tiny, and the contrastive logits are
numerically sensitive.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize(p=2) equivalent (reference: project_head.py:4-10)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


class ProjectHead(nn.Module):
    """Contrastive projection head: linear or 2-layer MLP + L2 normalize
    (reference: project_head.py:12-34)."""

    feat_dim: int = 128
    head_type: str = "mlp"
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        if self.head_type == "linear":
            x = nn.Dense(self.feat_dim, param_dtype=self.param_dtype, name="fc")(x)
        elif self.head_type == "mlp":
            in_dim = x.shape[-1]
            x = nn.Dense(in_dim, param_dtype=self.param_dtype, name="fc1")(x)
            x = nn.relu(x)
            x = nn.Dense(self.feat_dim, param_dtype=self.param_dtype, name="fc2")(x)
        else:
            raise NotImplementedError(f"head not supported: {self.head_type}")
        return l2_normalize(x, axis=-1)


class _DenseBNReLU(nn.Module):
    features: int
    relu: bool = True
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.features, param_dtype=self.param_dtype, name="fc")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=self.param_dtype,
            name="bn",
        )(x)
        if self.relu:
            x = nn.relu(x)
        return x


class ProjectionMLP(nn.Module):
    """SimSiam 3-layer projection MLP, BN after every layer, no ReLU on the
    output (reference: project_head.py:36-59)."""

    hid_dim: int
    out_dim: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        x = _DenseBNReLU(self.hid_dim, name="l1")(x, train=train)
        x = _DenseBNReLU(self.hid_dim, name="l2")(x, train=train)
        x = _DenseBNReLU(self.out_dim, relu=False, name="l3")(x, train=train)
        return x


class PredictionMLP(nn.Module):
    """SimSiam 2-layer prediction MLP (reference: project_head.py:62-75)."""

    hid_dim: int
    out_dim: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        x = _DenseBNReLU(self.hid_dim, name="l1")(x, train=train)
        x = nn.Dense(self.out_dim, param_dtype=self.param_dtype, name="l2")(x)
        return x
