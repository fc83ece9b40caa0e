"""Temporal aggregation over the frame axis.

Counterpart of the reference's TemporalAggreModel
(lib/ops/pooling_opts/basic_ops_wrap.py:4-27): avg or max consensus over the
frame axis of per-frame features.  Pure functions — no module state needed.
The reference's ``get_agg`` hardcoded ``model_type='2D'``
(lib/ops/build.py:6, latent bug); here the axis is explicit.
"""

from __future__ import annotations

import jax.numpy as jnp


def temporal_aggregate(x: jnp.ndarray, mode: str = "avg", axis: int = 1) -> jnp.ndarray:
    """Aggregate (B, T, D) frame features (or any axis) to clip features."""
    if mode == "avg":
        return jnp.mean(x, axis=axis)
    if mode == "max":
        return jnp.max(x, axis=axis)
    raise ValueError(f"Unknown aggregation mode: {mode} (supported: avg, max)")


def get_agg(agg_fun: str = "avg", model_type: str = "2D"):
    """Builder mirroring lib/ops/build.py:5-7 — returns a callable that
    aggregates over the frame axis (axis 1 for (B, T, D) 2D-backbone
    features; 3D backbones pool inside the encoder)."""
    def agg(x: jnp.ndarray) -> jnp.ndarray:
        return temporal_aggregate(x, mode=agg_fun, axis=1)

    return agg
