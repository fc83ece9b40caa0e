"""Functional train state.

Everything the reference keeps as framework-managed mutable state — model
params, BN running stats, optimizer buffers, the EMA ("momentum") encoder
(tools/train_video_contrast_dis.py:176-180), and the MoCo queue / memory
bank (lib/memory/mem_moco.py:14-27, mem_bank.py:15-28) — lives in one
donated pytree, so a train step is
``state, metrics = step(state, batch, lr)`` with zero host round-trips and
no copies of the large buffers.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray                      # () int32
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array                         # folded with step for per-step keys
    ema_params: Optional[Any] = None       # MoCo momentum encoder
    ema_batch_stats: Optional[Any] = None
    contrast: Optional[Any] = None         # MocoState | BankState | None

    def step_rngs(self, *names: str):
        """Per-step named rng streams derived from (rng, step)."""
        base = jax.random.fold_in(self.rng, self.step)
        keys = jax.random.split(base, len(names))
        return dict(zip(names, keys))


def ema_update(params, ema_params, alpha: float):
    """ema = alpha * ema + (1 - alpha) * params
    (reference: _momentum_update, train_video_contrast_dis.py:176-180)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * alpha + p.astype(e.dtype) * (1.0 - alpha),
        ema_params, params,
    )
