"""Contrastive loss criteria.

Counterparts of lib/memory/criterion.py: ``NCESoftmaxLoss`` (InfoNCE = CE
against label 0, :34-45), ``NCECriterion`` (true NCE with noise probability
1/n_data, :8-31), and the SimSiam negative-cosine ``D`` (:47-62, also
re-exported from models.wrappers).  Pure functions over logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.wrappers import simsiam_d  # noqa: F401  (re-export)

EPS = 1e-7


def nce_softmax_loss(logits: jnp.ndarray) -> jnp.ndarray:
    """InfoNCE: cross-entropy with the positive at column 0
    (reference: criterion.py:34-45)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(logp[:, 0])


def nce_criterion(x: jnp.ndarray, n_data: int) -> jnp.ndarray:
    """True NCE loss with uniform noise P_n = 1/n_data
    (reference: criterion.py:8-31).

    ``x``: (B, K+1) scores with the positive in column 0 — same input
    contract as the reference (which feeds it the bank's exp'd similarity
    scores).
    """
    x = x.astype(jnp.float32)
    bsz = x.shape[0]
    m = x.shape[1] - 1
    pn = 1.0 / float(n_data)

    p_pos = x[:, 0]
    log_d1 = jnp.log(p_pos / (p_pos + m * pn + EPS))

    p_neg = x[:, 1:]
    log_d0 = jnp.log((m * pn) / (p_neg + m * pn + EPS))

    return -(jnp.sum(log_d1) + jnp.sum(log_d0)) / bsz


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Standard CE for downstream classification (reference uses
    nn.CrossEntropyLoss, tools/train_ds.py)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                                         axis=-1))
