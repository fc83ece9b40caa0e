"""MoCo queue as functional on-device state.

Counterpart of the reference's ``BaseMoCo``/``RGBMoCo``/``CMCMoCo``
(lib/memory/mem_moco.py:6-142).  The queue is a ``(K, dim)`` device array +
integer pointer carried in the train state; the update is a pure function
(scatter at ``(ptr + arange(n)) % K``), so it jits, shards, and donates.
Keys are expected to be the *globally gathered* keys across the data mesh
axis (reference enqueues the all-gathered keys,
tools/train_video_contrast_dis.py:182-187 + mem_moco.py:81-83), which under
jit's global-view semantics is simply the full batch.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models.heads import l2_normalize


class MocoState(NamedTuple):
    """Functional MoCo queue state."""

    queue: jnp.ndarray   # (K, dim) L2-normalized keys
    ptr: jnp.ndarray     # () int32 ring pointer


def init_moco(key: jax.Array, K: int, dim: int,
              dtype=jnp.float32) -> MocoState:
    """Random-normalized queue init (reference: mem_moco.py:56-58)."""
    q = jax.random.normal(key, (K, dim), dtype)
    return MocoState(queue=l2_normalize(q, axis=-1), ptr=jnp.zeros((), jnp.int32))


def moco_logits(q: jnp.ndarray, k: jnp.ndarray, queue: jnp.ndarray,
                T: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[pos; negs] logits / T with label 0 (reference: mem_moco.py:29-49).

    q, k: (B, dim); queue: (K, dim).  Returns (logits (B, 1+K), labels (B,)).
    The neg term is a (B, dim) x (dim, K) matmul — one MXU call; under a
    sharded batch XLA keeps the queue replicated and the matmul local.
    """
    k = jax.lax.stop_gradient(k)
    pos = jnp.sum(q * k, axis=-1, keepdims=True)
    neg = jnp.einsum("bd,kd->bk", q, queue, preferred_element_type=jnp.float32)
    logits = jnp.concatenate([pos, neg], axis=1) / T
    labels = jnp.zeros((q.shape[0],), jnp.int32)
    return logits, labels


def moco_enqueue(state: MocoState, all_k: jnp.ndarray) -> MocoState:
    """Ring-buffer enqueue of the (global) key batch
    (reference: _update_memory/_update_pointer, mem_moco.py:14-27)."""
    all_k = jax.lax.stop_gradient(all_k).astype(state.queue.dtype)
    n = all_k.shape[0]
    K = state.queue.shape[0]
    idx = (state.ptr + jnp.arange(n, dtype=jnp.int32)) % K
    queue = state.queue.at[idx].set(all_k)
    ptr = (state.ptr + n) % K
    return MocoState(queue=queue, ptr=ptr.astype(jnp.int32))


class CmcMocoState(NamedTuple):
    """Dual-queue CMC variant (reference: mem_moco.py:91-142)."""

    queue_1: jnp.ndarray
    queue_2: jnp.ndarray
    ptr: jnp.ndarray


def init_cmc_moco(key: jax.Array, K: int, dim: int,
                  dtype=jnp.float32) -> CmcMocoState:
    k1, k2 = jax.random.split(key)
    return CmcMocoState(
        queue_1=l2_normalize(jax.random.normal(k1, (K, dim), dtype), -1),
        queue_2=l2_normalize(jax.random.normal(k2, (K, dim), dtype), -1),
        ptr=jnp.zeros((), jnp.int32),
    )


def cmc_moco_forward(state: CmcMocoState, q1, k1, q2, k2, T: float):
    """Cross-modal logits: q1 scored against modality-2 keys/queue and vice
    versa (reference: mem_moco.py:101-142)."""
    logits1, labels = moco_logits(q1, k2, state.queue_2, T)
    logits2, _ = moco_logits(q2, k1, state.queue_1, T)
    return logits1, logits2, labels


def cmc_moco_enqueue(state: CmcMocoState, all_k1, all_k2) -> CmcMocoState:
    n = all_k1.shape[0]
    K = state.queue_1.shape[0]
    idx = (state.ptr + jnp.arange(n, dtype=jnp.int32)) % K
    return CmcMocoState(
        queue_1=state.queue_1.at[idx].set(jax.lax.stop_gradient(all_k1)),
        queue_2=state.queue_2.at[idx].set(jax.lax.stop_gradient(all_k2)),
        ptr=((state.ptr + n) % K).astype(jnp.int32),
    )
