"""Instance-discrimination memory bank as functional on-device state.

Counterpart of the reference's ``BaseMem``/``RGBMem``/``CMCMem``
(lib/memory/mem_bank.py:7-154) and ``AliasMethod``
(lib/memory/alias_multinomial.py:4-65).

The bank is a ``(n_data, dim)`` normalized device array in the train state.
Per step: draw ``B×(K+1)`` negative indices (slot 0 overwritten with the
positive index), gather, bmm logits / T, then EMA-update the rows of the
*globally gathered* features (reference: mem_bank.py:15-28, 55-90).

The reference always instantiates the alias sampler with uniform weights
(``AliasMethod(torch.ones(n_data))``, mem_bank.py:48), so the on-device draw
is a plain ``randint`` — O(1) per sample with no tables.  The general
alias-table method is still provided (host-precomputed tables, device draw
as two gathers + a Bernoulli) for non-uniform noise distributions.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.heads import l2_normalize


class BankState(NamedTuple):
    memory: jnp.ndarray  # (n_data, dim), L2-normalized


def init_bank(key: jax.Array, n_data: int, dim: int,
              dtype=jnp.float32) -> BankState:
    m = jax.random.normal(key, (n_data, dim), dtype)
    return BankState(memory=l2_normalize(m, axis=-1))


def bank_logits(
    state: BankState,
    x: jnp.ndarray,            # (B, dim) anchor features
    y: jnp.ndarray,            # (B,) int sample indices (positives)
    key: jax.Array,
    K: int,
    T: float,
    alias: Optional["AliasTables"] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample negatives + compute [pos; negs]/T logits
    (reference: mem_bank.py:64-79)."""
    bsz = x.shape[0]
    n_data = state.memory.shape[0]
    if alias is None:
        idx = jax.random.randint(key, (bsz, K + 1), 0, n_data)
    else:
        idx = alias.draw(key, (bsz, K + 1))
    idx = idx.at[:, 0].set(y.astype(idx.dtype))
    w = state.memory[idx]                                  # (B, K+1, dim)
    logits = jnp.einsum("bkd,bd->bk", w, x,
                        preferred_element_type=jnp.float32) / T
    labels = jnp.zeros((bsz,), jnp.int32)
    return logits, labels


def bank_update(state: BankState, all_x: jnp.ndarray, all_y: jnp.ndarray,
                m: float) -> BankState:
    """EMA row update + renormalize on the globally gathered features
    (reference: _update_memory, mem_bank.py:15-28)."""
    all_x = jax.lax.stop_gradient(all_x).astype(state.memory.dtype)
    w_pos = state.memory[all_y]
    updated = l2_normalize(w_pos * m + all_x * (1.0 - m), axis=-1)
    return BankState(memory=state.memory.at[all_y].set(updated))


class AliasTables(NamedTuple):
    """O(1) multinomial sampling via alias tables
    (reference: lib/memory/alias_multinomial.py:4-65).

    Tables are built host-side with numpy; ``draw`` runs on device as two
    gathers and a Bernoulli against the stored acceptance probability.
    """

    prob: jnp.ndarray   # (N,) acceptance probabilities
    alias: jnp.ndarray  # (N,) alias indices

    @staticmethod
    def build(probs: np.ndarray) -> "AliasTables":
        probs = np.asarray(probs, dtype=np.float64)
        probs = probs / probs.sum()
        n = len(probs)
        scaled = probs * n
        prob = np.zeros(n)
        alias = np.zeros(n, dtype=np.int64)
        smaller = [i for i, p in enumerate(scaled) if p < 1.0]
        larger = [i for i, p in enumerate(scaled) if p >= 1.0]
        while smaller and larger:
            small, large = smaller.pop(), larger.pop()
            prob[small] = scaled[small]
            alias[small] = large
            scaled[large] = scaled[large] - (1.0 - scaled[small])
            (smaller if scaled[large] < 1.0 else larger).append(large)
        for rest in smaller + larger:
            prob[rest] = 1.0
        return AliasTables(prob=jnp.asarray(prob, jnp.float32),
                           alias=jnp.asarray(alias, jnp.int32))

    def draw(self, key: jax.Array, shape) -> jnp.ndarray:
        """Vectorized alias draw (reference: alias_multinomial.py:49-65)."""
        n = self.prob.shape[0]
        k_idx, k_acc = jax.random.split(key)
        kk = jax.random.randint(k_idx, shape, 0, n)
        accept = jax.random.uniform(k_acc, shape) < self.prob[kk]
        return jnp.where(accept, kk, self.alias[kk])


class CmcBankState(NamedTuple):
    """Two-modality bank (reference: mem_bank.py:93-154)."""

    memory_1: jnp.ndarray
    memory_2: jnp.ndarray


def init_cmc_bank(key: jax.Array, n_data: int, dim: int,
                  dtype=jnp.float32) -> CmcBankState:
    k1, k2 = jax.random.split(key)
    return CmcBankState(
        memory_1=l2_normalize(jax.random.normal(k1, (n_data, dim), dtype), -1),
        memory_2=l2_normalize(jax.random.normal(k2, (n_data, dim), dtype), -1),
    )


def cmc_bank_logits(state: CmcBankState, x1, x2, y, key, K: int, T: float):
    """Cross-modal logits: x1 against modality-2 memory and vice versa
    (reference: mem_bank.py:107-141)."""
    bsz = x1.shape[0]
    n_data = state.memory_1.shape[0]
    idx = jax.random.randint(key, (bsz, K + 1), 0, n_data)
    idx = idx.at[:, 0].set(y.astype(idx.dtype))
    w1 = state.memory_1[idx]
    w2 = state.memory_2[idx]
    logits1 = jnp.einsum("bkd,bd->bk", w2, x1,
                         preferred_element_type=jnp.float32) / T
    logits2 = jnp.einsum("bkd,bd->bk", w1, x2,
                         preferred_element_type=jnp.float32) / T
    labels = jnp.zeros((bsz,), jnp.int32)
    return logits1, logits2, labels


def cmc_bank_update(state: CmcBankState, all_x1, all_x2, all_y,
                    m: float) -> CmcBankState:
    s1 = bank_update(BankState(state.memory_1), all_x1, all_y, m)
    s2 = bank_update(BankState(state.memory_2), all_x2, all_y, m)
    return CmcBankState(memory_1=s1.memory, memory_2=s2.memory)
