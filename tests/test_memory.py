"""Contrast memories + criteria: golden values vs manual math and torch.

The reference ships no tests (SURVEY.md §4); criteria here are verified
against torch (CPU) implementations of the same formulas."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_graph_ssl_tpu.memory import (
    AliasTables,
    bank_logits,
    bank_update,
    init_bank,
    init_moco,
    moco_enqueue,
    moco_logits,
    nce_criterion,
    nce_softmax_loss,
)
from video_graph_ssl_tpu.memory.moco import MocoState
from video_graph_ssl_tpu.models import simsiam_d


def test_moco_logits_golden():
    q = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    k = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
    queue = jnp.asarray([[0.0, 1.0], [1.0, 0.0], [0.5, 0.5]])
    T = 0.5
    logits, labels = jax.jit(lambda q, k, Q: moco_logits(q, k, Q, T))(q, k, queue)
    # row 0: pos=1, negs=[0,1,0.5]; all / T
    np.testing.assert_allclose(np.asarray(logits[0]),
                               np.asarray([1, 0, 1, 0.5]) / T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(logits[1]),
                               np.asarray([0, 1, 0, 0.5]) / T, rtol=1e-6)
    assert labels.tolist() == [0, 0]


def test_moco_enqueue_wraparound():
    state = init_moco(jax.random.key(0), K=8, dim=4)
    state = state._replace(ptr=jnp.asarray(6, jnp.int32))
    keys = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    new = jax.jit(moco_enqueue)(state, keys)
    # rows 6,7 then wrap to 0
    np.testing.assert_allclose(np.asarray(new.queue[6]), np.asarray(keys[0]))
    np.testing.assert_allclose(np.asarray(new.queue[7]), np.asarray(keys[1]))
    np.testing.assert_allclose(np.asarray(new.queue[0]), np.asarray(keys[2]))
    assert int(new.ptr) == (6 + 3) % 8


def test_bank_update_ema_normalized():
    state = init_bank(jax.random.key(0), n_data=10, dim=4)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4)), jnp.float32)
    y = jnp.asarray([1, 5, 7], jnp.int32)
    m = 0.5
    old_rows = np.asarray(state.memory)[np.asarray(y)]
    new = jax.jit(lambda s, x, y: bank_update(s, x, y, m))(state, x, y)
    rows = np.asarray(new.memory)[np.asarray(y)]
    expect = old_rows * m + np.asarray(x) * (1 - m)
    expect = expect / np.linalg.norm(expect, axis=1, keepdims=True)
    np.testing.assert_allclose(rows, expect, rtol=1e-5)
    # untouched rows unchanged
    np.testing.assert_allclose(np.asarray(new.memory)[0],
                               np.asarray(state.memory)[0])
    # updated rows are unit-norm
    np.testing.assert_allclose(np.linalg.norm(rows, axis=1), 1.0, rtol=1e-5)


def test_bank_logits_positive_slot():
    state = init_bank(jax.random.key(0), n_data=32, dim=8)
    x = np.asarray(state.memory)[:4]  # anchors equal to their bank rows
    y = jnp.arange(4, dtype=jnp.int32)
    logits, labels = jax.jit(
        lambda s, x, y, k: bank_logits(s, jnp.asarray(x), y, k, K=8, T=1.0)
    )(state, x, y, jax.random.key(1))
    assert logits.shape == (4, 9)
    # slot 0 is the positive: x . memory[y] == 1 for unit rows
    np.testing.assert_allclose(np.asarray(logits[:, 0]), 1.0, rtol=1e-5)
    assert labels.tolist() == [0, 0, 0, 0]


def test_alias_tables_uniformish():
    probs = np.asarray([0.1, 0.2, 0.3, 0.4])
    tables = AliasTables.build(probs)
    draws = jax.jit(lambda k: tables.draw(k, (20000,)))(jax.random.key(0))
    freq = np.bincount(np.asarray(draws), minlength=4) / 20000.0
    np.testing.assert_allclose(freq, probs, atol=0.02)


def test_infonce_matches_torch():
    torch = pytest.importorskip("torch")
    logits = np.random.default_rng(0).normal(size=(6, 10)).astype(np.float32)
    ours = float(jax.jit(nce_softmax_loss)(jnp.asarray(logits)))
    ref = float(torch.nn.CrossEntropyLoss()(
        torch.tensor(logits), torch.zeros(6, dtype=torch.long)))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_nce_criterion_formula():
    # golden recomputation of the reference formula (criterion.py:8-31)
    x = np.abs(np.random.default_rng(1).normal(size=(4, 6)).astype(np.float32))
    n_data = 100
    m = x.shape[1] - 1
    pn = 1.0 / n_data
    eps = 1e-7
    log_d1 = np.log(x[:, 0] / (x[:, 0] + m * pn + eps))
    log_d0 = np.log((m * pn) / (x[:, 1:] + m * pn + eps))
    expect = -(log_d1.sum() + log_d0.sum()) / x.shape[0]
    ours = float(jax.jit(lambda x: nce_criterion(x, n_data))(jnp.asarray(x)))
    assert ours == pytest.approx(float(expect), rel=1e-5)


def test_simsiam_d_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    p = np.random.default_rng(2).normal(size=(5, 16)).astype(np.float32)
    z = np.random.default_rng(3).normal(size=(5, 16)).astype(np.float32)
    ours = float(jax.jit(simsiam_d)(jnp.asarray(p), jnp.asarray(z)))
    ref = float(-F.cosine_similarity(torch.tensor(p), torch.tensor(z),
                                     dim=-1).mean())
    assert ours == pytest.approx(ref, rel=1e-5)


def test_simsiam_d_stops_gradient_on_z():
    p = jnp.ones((2, 4))
    z = jnp.ones((2, 4))
    gz = jax.grad(lambda z: simsiam_d(p, z))(z)
    assert float(jnp.abs(gz).max()) == 0.0
    gp = jax.grad(lambda p: simsiam_d(p, z))(p)
    assert bool(jnp.all(jnp.isfinite(gp)))
