"""CMC memory golden tests vs the EXECUTED reference modules.

The single-modality queue/bank paths are torch-checked in
test_memory.py; these pin the cross-modal variants — CMCMoCo's swapped
queue scoring + dual-queue enqueue (lib/memory/mem_moco.py:91-142) and
CMCMem's shared-index dual-bank logits + dual EMA update
(lib/memory/mem_bank.py:93-154) — against the reference classes run on
CPU with pinned negatives.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_ROOT = "/root/reference"


def _ref_memory():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF_ROOT)
    torch.Tensor.cuda = lambda self, *a, **kw: self
    from lib.memory.alias_multinomial import AliasMethod
    AliasMethod.cuda = lambda self, *a, **kw: None
    from lib.memory import mem_bank, mem_moco
    return torch, mem_bank, mem_moco


def test_cmc_moco_matches_reference():
    torch, _mb, mem_moco = _ref_memory()
    import jax
    import jax.numpy as jnp

    from video_graph_ssl_tpu.memory.moco import (CmcMocoState,
                                                 cmc_moco_enqueue,
                                                 cmc_moco_forward)

    g = np.random.default_rng(0)
    B, D, K, T = 4, 8, 16, 0.07
    q1, k1, q2, k2 = (g.standard_normal((B, D)).astype(np.float32)
                      for _ in range(4))
    ref2 = mem_moco.CMCMoCo(n_dim=D, K=K, T=T)
    # snapshot the queues BEFORE forward (it enqueues in place)
    m1 = ref2.memory_1.clone().numpy()
    m2 = ref2.memory_2.clone().numpy()
    with torch.no_grad():
        l1_ref, l2_ref, labels_ref = ref2(
            torch.tensor(q1), torch.tensor(k1),
            torch.tensor(q2), torch.tensor(k2))

    state = CmcMocoState(queue_1=jnp.asarray(m1), queue_2=jnp.asarray(m2),
                         ptr=jnp.asarray(0, jnp.int32))
    with jax.default_matmul_precision("highest"):  # fp32 parity on TPU
        l1, l2, labels = cmc_moco_forward(state, jnp.asarray(q1),
                                          jnp.asarray(k1), jnp.asarray(q2),
                                          jnp.asarray(k2), T)
    np.testing.assert_allclose(np.asarray(l1), l1_ref.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l2), l2_ref.numpy(),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(labels) == labels_ref.numpy()).all()

    new = cmc_moco_enqueue(state, jnp.asarray(k1), jnp.asarray(k2))
    np.testing.assert_allclose(np.asarray(new.queue_1),
                               ref2.memory_1.numpy(), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new.queue_2),
                               ref2.memory_2.numpy(), rtol=1e-6, atol=1e-6)
    assert int(new.ptr) == int(ref2.index)


def test_cmc_bank_matches_reference():
    torch, mem_bank, _mm = _ref_memory()
    import jax
    import jax.numpy as jnp

    from video_graph_ssl_tpu.memory.bank import (CmcBankState,
                                                 cmc_bank_logits,
                                                 cmc_bank_update)

    g = np.random.default_rng(1)
    B, D, N, K, T, m = 4, 8, 12, 6, 0.07, 0.5
    ref = mem_bank.CMCMem(n_dim=D, n_data=N, K=K, T=T, m=m)
    m1 = ref.memory_1.clone().numpy()
    m2 = ref.memory_2.clone().numpy()
    # pin the alias draw to a shared matrix (slot 0 overwritten by y on
    # both sides)
    fixed = g.integers(0, N, (B, K + 1)).astype(np.int64)
    flat = torch.from_numpy(np.ascontiguousarray(fixed.reshape(-1))).long()
    ref.multinomial.draw = lambda n: flat[:n].clone()

    x1 = g.standard_normal((B, D)).astype(np.float32)
    x2 = g.standard_normal((B, D)).astype(np.float32)
    y = np.arange(B).astype(np.int64)
    with torch.no_grad():
        l1_ref, l2_ref, labels_ref = ref(
            torch.tensor(x1), torch.tensor(x2), torch.tensor(y))

    state = CmcBankState(memory_1=jnp.asarray(m1), memory_2=jnp.asarray(m2))

    # route our sampler through the same fixed matrix by monkeypatching
    # jax.random.randint for the call (the index contract is identical)
    orig = jax.random.randint
    try:
        jax.random.randint = (
            lambda key, shape, minval, maxval, dtype=jnp.int32:
            jnp.asarray(fixed, dtype))
        with jax.default_matmul_precision("highest"):  # fp32 parity on TPU
            l1, l2, labels = cmc_bank_logits(state, jnp.asarray(x1),
                                             jnp.asarray(x2),
                                             jnp.asarray(y.astype(np.int32)),
                                             jax.random.key(0), K, T)
    finally:
        jax.random.randint = orig
    np.testing.assert_allclose(np.asarray(l1), l1_ref.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l2), l2_ref.numpy(),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(labels) == labels_ref.numpy()).all()

    new = cmc_bank_update(state, jnp.asarray(x1), jnp.asarray(x2),
                          jnp.asarray(y.astype(np.int32)), m)
    np.testing.assert_allclose(np.asarray(new.memory_1),
                               ref.memory_1.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new.memory_2),
                               ref.memory_2.numpy(), rtol=1e-5, atol=1e-5)
