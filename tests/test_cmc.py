"""CMC (two-modality) pretraining: model, memories, and jitted steps.

The reference defines the CMC memories and criteria (lib/memory/
mem_moco.py:91-142, mem_bank.py:93-154, build.py:5-13 dispatching on
CROSS.MODALITY) but its tools never build the second encoder; here the
full path — CmcWrapper (RGB + temporal-difference encoders), dual
queue/bank state, cmc moco/bank steps — runs end-to-end.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_graph_ssl_tpu.engine import (
    create_pretrain_state,
    make_pretrain_step,
)
from video_graph_ssl_tpu.models import create_visual_model, temporal_diff

B, T, H, W = 4, 4, 16, 16
N_DATA = 32


def _batch():
    g = np.random.default_rng(0)
    return {
        "clips": jnp.asarray(g.normal(size=(B, 2, T, H, W, 3)), jnp.float32),
        "label": jnp.zeros((B,), jnp.int32),
        "index": jnp.arange(B, dtype=jnp.int32),
    }


def _setup(tiny_cfg, mem_type, criterion="crossentropy"):
    c = tiny_cfg.clone()
    c.CONTRAST.MEM_TYPE = mem_type
    c.CONTRAST.NCE_K = 16
    c.CROSS.MODALITY = "cross"
    c.CROSS.CRITERION = criterion
    model, _ = create_visual_model(c)
    batch = _batch()
    state, tx = create_pretrain_state(c, model, batch["clips"][:2, 0],
                                      n_data=N_DATA)
    step = jax.jit(make_pretrain_step(c, model, tx, n_data=N_DATA),
                   donate_argnums=0)
    return c, state, step, batch


def test_temporal_diff_shape_and_values():
    x = jnp.arange(2 * 4 * 2 * 2 * 3, dtype=jnp.float32).reshape(
        2, 4, 2, 2, 3)
    d = temporal_diff(x)
    assert d.shape == x.shape
    np.testing.assert_allclose(np.asarray(d[:, 1]),
                               np.asarray(x[:, 1] - x[:, 0]))
    # front frame replicates the first difference
    np.testing.assert_allclose(np.asarray(d[:, 0]), np.asarray(d[:, 1]))


def test_cmc_model_two_encoders(tiny_cfg):
    c = tiny_cfg.clone()
    c.CROSS.MODALITY = "cross"
    c.CONTRAST.MEM_TYPE = "moco"
    model, _ = create_visual_model(c)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, T, H, W, 3)),
                    jnp.float32)
    v = jax.jit(lambda: model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "graph": jax.random.key(2)}, x, train=False))()
    assert set(v["params"]) == {"model_1", "model_2"}
    f1, f2 = jax.jit(lambda v: model.apply(v, x, train=False))(v)
    assert f1.shape == f2.shape == (2, int(c.CROSS.FEAT_DIM))
    # both streams are L2-normalized
    np.testing.assert_allclose(np.linalg.norm(np.asarray(f1), axis=-1),
                               1.0, rtol=1e-3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(f2), axis=-1),
                               1.0, rtol=1e-3)


def test_cmc_moco_step(tiny_cfg):
    c, state, step, batch = _setup(tiny_cfg, "moco")
    q1_0 = np.asarray(state.contrast.queue_1).copy()
    q2_0 = np.asarray(state.contrast.queue_2).copy()
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch, 0.5)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert "top1" in metrics
    # both queues advanced by 3 enqueues of B rows
    assert int(state.contrast.ptr) == 3 * B
    assert not np.allclose(q1_0[:B], np.asarray(state.contrast.queue_1[:B]))
    assert not np.allclose(q2_0[:B], np.asarray(state.contrast.queue_2[:B]))
    # training on one batch reduces the summed InfoNCE loss
    assert losses[-1] < losses[0]


def test_cmc_checkpoint_downstream_surgery(tiny_cfg):
    """transfer_encoder_params picks the modality-1 encoder out of a CMC
    checkpoint tree (downstream fine-tune from CMC pretraining)."""
    import jax
    from video_graph_ssl_tpu.utils.checkpoint import transfer_encoder_params

    c, state, step, batch = _setup(tiny_cfg, "moco")
    ssl_sd = {"params": state.params, "batch_stats": state.batch_stats}
    target_p = {"encoder": None, "new_fc": {"kernel": np.ones((2, 2))}}
    new_p, new_s = transfer_encoder_params(ssl_sd, target_p, {})
    ssl_leaf = jax.tree_util.tree_leaves(
        state.params["model_1"]["encoder"])[0]
    got_leaf = jax.tree_util.tree_leaves(new_p["encoder"])[0]
    np.testing.assert_allclose(np.asarray(ssl_leaf), np.asarray(got_leaf))
    np.testing.assert_allclose(new_p["new_fc"]["kernel"], 1.0)


def test_cmc_bank_step(tiny_cfg):
    # criterion fixed to crossentropy: the reference feeds RAW (dot/T)
    # scores into NCECriterion (mem_bank.py:30-40 + criterion.py:8-31),
    # whose log() NaNs whenever a similarity is negative — we keep that
    # behavior for parity (NCE numerics are golden-tested with positive
    # scores in tests/test_memory.py) and its tools default to
    # crossentropy exactly like ours.
    c, state, step, batch = _setup(tiny_cfg, "bank", "crossentropy")
    m1_0 = np.asarray(state.contrast.memory_1).copy()
    m2_0 = np.asarray(state.contrast.memory_2).copy()
    state, metrics = step(state, batch, 0.1)
    assert np.isfinite(float(metrics["loss"]))
    # the batch's bank rows moved in BOTH modality memories, others didn't
    m1 = np.asarray(state.contrast.memory_1)
    m2 = np.asarray(state.contrast.memory_2)
    assert not np.allclose(m1_0[:B], m1[:B])
    assert not np.allclose(m2_0[:B], m2[:B])
    np.testing.assert_allclose(m1_0[B:], m1[B:])
    np.testing.assert_allclose(m2_0[B:], m2[B:])
