"""Checkpoint round-trip + SSL->downstream encoder surgery."""

import numpy as np
import jax
import jax.numpy as jnp

from video_graph_ssl_tpu.engine import create_downstream_state, create_pretrain_state
from video_graph_ssl_tpu.models import create_video_model, create_visual_model
from video_graph_ssl_tpu.utils import (
    load_checkpoint_state,
    load_params_only,
    save_checkpoint_state,
    transfer_encoder_params,
)


def _tree_allclose(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype,
                                                         jax.dtypes.prng_key):
            x = jax.random.key_data(x)
            y = jax.random.key_data(y)
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_roundtrip_pretrain_state(tiny_cfg, tmp_path):
    c = tiny_cfg.clone()
    c.CONTRAST.MEM_TYPE = "moco"
    model, _ = create_visual_model(c)
    x = jnp.zeros((2, 4, 16, 16, 3), jnp.float32)
    state, tx = create_pretrain_state(c, model, x, n_data=16)

    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint_state(path, state, epoch=7, best_pred=1.5)
    restored, meta = load_checkpoint_state(path, state)
    assert meta["epoch"] == 7 and meta["best_pred"] == 1.5
    _tree_allclose(state.params, restored.params)
    _tree_allclose(state.ema_params, restored.ema_params)
    np.testing.assert_allclose(np.asarray(state.contrast.queue),
                               np.asarray(restored.contrast.queue))
    # rng key survives and still works
    jax.random.fold_in(restored.rng, 0)


def test_encoder_surgery(tiny_cfg, tmp_path):
    c = tiny_cfg.clone()
    c.CONTRAST.MEM_TYPE = "simsiam"
    ssl_model, _ = create_visual_model(c)
    x2 = jnp.zeros((2, 2, 4, 16, 16, 3), jnp.float32)
    ssl_state, _tx = create_pretrain_state(c, ssl_model, x2, n_data=16)
    path = str(tmp_path / "ssl.msgpack")
    save_checkpoint_state(path, ssl_state, epoch=1)

    ds_model, _ = create_video_model(c)
    x1 = jnp.zeros((2, 4, 16, 16, 3), jnp.float32)
    ds_state, _tx2 = create_downstream_state(c, ds_model, x1)
    fc_before = np.asarray(ds_state.params["new_fc"]["kernel"]).copy()

    ssl_sd, meta = load_params_only(path)
    new_params, new_stats = transfer_encoder_params(
        ssl_sd, dict(ds_state.params), dict(ds_state.batch_stats))

    # encoder params now equal the SSL encoder's
    ssl_enc_leaf = jax.tree_util.tree_leaves(
        ssl_sd["params"]["model"]["encoder"])[0]
    ds_enc_leaf = jax.tree_util.tree_leaves(new_params["encoder"])[0]
    np.testing.assert_allclose(np.asarray(ssl_enc_leaf),
                               np.asarray(ds_enc_leaf))
    # new_fc untouched (reference skips it, train_ds.py:70-79)
    np.testing.assert_allclose(np.asarray(new_params["new_fc"]["kernel"]),
                               fc_before)

    # surgically assembled model still runs
    ds_state = ds_state.replace(params=new_params, batch_stats=new_stats)
    logits = jax.jit(lambda s, x: ds_model.apply(
        {"params": s.params, "batch_stats": s.batch_stats}, x,
        train=False))(ds_state, x1)
    assert logits.shape == (2, int(tiny_cfg.DATASET.NUM_CLASS))


def test_resume_is_bit_exact(tiny_cfg, tmp_path):
    """Training N steps straight == training k, checkpointing, restoring,
    and training N-k more (deterministic data + step-derived rngs +
    saved optimizer/queue state)."""
    import numpy as np
    from video_graph_ssl_tpu.engine import make_pretrain_step

    c = tiny_cfg.clone()
    c.CONTRAST.MEM_TYPE = "moco"
    model, _ = create_visual_model(c)
    g = np.random.default_rng(0)
    batches = [
        {"clips": jnp.asarray(g.normal(size=(4, 2, 4, 16, 16, 3)),
                              jnp.float32),
         "label": jnp.zeros(4, jnp.int32),
         "index": jnp.arange(4, dtype=jnp.int32)}
        for _ in range(4)
    ]
    example = batches[0]["clips"][:2, 0]

    def fresh():
        state, tx = create_pretrain_state(c, model, example, n_data=16)
        step = jax.jit(make_pretrain_step(c, model, tx), donate_argnums=0)
        return state, step

    # straight run
    state_a, step = fresh()
    for b in batches:
        state_a, _ = step(state_a, b, 0.1)

    # interrupted run
    state_b, step = fresh()
    for b in batches[:2]:
        state_b, _ = step(state_b, b, 0.1)
    path = str(tmp_path / "mid.msgpack")
    save_checkpoint_state(path, state_b, epoch=0)
    template, _tx = create_pretrain_state(c, model, example, n_data=16)
    state_b, _meta = load_checkpoint_state(path, template)
    for b in batches[2:]:
        state_b, _ = step(state_b, b, 0.1)

    for pa, pb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    np.testing.assert_array_equal(np.asarray(state_a.contrast.queue),
                                  np.asarray(state_b.contrast.queue))
    assert int(state_a.contrast.ptr) == int(state_b.contrast.ptr)


def test_orbax_roundtrip(tiny_cfg, tmp_path):
    """Orbax sharded backend: save -> restore (with template shardings) ->
    bit-equality; async save commits on wait; load_params_only reads the
    same raw tree for checkpoint surgery."""
    from video_graph_ssl_tpu.utils import (
        load_checkpoint_any,
        save_checkpoint_orbax,
        wait_for_async_checkpoints,
    )

    c = tiny_cfg.clone()
    c.CONTRAST.MEM_TYPE = "moco"
    model, _ = create_visual_model(c)
    x = jnp.zeros((2, 4, 16, 16, 3), jnp.float32)
    state, tx = create_pretrain_state(c, model, x, n_data=16)

    path = str(tmp_path / "ckpt.orbax")
    save_checkpoint_orbax(path, state, epoch=3, best_pred=0.25)
    restored, meta = load_checkpoint_any(path, state)
    assert meta["epoch"] == 3 and meta["best_pred"] == 0.25
    _tree_allclose(state.params, restored.params)
    _tree_allclose(state.ema_params, restored.ema_params)
    np.testing.assert_allclose(np.asarray(state.contrast.queue),
                               np.asarray(restored.contrast.queue))
    jax.random.fold_in(restored.rng, 0)

    # raw read (surgery path) sees the same encoder params
    raw, meta2 = load_params_only(path)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(raw["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(
            jax.device_get(state.params))[0]))

    # async save: must be committed after the barrier
    apath = str(tmp_path / "ckpt_async.orbax")
    save_checkpoint_orbax(apath, state, epoch=4, async_save=True)
    wait_for_async_checkpoints()
    restored2, meta3 = load_checkpoint_any(apath, state)
    assert meta3["epoch"] == 4
    _tree_allclose(state.params, restored2.params)
