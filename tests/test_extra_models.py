"""Non-local I3D-ResNet and text-video S3DG (reference's unexported
backbone families)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_graph_ssl_tpu.models import (
    NonLocalBlock3D,
    S3DGText,
    SelfGating,
    SentenceEmbedding,
    build_word_to_token,
    space_to_depth_3d,
    tokenize,
)
from video_graph_ssl_tpu.models.build import BACKBONES_3D


def test_nonlocal_block_identity_at_init():
    """Zero-init output BN makes the block the identity at init
    (reference zero-inits the final BN weight, i3dnon.py:300-309)."""
    m = NonLocalBlock3D(dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 8, 8, 16)),
                    jnp.float32)
    v = jax.jit(lambda x: m.init({"params": jax.random.key(0)}, x,
                                 train=False))(x)
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5)


def test_nonlocal_block_nontrivial_after_scale():
    m = NonLocalBlock3D(dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 8, 8, 16)),
                    jnp.float32)
    v = jax.jit(lambda x: m.init({"params": jax.random.key(0)}, x,
                                 train=False))(x)
    v = jax.tree_util.tree_map(lambda a: a, v)
    v["params"]["w_bn"]["bn"]["scale"] = jnp.ones_like(
        v["params"]["w_bn"]["bn"]["scale"])
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    assert not np.allclose(np.asarray(out), np.asarray(x))


@pytest.mark.slow
def test_i3d_res50_nonlocal_registered():
    ctor, feat, _ = BACKBONES_3D["i3d_res50_nonlocal"]
    m = ctor(num_classes=None, aug_points=(), graph_cfg=None, remat=False,
             dtype=jnp.float32)
    x = jnp.zeros((1, 8, 32, 32, 3), jnp.float32)
    v = jax.jit(lambda x: m.init({"params": jax.random.key(0)}, x,
                                 train=False))(x)
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    assert out.shape == (1, feat)


def test_space_to_depth():
    x = jnp.arange(2 * 4 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 4, 3)
    y = space_to_depth_3d(x)
    assert y.shape == (2, 2, 2, 2, 24)
    # energy preserved (pure reshuffle)
    np.testing.assert_allclose(float(jnp.sum(x)), float(jnp.sum(y)))


def test_self_gating_bounds():
    m = SelfGating(dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 4, 8)),
                    jnp.float32)
    v = jax.jit(lambda x: m.init(jax.random.key(0), x))(x)
    out = jax.jit(lambda v, x: m.apply(v, x))(v, x)
    # gated output magnitude bounded by input (sigmoid in (0,1))
    assert np.all(np.abs(np.asarray(out)) <= np.abs(np.asarray(x)) + 1e-6)


def test_tokenizer():
    w2t = build_word_to_token(["the", "dog", "runs"])
    ids = tokenize(["The DOG runs far", "", "unknown words only"], w2t,
                   max_words=4)
    np.testing.assert_array_equal(ids[0], [1, 2, 3, 0])
    np.testing.assert_array_equal(ids[1], [0, 0, 0, 0])
    np.testing.assert_array_equal(ids[2], [0, 0, 0, 0])


def test_sentence_embedding_padding_invariance():
    m = SentenceEmbedding(embd_dim=8, num_embeddings=50)
    ids1 = jnp.asarray([[3, 7, 0, 0]], jnp.int32)
    ids2 = jnp.asarray([[3, 7, 0, 0, 0, 0, 0, 0]], jnp.int32)
    v = jax.jit(lambda ids: m.init(jax.random.key(0), ids))(ids1)
    e1 = jax.jit(lambda v, ids: m.apply(v, ids))(v, ids1)
    e2 = jax.jit(lambda v, ids: m.apply(v, ids))(v, ids2)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-5)


@pytest.mark.slow
def test_s3dg_text_joint_embedding():
    m = S3DGText(embd_dim=32, num_text_embeddings=64, dtype=jnp.float32)
    video = jnp.zeros((2, 8, 64, 64, 3), jnp.float32)
    ids = jnp.asarray([[1, 2, 0, 0], [3, 0, 0, 0]], jnp.int32)
    v = jax.jit(lambda vid, ids: m.init({"params": jax.random.key(0)},
                                        vid, ids, train=False))(video, ids)
    out = jax.jit(lambda v, vid, ids: m.apply(v, vid, ids,
                                              train=False))(v, video, ids)
    assert out["video_embedding"].shape == (2, 32)
    assert out["text_embedding"].shape == (2, 32)
