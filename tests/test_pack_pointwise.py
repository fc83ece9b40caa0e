"""Packed-pointwise inception path (TPU.PACK_POINTWISE) exactness tests.

The packed path computes branch0 + branch1_reduce + branch2_reduce as ONE
1x1x1 convolution over concatenated output channels (layers.InceptionBlock)
— an MXU-shape optimization with the SAME math and the SAME checkpoint
tree as the reference branch structure
(lib/modeling/backbone/backbone_3d/s3d_1.py:71-329).  These tests pin:

* identical parameter/batch_stats trees (paths, shapes, AND init values —
  flax derives per-param RNG from the path, so equal paths must give
  equal values),
* identical forward output in eval and train mode,
* identical BN running-stat updates,
* identical parameter gradients,
* the same S3D variables evaluate identically under either setting
  (checkpoint compatibility in both directions).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK_KW = dict(b0=8, b1=(4, 8), b2=(4, 8), b3=8)


def _block(packed: bool):
    import jax.numpy as jnp
    from video_graph_ssl_tpu.models.layers import InceptionBlock

    return InceptionBlock(pack_pointwise=packed, dtype=jnp.float32,
                          param_dtype=jnp.float32, **BLOCK_KW)


def _init(mod):
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4, 8, 8, 16)),
        jnp.float32)
    v = jax.jit(mod.init)(jax.random.key(7), x)
    return v, x


def _tree_eq(a, b):
    import jax

    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (pa, va), (_, vb) in zip(la, lb):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=0, atol=0, err_msg=str(pa))


def test_param_tree_identical_incl_values():
    va, _ = _init(_block(False))
    vb, _ = _init(_block(True))
    _tree_eq(va, vb)


def test_forward_eval_and_train_identical():
    import jax

    mod_u, mod_p = _block(False), _block(True)
    v, x = _init(mod_u)

    y_u = mod_u.apply(v, x, train=False)
    y_p = mod_p.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y_u), np.asarray(y_p),
                               rtol=1e-6, atol=1e-6)

    y_u, mu = mod_u.apply(v, x, train=True, mutable=["batch_stats"])
    y_p, mp = mod_p.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_u), np.asarray(y_p),
                               rtol=1e-6, atol=1e-6)
    la = jax.tree_util.tree_leaves_with_path(mu)
    lb = jax.tree_util.tree_leaves_with_path(mp)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (p, a), (_, b) in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=str(p))


def test_gradients_identical():
    import jax
    import jax.numpy as jnp

    mod_u, mod_p = _block(False), _block(True)
    v, x = _init(mod_u)

    def loss(mod):
        def f(params):
            y, _ = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(y * y)
        return jax.grad(f)(v["params"])

    gu, gp = loss(mod_u), loss(mod_p)
    la = jax.tree_util.tree_leaves_with_path(gu)
    lb = jax.tree_util.tree_leaves_with_path(gp)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (p, a), (_, b) in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=str(p))


def test_s3d_checkpoint_compatible_both_ways():
    """One S3D variable tree evaluates identically packed and unpacked."""
    import jax
    import jax.numpy as jnp
    from video_graph_ssl_tpu.models.s3d import S3D

    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 8, 32, 32, 3)),
        jnp.float32)
    kw = dict(num_classes=None, dtype=jnp.float32, param_dtype=jnp.float32)
    m_u = S3D(pack_pointwise=False, **kw)
    m_p = S3D(pack_pointwise=True, **kw)
    v = jax.jit(m_u.init)({"params": jax.random.key(0)}, x)
    y_u = jax.jit(lambda v, x: m_u.apply(v, x, train=False))(v, x)
    y_p = jax.jit(lambda v, x: m_p.apply(v, x, train=False))(v, x)
    np.testing.assert_allclose(np.asarray(y_u), np.asarray(y_p),
                               rtol=2e-5, atol=2e-5)


def test_i3d_block_packed_matches_unpacked():
    """I3DMixed: identical tree values, forward, and BN-stat updates."""
    import jax
    import jax.numpy as jnp
    from video_graph_ssl_tpu.models.i3d import I3DMixed

    x = jnp.asarray(
        np.random.default_rng(5).standard_normal((2, 4, 8, 8, 16)),
        jnp.float32)
    kw = dict(dtype=jnp.float32, param_dtype=jnp.float32, **BLOCK_KW)
    m_u = I3DMixed(pack_pointwise=False, **kw)
    m_p = I3DMixed(pack_pointwise=True, **kw)
    vu = jax.jit(m_u.init)(jax.random.key(3), x)
    vp = jax.jit(m_p.init)(jax.random.key(3), x)
    _tree_eq(vu, vp)
    y_u, mu = m_u.apply(vu, x, True, mutable=["batch_stats"])
    y_p, mp = m_p.apply(vu, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_u), np.asarray(y_p),
                               rtol=1e-6, atol=1e-6)
    for (p, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(mu),
                              jax.tree_util.tree_leaves_with_path(mp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=str(p))


def test_config_gate_ignores_non_inception():
    """PACK_POINTWISE defaults ON (chip-measured +1.2-1.3%); for
    backbones without sibling 1x1x1 branches to pack it must be a
    silent structural no-op, not an error (models/build.py gate)."""
    from video_graph_ssl_tpu.config import cfg as CFG
    from video_graph_ssl_tpu.models.build import encoder_cfg_from

    cfg = CFG.clone()
    cfg.MODEL.BACKBONE_TYPE = "3D"
    cfg.MODEL.BACKBONE = "resnet3d_18"
    cfg.TPU.PACK_POINTWISE = True
    kwargs, feat_dim = encoder_cfg_from(cfg, aug_flag=False)
    ctor = kwargs["backbone_ctor"]
    kw = getattr(ctor, "keywords", {}) or {}
    assert "pack_pointwise" not in kw
    assert feat_dim == 512
