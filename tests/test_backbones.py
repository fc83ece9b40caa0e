"""Backbone registry: every reference-exported backbone builds and runs.

Reference export surface (SURVEY.md §2.9): 3D = S3D, S3DG, I3D,
InceptionI3d (+ unexported R3D / R(2+1)D families); 2D = resnets,
bninception, inception_v3.  Heavy networks are compile-checked at tiny
spatial sizes; exact feature dims asserted against the reference's.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_graph_ssl_tpu.models.build import BACKBONES_2D, BACKBONES_3D


def _run(name, shape):
    table = BACKBONES_3D if name in BACKBONES_3D else BACKBONES_2D
    ctor, feat, _aug = table[name]
    kwargs = dict(num_classes=None, dtype=jnp.float32)
    if name in BACKBONES_3D:
        kwargs.update(aug_points=(), graph_cfg=None, remat=False)
    m = ctor(**kwargs)
    x = jnp.zeros(shape, jnp.float32)
    v = jax.jit(lambda x: m.init({"params": jax.random.key(0)}, x,
                                 train=False))(x)
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    assert out.shape == (shape[0], feat), (name, out.shape, feat)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))
    return n_params


def test_registry_names_cover_reference_exports():
    for name in ("S3D", "S3DG", "I3D", "InceptionI3d", "resnet3d_18",
                 "resnet2p1d_18"):
        assert name in BACKBONES_3D, name
    for name in ("bninception", "inception_v3", "resnet18", "resnet50",
                 "resnet101"):
        assert name in BACKBONES_2D, name


@pytest.mark.slow
def test_s3dg_builds_and_param_count():
    n = _run("S3DG", (1, 4, 32, 32, 3))
    # paper: 8.3M with classifier; encoder-only ~7.9M
    assert 7_500_000 < n < 8_500_000


@pytest.mark.slow
def test_i3d_builds():
    n = _run("I3D", (1, 4, 32, 32, 3))
    assert 12_000_000 < n < 12_500_000


@pytest.mark.slow
def test_r2p1d_builds():
    _run("resnet2p1d_10", (1, 4, 32, 32, 3))


@pytest.mark.slow
def test_bninception_builds():
    n = _run("bninception", (2, 64, 64, 3))
    assert 10_000_000 < n < 10_500_000


@pytest.mark.slow
def test_inception_v3_builds():
    n = _run("inception_v3", (2, 96, 96, 3))
    assert 21_000_000 < n < 22_500_000


def test_s3dg_has_temporal_bias():
    from video_graph_ssl_tpu.models.s3d import S3D

    m = S3D(temporal_bias=True, dtype=jnp.float32)
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    v = jax.jit(lambda x: m.init({"params": jax.random.key(0)}, x,
                                 train=False))(x)
    assert "bias" in v["params"]["stem_0"]["temporal"]["conv"]

    m2 = S3D(temporal_bias=False, dtype=jnp.float32)
    v2 = jax.jit(lambda x: m2.init({"params": jax.random.key(0)}, x,
                                   train=False))(x)
    assert "bias" not in v2["params"]["stem_0"]["temporal"]["conv"]
