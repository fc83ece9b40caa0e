"""Registry completeness (resnet3d_200, resnet_i3d family) and the
lr_spaces scheduler family (reference lib/solver/lr_helper.py:77-206)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_graph_ssl_tpu.models.build import BACKBONES_3D
from video_graph_ssl_tpu.solver import build_lr_spaces


def test_new_registry_entries_constructible():
    for name in ("resnet3d_200", "resnet_i3d_18", "resnet_i3d_50",
                 "resnet_i3d_101"):
        ctor, feat, aug = BACKBONES_3D[name]
        m = ctor(num_classes=None, aug_points=(), graph_cfg=None,
                 remat=False, dtype=jnp.float32)
        assert m.feature_dim == feat


@pytest.mark.slow
def test_resnet_i3d_forward_shapes():
    """Factorized blocks (reference resnet_i3d.py:56-138): forward shape
    smoke test for the basic and bottleneck variants."""
    x = jnp.zeros((1, 8, 32, 32, 3), jnp.float32)
    for name, feat in (("resnet_i3d_18", 512), ("resnet_i3d_50", 2048)):
        ctor, feat_reg, _ = BACKBONES_3D[name]
        assert feat_reg == feat
        m = ctor(num_classes=None, dtype=jnp.float32)
        v = jax.jit(lambda x, m=m: m.init({"params": jax.random.key(0)}, x,
                                          train=False))(x)
        out = jax.jit(lambda v, x, m=m: m.apply(v, x, train=False))(v, x)
        assert out.shape == (1, feat)


# ---------------------------------------------------------------------------
# lr_spaces golden tests: each expected array is written straight from the
# reference formulas (lr_helper.py:94-165), independently of our code.
# ---------------------------------------------------------------------------
def test_log_space():
    got = build_lr_spaces({"type": "log", "start_lr": 0.03, "end_lr": 5e-4},
                          epochs=50)
    exp = np.logspace(math.log10(0.03), math.log10(5e-4), 50)
    np.testing.assert_allclose(got, exp, rtol=1e-12)
    assert got[0] == pytest.approx(0.03) and got[-1] == pytest.approx(5e-4)


def test_step_space_plain_and_end_lr_solved():
    got = build_lr_spaces({"type": "step", "start_lr": 0.01, "step": 10,
                           "mult": 0.1}, epochs=50)
    exp = 0.01 * (0.1 ** (np.arange(50) // 10))
    np.testing.assert_allclose(got, exp, rtol=1e-12)
    # end_lr given -> mult solved as (end/start)^(1/(epochs//step))
    # (lr_helper.py:106-111)
    got = build_lr_spaces({"type": "step", "start_lr": 0.001,
                           "end_lr": 0.03, "step": 1}, epochs=5)
    mult = (0.03 / 0.001) ** (1.0 / 5)
    exp = 0.001 * (mult ** np.arange(5))
    np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_multi_step_space():
    got = build_lr_spaces({"type": "multi-step", "start_lr": 0.01,
                           "mult": 0.1, "steps": [10, 15, 20]}, epochs=30)
    exp = np.empty(30)
    exp[0] = 0.01
    for i in range(1, 30):
        exp[i] = exp[i - 1] * (0.1 if i in (10, 15, 20) else 1.0)
    np.testing.assert_allclose(got, exp, rtol=1e-10)


def test_linear_and_cos_spaces():
    got = build_lr_spaces({"type": "linear", "start_lr": 0.01,
                           "end_lr": 0.005}, epochs=20)
    np.testing.assert_allclose(got, np.linspace(0.01, 0.005, 20), rtol=1e-12)

    got = build_lr_spaces({"type": "cos", "start_lr": 0.01,
                           "end_lr": 0.0005}, epochs=40)
    idx = np.arange(40, dtype=np.float64)
    exp = 0.0005 + (0.01 - 0.0005) * (1 + np.cos(idx * np.pi / 40)) * 0.5
    np.testing.assert_allclose(got, exp, rtol=1e-10)
    assert got[0] == pytest.approx(0.01)


def test_warmup_composition():
    """WarmUPScheduler concatenates warmup and normal spaces
    (lr_helper.py:168-177, 198-203): warmup epochs come out of the total."""
    spec = {"type": "log", "start_lr": 0.03, "end_lr": 5e-4,
            "warmup": {"type": "step", "start_lr": 0.001, "end_lr": 0.03,
                       "step": 1, "epoch": 5}}
    got = build_lr_spaces(spec, epochs=55)
    assert got.shape == (55,)
    # warmup ramps from 0.001; the normal part is the 50-epoch log space
    assert got[0] == pytest.approx(0.001)
    np.testing.assert_allclose(
        got[5:], np.logspace(math.log10(0.03), math.log10(5e-4), 50),
        rtol=1e-12)


def test_unknown_type_raises():
    with pytest.raises(ValueError):
        build_lr_spaces({"type": "bogus"}, epochs=10)
