"""Solver: LR schedule golden values (WarmupMultiStepLR semantics) and
per-group optimizer behavior."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from video_graph_ssl_tpu.config import cfg
from video_graph_ssl_tpu.engine.build import linear_probe_mask
from video_graph_ssl_tpu.solver import (
    label_params,
    make_lr_scheduler,
    make_optimizer,
    set_learning_rate,
)


def _solver_cfg(**over):
    c = cfg.clone()
    c.SOLVER.BASE_LR = 0.1
    c.SOLVER.WARMUP_ITERS = 5
    c.SOLVER.WARMUP_FACTOR = 0.01
    c.SOLVER.WARMUP_METHOD = "linear"
    c.SOLVER.LR_SCHEDULER = "step"
    c.SOLVER.STEPS = (30, 60)
    c.SOLVER.GAMMA = 0.1
    c.SOLVER.MAX_EPOCHS = 100
    for k, v in over.items():
        parts = k.split(".")
        node = c
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return c


def test_lr_warmup_linear():
    lr = make_lr_scheduler(_solver_cfg())
    # reference lr_scheduler.py:42-48: wf = f*(1-a)+a, a=epoch/warmup
    assert lr(0) == pytest.approx(0.1 * 0.01)
    a = 2 / 5
    assert lr(2) == pytest.approx(0.1 * (0.01 * (1 - a) + a))
    assert lr(5) == pytest.approx(0.1)  # warmup over


def test_lr_step_milestones():
    lr = make_lr_scheduler(_solver_cfg())
    assert lr(29) == pytest.approx(0.1)
    assert lr(30) == pytest.approx(0.01)
    assert lr(60) == pytest.approx(0.001)


def test_lr_poly():
    lr = make_lr_scheduler(_solver_cfg(**{"SOLVER.LR_SCHEDULER": "poly",
                                          "SOLVER.WARMUP_ITERS": 0}))
    assert lr(50) == pytest.approx(0.1 * (1 - 50 / 100) ** 0.9)


def test_lr_cos():
    lr = make_lr_scheduler(_solver_cfg(**{"SOLVER.LR_SCHEDULER": "cos",
                                          "SOLVER.WARMUP_ITERS": 0}))
    assert lr(50) == pytest.approx(0.1 * 0.5 * (1 + math.cos(0.5 * math.pi)))
    assert lr(0) == pytest.approx(0.1)


def _params():
    return {
        "conv": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones((3,))},
        "bn": {"scale": jnp.ones((3,)), "bias": jnp.ones((3,))},
    }


def test_label_params():
    # exact reference non-trick grouping (lib/solver/build.py:36-47): BN
    # scale is a torch ".weight" -> decayed; every ".bias" (incl. BN's)
    # gets the bias treatment
    labels = label_params(_params())
    assert labels["conv"]["kernel"] == "weight"
    assert labels["conv"]["bias"] == "bias"
    assert labels["bn"]["scale"] == "weight"
    assert labels["bn"]["bias"] == "bias"


def test_bias_lr_factor_and_wd():
    c = _solver_cfg(**{"SOLVER.WARMUP_ITERS": 0,
                       "SOLVER.MOMENTUM": 0.0,
                       "SOLVER.WEIGHT_DECAY": 0.0,
                       "SOLVER.BIAS_LR_FACTOR": 2.0})
    params = _params()
    tx = make_optimizer(c, params)
    opt_state = tx.init(params)
    opt_state = set_learning_rate(opt_state, 0.1)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    # weight: -lr * g ; conv bias: -lr * factor * g (reference
    # make_optimizer: bias lr x BIAS_LR_FACTOR, build.py:37-45)
    np.testing.assert_allclose(np.asarray(updates["conv"]["kernel"]), -0.1,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["conv"]["bias"]), -0.2,
                               rtol=1e-6)


def test_weight_decay_only_on_weights():
    c = _solver_cfg(**{"SOLVER.WARMUP_ITERS": 0,
                       "SOLVER.MOMENTUM": 0.0,
                       "SOLVER.WEIGHT_DECAY": 0.5,
                       "SOLVER.BIAS_LR_FACTOR": 1.0})
    params = _params()
    tx = make_optimizer(c, params)
    opt_state = set_learning_rate(tx.init(params), 0.1)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    # every torch-".weight" (incl. BN scale) decays toward 0 even with
    # zero grad; biases (WEIGHT_DECAY_BIAS=0) do not — reference
    # lib/solver/build.py:36-47
    np.testing.assert_allclose(np.asarray(updates["conv"]["kernel"]),
                               -0.1 * 0.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["bn"]["scale"]),
                               -0.1 * 0.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["conv"]["bias"]), 0.0)
    np.testing.assert_allclose(np.asarray(updates["bn"]["bias"]), 0.0)


def test_linear_probe_mask_freezes_everything_but_new_fc():
    params = {"encoder": {"k": jnp.ones(2)}, "new_fc": {"kernel": jnp.ones(2)}}
    mask = linear_probe_mask(params)
    assert mask["new_fc"]["kernel"] is True
    assert mask["encoder"]["k"] is False

    c = _solver_cfg(**{"SOLVER.WARMUP_ITERS": 0, "SOLVER.MOMENTUM": 0.0,
                       "SOLVER.WEIGHT_DECAY": 0.0,
                       "SOLVER.BIAS_LR_FACTOR": 1.0})
    tx = make_optimizer(c, params, trainable_mask=mask)
    opt_state = set_learning_rate(tx.init(params), 0.1)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    np.testing.assert_allclose(np.asarray(updates["encoder"]["k"]), 0.0)
    np.testing.assert_allclose(np.asarray(updates["new_fc"]["kernel"]), -0.1,
                               rtol=1e-6)


def test_momentum_accumulates():
    c = _solver_cfg(**{"SOLVER.WARMUP_ITERS": 0, "SOLVER.MOMENTUM": 0.9,
                       "SOLVER.WEIGHT_DECAY": 0.0,
                       "SOLVER.BIAS_LR_FACTOR": 1.0})
    params = {"w": jnp.ones(2)}
    tx = make_optimizer(c, params)
    opt_state = set_learning_rate(tx.init(params), 1.0)
    grads = {"w": jnp.ones(2)}
    u1, opt_state = tx.update(grads, opt_state, params)
    u2, _ = tx.update(grads, opt_state, params)
    np.testing.assert_allclose(np.asarray(u1["w"]), -1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u2["w"]), -1.9, rtol=1e-6)


def test_trick_policies():
    """USE_TRICK: TSN per-group lr/decay multipliers
    (reference: get_optim_policies, visual_wrappers.py:146-211)."""
    from video_graph_ssl_tpu.solver.build import label_params_trick

    params = {
        "stem": {"conv": {"kernel": jnp.ones((1, 3, 3, 3, 8)),
                          "bias": jnp.ones((8,))}},
        "mid": {"conv": {"kernel": jnp.ones((1, 1, 1, 8, 8))}},
        "bn": {"scale": jnp.ones((8,)), "bias": jnp.ones((8,))},
        "new_fc": {"kernel": jnp.ones((8, 4)), "bias": jnp.ones((4,))},
    }
    labels = label_params_trick(params)
    assert labels["stem"]["conv"]["kernel"] == "first_conv_weight"
    assert labels["stem"]["conv"]["bias"] == "first_conv_bias"
    assert labels["mid"]["conv"]["kernel"] == "normal_weight"
    assert labels["bn"]["scale"] == "bn"
    assert labels["new_fc"]["kernel"] == "fc_weight"
    assert labels["new_fc"]["bias"] == "fc_bias"

    c = _solver_cfg(**{"SOLVER.WARMUP_ITERS": 0, "SOLVER.MOMENTUM": 0.0,
                       "SOLVER.WEIGHT_DECAY": 0.0,
                       "SOLVER.USE_TRICK": True})
    tx = make_optimizer(c, params)
    opt_state = set_learning_rate(tx.init(params), 0.1)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    # fc weight: lr x5; fc bias: x10; normal bias: x2; normal weight: x1
    np.testing.assert_allclose(np.asarray(updates["new_fc"]["kernel"]),
                               -0.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["new_fc"]["bias"]),
                               -1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["mid"]["conv"]["kernel"]),
                               -0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["stem"]["conv"]["bias"]),
                               -0.2, rtol=1e-6)


def test_trick_flow_boosts_first_conv():
    from video_graph_ssl_tpu.solver.build import label_params_trick

    params = {"stem": {"conv": {"kernel": jnp.ones((1, 3, 3, 2, 8))}}}
    labels = label_params_trick(params, "Flow")
    assert labels["stem"]["conv"]["kernel"] == "first_conv_weight"
    c = _solver_cfg(**{"SOLVER.WARMUP_ITERS": 0, "SOLVER.MOMENTUM": 0.0,
                       "SOLVER.WEIGHT_DECAY": 0.0,
                       "SOLVER.USE_TRICK": True})
    c.INPUT.MODALITY = "Flow"
    tx = make_optimizer(c, params)
    opt_state = set_learning_rate(tx.init(params), 0.1)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    # Flow first-conv weight: lr x5
    np.testing.assert_allclose(np.asarray(updates["stem"]["conv"]["kernel"]),
                               -0.5, rtol=1e-6)
