"""FusedBatchNorm (single-pass reductions + folded ReLU VJP) vs flax.

The fused module must be numerically interchangeable with the
``nn.BatchNorm`` (+ReLU) pair it replaces in ConvBN — same statistics,
same gradients (the full through-statistics BN backward), same running
stat EMA, same variable layout.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from video_graph_ssl_tpu.ops.fused_bn import FusedBatchNorm


class _FlaxPair(nn.Module):
    relu: bool = True
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.BatchNorm(use_running_average=self.use_running_average,
                         momentum=0.999, epsilon=1e-3,
                         dtype=x.dtype, name="bn")(x)
        return nn.relu(y) if self.relu else y


class _FusedWrap(nn.Module):
    relu: bool = True
    use_running_average: bool = False

    @nn.compact
    def __call__(self, x):
        return FusedBatchNorm(use_running_average=self.use_running_average,
                              momentum=0.999, epsilon=1e-3, relu=self.relu,
                              name="bn")(x)


@pytest.mark.parametrize("relu", [True, False])
def test_train_forward_and_grads_match_flax(rng, relu):
    x = jnp.asarray(rng.standard_normal((4, 3, 5, 5, 16)), jnp.float32)
    fused = _FusedWrap(relu=relu)
    ref = _FlaxPair(relu=relu)
    vf = jax.jit(fused.init)(jax.random.key(0), x)
    vr = jax.jit(ref.init)(jax.random.key(0), x)
    # identical variable layout
    assert set(vf["params"]["bn"]) == set(vr["params"]["bn"])
    assert set(vf["batch_stats"]["bn"]) == set(vr["batch_stats"]["bn"])

    # seed non-trivial affine params
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 16), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(16), jnp.float32)
    for v in (vf, vr):
        v["params"]["bn"]["scale"] = scale
        v["params"]["bn"]["bias"] = bias

    def run(mod, v, x):
        y, muts = mod.apply(v, x, mutable=["batch_stats"])
        return y, muts

    yf, mf = jax.jit(lambda v, x: run(fused, v, x))(vf, x)
    yr, mr = jax.jit(lambda v, x: run(ref, v, x))(vr, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                               rtol=2e-5, atol=2e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(mf["batch_stats"]["bn"][k]),
                                   np.asarray(mr["batch_stats"]["bn"][k]),
                                   rtol=2e-5, atol=2e-6)

    def loss(mod, v, x):
        def f(params, x):
            y, _ = mod.apply({"params": params,
                              "batch_stats": v["batch_stats"]}, x,
                             mutable=["batch_stats"])
            return jnp.sum(jnp.sin(y * 0.7))
        return jax.value_and_grad(f, argnums=(0, 1))(v["params"], x)

    (lf, (gpf, gxf)) = jax.jit(lambda v, x: loss(fused, v, x))(vf, x)
    (lr, (gpr, gxr)) = jax.jit(lambda v, x: loss(ref, v, x))(vr, x)
    np.testing.assert_allclose(float(lf), float(lr), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(gxf), np.asarray(gxr),
                               rtol=3e-4, atol=3e-5)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(np.asarray(gpf["bn"][k]),
                                   np.asarray(gpr["bn"][k]),
                                   rtol=3e-4, atol=3e-5)


def test_eval_mode_matches_flax(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 4, 4, 8)), jnp.float32)
    stats = {"bn": {"mean": jnp.asarray(rng.standard_normal(8), jnp.float32),
                    "var": jnp.asarray(rng.uniform(0.5, 2.0, 8),
                                       jnp.float32)}}
    params = {"bn": {"scale": jnp.asarray(rng.uniform(0.5, 1.5, 8),
                                          jnp.float32),
                     "bias": jnp.asarray(rng.standard_normal(8),
                                         jnp.float32)}}
    fused = _FusedWrap(relu=True, use_running_average=True)
    ref = _FlaxPair(relu=True, use_running_average=True)
    yf = jax.jit(lambda: fused.apply(
        {"params": params, "batch_stats": stats}, x))()
    yr = jax.jit(lambda: ref.apply(
        {"params": params, "batch_stats": stats}, x))()
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                               rtol=2e-5, atol=2e-5)


def test_bf16_activations_fp32_stats(rng):
    x = jnp.asarray(rng.standard_normal((4, 3, 5, 5, 16)),
                    jnp.float32).astype(jnp.bfloat16)
    fused = _FusedWrap(relu=True)
    v = jax.jit(fused.init)(jax.random.key(0), x)
    y, muts = jax.jit(lambda v, x: fused.apply(v, x,
                                               mutable=["batch_stats"]))(v, x)
    assert y.dtype == jnp.bfloat16
    assert muts["batch_stats"]["bn"]["mean"].dtype == jnp.float32
    # statistics accumulate in fp32: the running mean after one step is
    # (1 - momentum) * batch_mean, close to the fp32 ground truth
    mean_ref = np.asarray(x, np.float32).reshape(-1, 16).mean(0)
    np.testing.assert_allclose(np.asarray(muts["batch_stats"]["bn"]["mean"]),
                                0.001 * mean_ref, rtol=1e-2, atol=1e-5)
