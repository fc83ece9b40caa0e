"""The layout-native GCN propagation kernel (ops/pallas/gcn_propagate.py):
interpret-mode value + custom-VJP gradient equality vs the XLA einsum
formulation, and module-level equivalence of the propagate_pallas gate."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_graph_ssl_tpu.ops.pallas.gcn_propagate import (
    gcn_propagate,
    propagate_xla,
    supports_shape,
)
from video_graph_ssl_tpu.ops.temporal_graph import GCN

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="pallas TPU kernel")


def _data(b=2, t=4, h=3, w=5, c=8, dtype=jnp.float32, seed=0):
    g = np.random.default_rng(seed)
    adj = jnp.asarray(g.uniform(0, 1, (b, t, t)), dtype)
    x = jnp.asarray(g.standard_normal((b, t, h, w, c)), dtype)
    return adj, x


def test_forward_matches_xla_einsum():
    adj, x = _data()
    out_k = jax.jit(lambda a, x: gcn_propagate(a, x, True))(adj, x)
    out_x = propagate_xla(adj, x)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=1e-6, atol=1e-6)


def test_forward_bf16_contract():
    """bf16 activations, fp32 accumulation — same contract as the GCN."""
    adj, x = _data(dtype=jnp.bfloat16, seed=1)
    out_k = jax.jit(lambda a, x: gcn_propagate(a, x, True))(adj, x)
    out_x = propagate_xla(adj, x)
    assert out_k.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_x, np.float32),
        rtol=2e-2, atol=2e-2)


def test_custom_vjp_matches_autodiff_of_xla():
    adj, x = _data(seed=2)
    g = np.random.default_rng(3)
    ct = jnp.asarray(g.standard_normal(x.shape), jnp.float32)

    def loss_k(a, xx):
        return jnp.sum(gcn_propagate(a, xx, True) * ct)

    def loss_x(a, xx):
        return jnp.sum(propagate_xla(a, xx) * ct)

    (vk, (dak, dxk)) = jax.jit(
        jax.value_and_grad(loss_k, (0, 1)))(adj, x)
    (vx, (dax, dxx)) = jax.jit(
        jax.value_and_grad(loss_x, (0, 1)))(adj, x)
    np.testing.assert_allclose(float(vk), float(vx), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dak), np.asarray(dax),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dxk), np.asarray(dxx),
                               rtol=1e-5, atol=1e-5)


@requires_tpu
def test_compiled_kernel_matches_xla_on_tpu():
    """Mosaic-compiled kernel (micro shape): value + custom-VJP grads vs
    the XLA einsum at bf16-matmul tolerance."""
    adj, x = _data(b=2, t=4, h=2, w=8, c=128, seed=5)
    g = np.random.default_rng(6)
    ct = jnp.asarray(g.standard_normal(x.shape), jnp.float32)

    def loss(fn):
        return jax.jit(jax.value_and_grad(
            lambda a, xx: jnp.sum(fn(a, xx) * ct), (0, 1)))

    vk, (dak, dxk) = loss(lambda a, xx: gcn_propagate(a, xx))(adj, x)
    vx, (dax, dxx) = loss(propagate_xla)(adj, x)
    np.testing.assert_allclose(float(vk), float(vx), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dak), np.asarray(dax),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(dxk), np.asarray(dxx),
                               rtol=1e-2, atol=1e-2)


def test_supports_shape_gate():
    """The Mosaic-compilability gate matches the r5 chip ledger: the kernel
    compiles only for lane-aligned C (perf/CHIP_QUEUE_r05.jsonl — c=192 and
    c=832 reject server-side, c=512 compiles).  The three S3D aug-point
    shapes are pinned so a backbone change re-raises the question."""
    assert supports_shape((256, 8, 14, 14, 512))        # idx9: compiles
    assert not supports_shape((256, 16, 28, 28, 192))   # idx5: rejects
    assert not supports_shape((256, 4, 7, 7, 832))      # idx14: rejects


def test_gcn_module_gate_non_aligned_c_falls_back():
    """GCN(propagate_pallas=True) with C % 128 != 0 must take the XLA path
    even on TPU (the kernel would Mosaic-reject; ADVICE r4 item 1)."""
    adj, x = _data(c=6, seed=7)
    m = GCN(features=6, propagate_pallas=True, dtype=jnp.float32)
    v = jax.jit(lambda x, a: m.init(jax.random.key(0), x, a))(x, adj)
    o = jax.jit(lambda v, x, a: m.apply(v, x, a))(v, x, adj)
    assert np.all(np.isfinite(np.asarray(o)))


def test_gcn_module_gate_equivalence():
    """GCN(propagate_pallas=True) falls back to the identical XLA einsum on
    CPU — same params, same output, so the knob is checkpoint-compatible
    and safe to flip anywhere."""
    adj, x = _data(c=6, seed=4)
    m0 = GCN(features=6, dtype=jnp.float32)
    m1 = GCN(features=6, propagate_pallas=True, dtype=jnp.float32)
    v = jax.jit(lambda x, a: m0.init(jax.random.key(0), x, a))(x, adj)
    o0 = jax.jit(lambda v, x, a: m0.apply(v, x, a))(v, x, adj)
    o1 = jax.jit(lambda v, x, a: m1.apply(v, x, a))(v, x, adj)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
