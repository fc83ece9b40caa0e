"""Fused Pallas adjacency kernel vs the XLA reference implementation.

Runs only on TPU (the kernel targets Mosaic); the XLA fallback path is
covered everywhere else.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_graph_ssl_tpu.ops.temporal_graph import TemporalGraphAug, hop_weight_matrix

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="pallas TPU kernel")


@requires_tpu
def test_eval_mode_bit_exact():
    from video_graph_ssl_tpu.ops.pallas.graph_kernel import (
        graph_adjacency, graph_adjacency_xla)

    g = np.random.default_rng(0)
    q = jnp.asarray(g.normal(size=(3, 16, 32)), jnp.float32)
    k = jnp.asarray(g.normal(size=(3, 16, 32)), jnp.float32)
    theta = jnp.asarray(hop_weight_matrix(16, 3, 0.5))
    a_pl = jax.jit(lambda q, k: graph_adjacency(
        q, k, theta, jnp.float32(0), 1.0, False))(q, k)
    a_xla = graph_adjacency_xla(q, k, theta, jax.random.key(0), 1.0, False)
    np.testing.assert_array_equal(np.asarray(a_pl), np.asarray(a_xla))


@requires_tpu
def test_eval_grads_match_xla():
    from video_graph_ssl_tpu.ops.pallas.graph_kernel import (
        graph_adjacency, graph_adjacency_xla)

    g = np.random.default_rng(1)
    q = jnp.asarray(g.normal(size=(2, 8, 16)), jnp.float32)
    k = jnp.asarray(g.normal(size=(2, 8, 16)), jnp.float32)
    theta = jnp.asarray(hop_weight_matrix(8, 3, 0.5))
    g_pl = jax.jit(jax.grad(lambda q: graph_adjacency(
        q, k, theta, jnp.float32(0), 1.0, False).sum()))(q)
    g_xla = jax.grad(lambda q: graph_adjacency_xla(
        q, k, theta, jax.random.key(0), 1.0, False).sum())(q)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_xla),
                               rtol=1e-5, atol=1e-6)


@requires_tpu
def test_sampled_statistics_and_grads():
    from video_graph_ssl_tpu.ops.pallas.graph_kernel import graph_adjacency

    g = np.random.default_rng(2)
    q = jnp.asarray(g.normal(size=(8, 16, 32)), jnp.float32)
    k = jnp.asarray(g.normal(size=(8, 16, 32)), jnp.float32)
    theta = jnp.asarray(hop_weight_matrix(16, 3, 0.5))
    f = jax.jit(lambda q, k, s: graph_adjacency(q, k, theta, s, 1.0, True))
    a1 = f(q, k, jnp.float32(1))
    a2 = f(q, k, jnp.float32(2))
    assert float(a1.min()) >= 0.0 and float(a1.max()) <= 1.0
    assert not np.allclose(np.asarray(a1), np.asarray(a2))  # seed-dependent
    np.testing.assert_array_equal(
        np.asarray(a1), np.asarray(f(q, k, jnp.float32(1))))  # deterministic

    grads = jax.jit(jax.grad(lambda q: graph_adjacency(
        q, k, theta, jnp.float32(1), 1.0, True).sum()))(q)
    assert bool(jnp.all(jnp.isfinite(grads)))
    assert float(jnp.abs(grads).max()) > 0


@requires_tpu
def test_module_pallas_path_matches_xla_eval():
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 8, 4, 4, 16)),
                    jnp.float32)
    outs = {}
    for up in (False, True):
        m = TemporalGraphAug(max_hop=3, use_pallas=up, dtype=jnp.float32)
        v = jax.jit(lambda x: m.init(
            {"params": jax.random.key(0), "graph": jax.random.key(1)}, x,
            train=False))(x)
        outs[up] = np.asarray(
            jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x))
    np.testing.assert_array_equal(outs[False], outs[True])
