"""Temporal-graph ops: golden values against the reference math
(lib/ops/module_wrappers/temporal_graph.py)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_graph_ssl_tpu.ops.temporal_graph import (
    GCN,
    TemporalGraphAug,
    compute_ppr,
    hop_theta,
    hop_weight_matrix,
    relaxed_bernoulli_sample,
    temporal_hop_matrix,
)


def test_hop_matrix_chain_golden():
    # chain of 5 frames, max_hop=2: hop[i,j] = |i-j| when <=2 else inf
    h = temporal_hop_matrix(5, max_hop=2)
    expected = np.abs(np.arange(5)[:, None] - np.arange(5)[None, :]).astype(float)
    expected[expected > 2] = np.inf
    np.testing.assert_array_equal(h, expected)


def test_hop_matrix_max_hop_one():
    h = temporal_hop_matrix(4, max_hop=1)
    assert h[0, 0] == 0 and h[0, 1] == 1
    assert np.isinf(h[0, 2]) and np.isinf(h[0, 3])


def test_theta_golden():
    # θ(h) = exp(-h)/(1+exp(-h)^2) + α  (reference temporal_graph.py:206)
    for hop in range(4):
        e = math.exp(-hop)
        assert hop_theta(hop, 0.5) == pytest.approx(e / (1 + e * e) + 0.5)
    assert hop_theta(0, 0.5) == pytest.approx(1.0)


def test_hop_weight_matrix():
    w = hop_weight_matrix(6, max_hop=3, alpha=0.5)
    assert w[0, 0] == pytest.approx(hop_theta(0, 0.5))
    assert w[0, 3] == pytest.approx(hop_theta(3, 0.5))
    assert w[0, 4] == 0.0  # beyond max_hop: zeroed
    assert w.shape == (6, 6)


def test_relaxed_bernoulli_stats_and_grad():
    key = jax.random.key(0)
    probs = jnp.full((2000,), 0.3)
    s = relaxed_bernoulli_sample(key, probs, temperature=0.5)
    assert s.shape == probs.shape
    assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0
    # E[sample] approximates p as temperature -> small
    s_cold = relaxed_bernoulli_sample(key, probs, temperature=0.05)
    assert abs(float(s_cold.mean()) - 0.3) < 0.05

    # reparameterized: gradient w.r.t. probs exists and is finite
    g = jax.grad(lambda p: relaxed_bernoulli_sample(
        key, p, temperature=1.0).sum())(probs)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0


def test_gcn_identity_adjacency():
    """With identity adjacency and skip, GCN output == 2 * Dense(x)."""
    m = GCN(features=6, skip=True, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 2, 2, 6)),
                    jnp.float32)
    adj = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
    v = jax.jit(lambda x, a: m.init(jax.random.key(0), x, a))(x, adj)
    out = jax.jit(lambda v, x, a: m.apply(v, x, a))(v, x, adj)
    dense_only = jax.jit(
        lambda v, x, a: m.apply(v, x, jnp.zeros_like(a)))(v, x, adj)
    # TPU matmuls default to bf16 multiply precision; compare accordingly
    np.testing.assert_allclose(np.asarray(out), 2 * np.asarray(dense_only),
                               rtol=1e-2, atol=1e-2)


def test_graph_aug_shapes_and_determinism():
    m = TemporalGraphAug(max_hop=2, num_gcn_layers=1, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 4, 4, 8)),
                    jnp.float32)
    init = jax.jit(lambda x: m.init(
        {"params": jax.random.key(0), "graph": jax.random.key(1)}, x,
        train=False))
    v = init(x)
    fwd_eval = jax.jit(lambda v, x: m.apply(v, x, train=False))
    out = fwd_eval(v, x)
    assert out.shape == x.shape
    # eval path is deterministic (no sampling)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(fwd_eval(v, x)))

    fwd_train = jax.jit(lambda v, x, k: m.apply(
        v, x, train=True, rngs={"graph": k}))
    o1 = fwd_train(v, x, jax.random.key(2))
    o2 = fwd_train(v, x, jax.random.key(3))
    # training path is stochastic across keys
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_graph_aug_multi_layer_channels():
    m = TemporalGraphAug(inter_channels=4, num_gcn_layers=3,
                         dtype=jnp.float32)
    x = jnp.zeros((1, 4, 2, 2, 8), jnp.float32)
    v = jax.jit(lambda x: m.init(
        {"params": jax.random.key(0)}, x, train=False))(x)
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    assert out.shape == x.shape  # returns to in_channels


def test_sampler_variant_sample_vs_rsample():
    """relaxed_bernoulli_sample (ref _sample_adj_with_van, temporal_graph.py:
    194-199): identical draw to rsample, but the gradient through the
    sampling is cut — like torch's .sample() (= rsample under no_grad)."""
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 4, 2, 2, 8)),
                    jnp.float32)
    outs, grads = {}, {}
    for name in ("relaxed_bernoulli", "relaxed_bernoulli_sample"):
        m = TemporalGraphAug(sampler=name, dtype=jnp.float32)
        v = jax.jit(lambda x, m=m: m.init(
            {"params": jax.random.key(0), "graph": jax.random.key(1)}, x,
            train=True))(x)

        def loss(v, x, m=m):
            return jnp.sum(m.apply(v, x, train=True,
                                   rngs={"graph": jax.random.key(7)}) ** 2)

        outs[name] = np.asarray(jax.jit(loss)(v, x))
        grads[name] = jax.jit(jax.grad(loss))(v, x)

    # same init + same rng key -> identical forward value
    np.testing.assert_allclose(outs["relaxed_bernoulli"],
                               outs["relaxed_bernoulli_sample"], rtol=1e-5)
    # the q/k embeddings only receive grads via the adjacency; with the
    # non-reparameterized draw they get exactly zero
    gq_r = grads["relaxed_bernoulli"]["params"]["g_q"]["kernel"]
    gq_s = grads["relaxed_bernoulli_sample"]["params"]["g_q"]["kernel"]
    assert float(jnp.abs(gq_r).max()) > 0
    np.testing.assert_array_equal(np.asarray(gq_s), 0.0)
    # the GCN transform still learns in both
    assert float(jnp.abs(
        grads["relaxed_bernoulli_sample"]["params"]["gcn_0"]["transform"]
        ["kernel"]).max()) > 0


def test_mask_frame_band_semantics():
    """mask_frame/nei_size (intended semantics of reference
    temporal_graph.py:169-174): softmax renormalizes over |i-j| < nei_size."""
    t = 6
    m = TemporalGraphAug(mask_frame=True, nei_size=2, sampler="none",
                         sub_sample=False, dtype=jnp.float32,
                         num_gcn_layers=1)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, t, 2, 2, 4)),
                    jnp.float32)
    v = jax.jit(lambda x: m.init({"params": jax.random.key(0)}, x,
                                 train=False))(x)

    # Recompute the masked adjacency by hand from the module's own embeddings
    gq_k = v["params"]["g_q"]["kernel"]
    gk_k = v["params"]["g_k"]["kernel"]
    q = np.einsum("bthwc,cd->bthwd", np.asarray(x), np.asarray(gq_k))
    k = np.einsum("bthwc,cd->bthwd", np.asarray(x), np.asarray(gk_k))
    q = q.reshape(1, t, -1)
    k = k.reshape(1, t, -1)
    sim = np.einsum("bid,bjd->bij", q, k)
    band = np.abs(np.arange(t)[:, None] - np.arange(t)[None, :]) < 2
    sim = np.where(band[None], sim, -np.inf)
    e = np.exp(sim - sim.max(-1, keepdims=True))
    soft = e / e.sum(-1, keepdims=True)
    adj = soft * np.asarray(hop_weight_matrix(t, 3, 0.5))[None]

    # off-band entries are exactly zero; on-band rows renormalized
    assert np.all(adj[0][~band] == 0)
    ref = np.einsum("ij,jd->id", adj[0],
                    q.reshape(t, -1) * 0 + 1)  # sanity shape only
    assert ref.shape == (t, q.shape[-1])

    # module output equals a GCN applied with that adjacency
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    gcn = GCN(features=4, skip=True, dtype=jnp.float32)
    gv = {"params": v["params"]["gcn_0"]}
    expected = gcn.apply(gv, x, jnp.asarray(adj, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-2, atol=2e-2)


def test_mask_frame_full_width_noop():
    """nei_size <= 0 or >= T leaves the adjacency unmasked."""
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, 4, 2, 2, 4)),
                    jnp.float32)
    m0 = TemporalGraphAug(mask_frame=False, sampler="none", dtype=jnp.float32)
    m1 = TemporalGraphAug(mask_frame=True, nei_size=0, sampler="none",
                          dtype=jnp.float32)
    v = jax.jit(lambda x: m0.init({"params": jax.random.key(0)}, x,
                                  train=False))(x)
    o0 = jax.jit(lambda v, x: m0.apply(v, x, train=False))(v, x)
    o1 = jax.jit(lambda v, x: m1.apply(v, x, train=False))(v, x)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_ppr_diffusion_rows():
    adj = jnp.asarray(temporal_hop_matrix(4, 1) == 1, jnp.float32) + jnp.eye(4)
    ppr = compute_ppr(adj, alpha=0.2)
    assert ppr.shape == (4, 4)
    assert bool(jnp.all(jnp.isfinite(ppr)))
