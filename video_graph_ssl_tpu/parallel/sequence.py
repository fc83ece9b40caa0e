"""Sequence parallelism for the temporal-graph block (ring collectives).

The reference handles long-range frame relations *algorithmically* — its
TemporalGraphAug builds a T x T frame adjacency and runs GCN message
passing over it (reference: lib/ops/module_wrappers/temporal_graph.py:
150-239) — and never shards the frame axis (clips are 8-32 frames).
SURVEY.md SS5 names the TPU-native extension for longer clips: shard the
T axis of the graph/GCN over a mesh axis and exchange blocks with
``ppermute`` ring steps, ring-attention style.

This module implements that extension as pure ``shard_map``-able
functions.  With T sharded over a ``seq`` mesh axis of size P (local
shard Tl = T / P):

* ``ring_similarity(q, k, axis)`` — sim[b, i, j] = q_i . k_j for the
  device's local row block i, all columns j.  The small k embedding
  blocks rotate around the ring; each of the P steps contributes one
  Tl-column block.  Peak memory: one extra k block, not the full k.
* ``ring_propagate(adj_rows, support, axis)`` — out[b, i] =
  sum_j adj[b, i, j] support[b, j] for local rows i.  The *large*
  (B, Tl, H, W, C) activation blocks rotate; each step accumulates a
  partial (Tl x Tl) x (Tl, F) matmul.  Total bytes moved equal an
  all-gather of support, but resident memory stays O(one block) — the
  property that makes T >> VMEM clips feasible.
* ``rowfold_bernoulli_sample`` — the relaxed-Bernoulli draw keyed per
  (batch, global-row) via ``fold_in``, so the sampled adjacency is
  IDENTICAL under any T-sharding (a single (B,T,T)-shaped draw would
  change with device count).
* ``sp_graph_aug_apply`` — the full TemporalGraphAug math (q/k embed,
  softmax similarity, hop reweighting, sampling, stacked skip-GCNs)
  over a T-sharded activation, composed from the pieces above.  Takes
  the *variables of an initialized single-device ``TemporalGraphAug``*
  so the two paths share checkpoints; equality with the module is
  pinned in tests/test_sequence_parallel.py on a fake 8-device mesh.

Everything here is collective-explicit and jit-compatible (static
shapes, ``lax.fori_loop`` ring schedules); under a real mesh the
``ppermute`` steps ride neighbor ICI links.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.temporal_graph import hop_weight_matrix


def _ring_perm(axis: str):
    p = jax.lax.psum(1, axis)
    return [(i, (i - 1) % p) for i in range(p)]


def ring_similarity(q: jnp.ndarray, k: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Local-row similarity block against ALL columns via a k-block ring.

    ``q``/``k``: (B, Tl, D) local frame shards on mesh axis ``axis``.
    Returns (B, Tl, T) fp32: rows = this device's frames, cols = all frames.
    """
    p = jax.lax.psum(1, axis)
    me = jax.lax.axis_index(axis)
    b, tl, _ = q.shape
    out = jnp.zeros((b, tl, tl * p), jnp.float32)
    perm = _ring_perm(axis)

    def body(s, carry):
        kbuf, out = carry
        j = (me + s) % p
        blk = jnp.einsum("bid,bjd->bij", q, kbuf,
                         preferred_element_type=jnp.float32)
        out = jax.lax.dynamic_update_slice_in_dim(out, blk, j * tl, axis=2)
        kbuf = jax.lax.ppermute(kbuf, axis, perm)
        return kbuf, out

    _, out = jax.lax.fori_loop(0, p, body, (k, out))
    return out


def ring_propagate(adj_rows: jnp.ndarray, support: jnp.ndarray,
                   axis: str) -> jnp.ndarray:
    """out[b, i] = sum_j adj[b, i, j] * support[b, j] for local rows i.

    ``adj_rows``: (B, Tl, T) local adjacency rows; ``support``:
    (B, Tl, *spatial, C) local frame shard.  The support blocks rotate
    around the ring; each step contributes columns j of one remote block.
    """
    p = jax.lax.psum(1, axis)
    me = jax.lax.axis_index(axis)
    tl = support.shape[1]
    perm = _ring_perm(axis)
    adj32 = adj_rows.astype(jnp.float32)

    def body(s, carry):
        buf, acc = carry
        j = (me + s) % p
        cols = jax.lax.dynamic_slice_in_dim(adj32, j * tl, tl, axis=2)
        acc = acc + jnp.einsum(
            "bij,bj...->bi...", cols.astype(support.dtype), buf,
            preferred_element_type=jnp.float32)
        buf = jax.lax.ppermute(buf, axis, perm)
        return buf, acc

    acc = jnp.zeros(support.shape, jnp.float32)
    _, acc = jax.lax.fori_loop(0, p, body, (support, acc))
    return acc.astype(support.dtype)


def rowfold_bernoulli_sample(key: jax.Array, probs_rows: jnp.ndarray,
                             temperature: float, row0: jnp.ndarray,
                             eps: float = 1e-6) -> jnp.ndarray:
    """Relaxed-Bernoulli rsample keyed per (batch, GLOBAL row index).

    ``probs_rows``: (B, Tl, T) local adjacency rows; ``row0``: the global
    index of local row 0 (``axis_index * Tl``).  Because the uniform draw
    for row (b, i) depends only on (key, b, i), the sampled adjacency is
    bit-identical for every T-sharding, including the unsharded P=1 case —
    the determinism contract tests rely on.  Fully reparameterized (grads
    flow into ``probs_rows``), matching reference temporal_graph.py:187-192.
    """
    b, tl, t = probs_rows.shape
    p = jnp.clip(probs_rows.astype(jnp.float32), eps, 1.0 - eps)

    rows = row0 + jnp.arange(tl)

    def row_key(bi, ri):
        return jax.random.fold_in(jax.random.fold_in(key, bi), ri)

    keys = jax.vmap(lambda bi: jax.vmap(lambda ri: row_key(bi, ri))(rows))(
        jnp.arange(b))
    u = jax.vmap(jax.vmap(
        lambda k: jax.random.uniform(k, (t,), jnp.float32,
                                     minval=eps, maxval=1.0 - eps)))(keys)
    logits = jnp.log(p) - jnp.log1p(-p) + jnp.log(u) - jnp.log1p(-u)
    return jax.nn.sigmoid(logits / temperature).astype(probs_rows.dtype)


def _spatial_pool_local(h: jnp.ndarray, max_pool: bool) -> jnp.ndarray:
    """(1, 2, 2) frame-local spatial pool — no cross-frame communication."""
    from flax import linen as nn

    b, t, hh, ww, c = h.shape
    h = h.reshape(b * t, hh, ww, c)
    pool = nn.max_pool if max_pool else nn.avg_pool
    h = pool(h, window_shape=(2, 2), strides=(2, 2))
    return h.reshape(b, t, h.shape[1], h.shape[2], c)


def sp_graph_aug_apply(
    variables,
    x_local: jnp.ndarray,
    *,
    axis: str,
    tem_len: int,
    max_hop: int = 3,
    alpha: float = 0.5,
    temperature: float = 1.0,
    sub_sample: bool = True,
    max_pool: bool = True,
    sampler: str = "none",
    rng: jax.Array | None = None,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """TemporalGraphAug forward over a T-sharded activation (shard_map body).

    ``variables``: the variable dict of an initialized single-device
    ``TemporalGraphAug`` (defaults: no bias, no BN) — params
    ``g_q/kernel``, ``g_k/kernel``, ``gcn_i/transform/kernel``.
    ``x_local``: (B, Tl, H, W, C) local frame shard.
    ``sampler``: 'none' (eval) or 'relaxed_bernoulli' (needs ``rng``;
    rowfold keying keeps the draw sharding-invariant).
    """
    params = variables["params"]
    wq = params["g_q"]["kernel"].astype(dtype)
    wk = params["g_k"]["kernel"].astype(dtype)

    me = jax.lax.axis_index(axis)
    tl = x_local.shape[1]
    row0 = me * tl

    # 1. q/k embeddings: channel Dense + frame-local spatial pool.
    xq = (x_local.astype(dtype) @ wq)
    xk = (x_local.astype(dtype) @ wk)
    if sub_sample:
        xq = _spatial_pool_local(xq, max_pool)
        xk = _spatial_pool_local(xk, max_pool)
    b = x_local.shape[0]
    g_q = xq.reshape(b, tl, -1)
    g_k = xk.reshape(b, tl, -1)

    # 2. similarity rows via the k ring; softmax over the (complete) row.
    sim = ring_similarity(g_q, g_k, axis)
    sim = jax.nn.softmax(sim, axis=-1)

    # 3. static hop reweighting — local rows of the (T, T) constant.
    theta = hop_weight_matrix(tem_len, max_hop, alpha)
    theta_rows = jax.lax.dynamic_slice_in_dim(
        jnp.asarray(theta), row0, tl, axis=0)
    adj = sim * theta_rows[None]

    # 4. stochastic augmentation (sharding-invariant rowfold keying).
    if sampler == "relaxed_bernoulli":
        if rng is None:
            raise ValueError("relaxed_bernoulli sampler needs an rng")
        adj = rowfold_bernoulli_sample(rng, adj, temperature, row0)
    elif sampler != "none":
        raise ValueError(f"unsupported sequence-parallel sampler: {sampler}")
    adj = adj.astype(dtype)

    # 5. stacked skip-GCNs: Dense transform is frame-local; propagation
    #    rotates the big activation blocks around the ring.
    out = x_local
    i = 0
    while f"gcn_{i}" in params:
        wt = params[f"gcn_{i}"]["transform"]["kernel"].astype(dtype)
        support = out.astype(dtype) @ wt
        out = ring_propagate(adj, support, axis) + support
        i += 1
    return out


def graph_aug_sequence_parallel(
    variables,
    x: jnp.ndarray,
    mesh: Mesh,
    *,
    seq_axis: str = "seq",
    **kw,
):
    """Convenience wrapper: shard x over (``seq_axis``: frame dim) and run
    ``sp_graph_aug_apply`` under ``shard_map``.  ``x``: (B, T, H, W, C)
    global; T must divide by the mesh axis size.

    Builds (and jits) a fresh shard_map per call — fine for demos/tests;
    steady-state training should embed ``sp_graph_aug_apply`` in its own
    jitted step to reuse the compiled program."""
    from jax.experimental.shard_map import shard_map

    t = x.shape[1]
    npart = mesh.shape[seq_axis]
    if t % npart != 0:
        raise ValueError(f"T={t} not divisible by mesh axis "
                         f"'{seq_axis}'={npart}")
    spec = P(None, seq_axis)
    rng = kw.pop("rng", None)
    rng_specs = () if rng is None else (P(),)
    rng_args = () if rng is None else (rng,)

    def body(xl, *r):
        return sp_graph_aug_apply(
            variables, xl, axis=seq_axis, tem_len=t,
            rng=(r[0] if r else None), **kw)

    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(spec,) + rng_specs,
        out_specs=spec,
        check_rep=False,
    ))
    return fn(jax.device_put(x, NamedSharding(mesh, spec)), *rng_args)
