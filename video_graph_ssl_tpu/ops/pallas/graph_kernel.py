"""Fused Pallas TPU kernel for the temporal-graph adjacency.

Fuses the middle of TemporalGraphAug.forward (reference:
lib/ops/module_wrappers/temporal_graph.py:227-239) into ONE kernel per
batch element, entirely in VMEM:

    sim   = q @ k^T                (T x T on the MXU)
    S     = softmax(sim, axis=-1)
    p     = S * theta_hop          (static hop-decay weights)
    adj   = sigmoid((logit(p) + logit(u)) / tau),  u ~ U(0,1) on-chip PRNG

T <= 32, so every intermediate lives in registers/VMEM; the XLA fallback
materializes four (B,T,T) HBM tensors and five kernel launches.  The
GCN propagation einsum stays in XLA — a batched (T,T)x(T,F) matmul the MXU
already executes at peak.

Training gradients flow through a custom VJP: the forward saves (S, p, adj)
— all tiny — and the backward is closed-form XLA:
    dadj -> dp   = dadj * adj(1-adj)/tau / (p(1-p))
    dp   -> dS   = dp * theta
    dS   -> dsim = S * (dS - sum(dS * S))        (softmax VJP)
    dsim -> dq, dk                               (matmul VJPs)
The Gumbel noise u is a saved constant w.r.t. differentiation, exactly like
``RelaxedBernoulli.rsample``'s reparameterization (reference:
temporal_graph.py:187-192).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6


def _uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 random bits -> U(eps, 1-eps) float32 via the exponent trick."""
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32) - 1.0
    return jnp.clip(f, _EPS, 1.0 - _EPS)


def _adjacency_kernel(seed_ref, q_ref, k_ref, theta_ref,
                      adj_ref, sm_ref, p_ref, *, temperature: float,
                      sample: bool):
    b = pl.program_id(0)
    q = q_ref[0].astype(jnp.float32)           # (T, D)
    k = k_ref[0].astype(jnp.float32)           # (T, D)
    sim = jnp.dot(q, k.T, preferred_element_type=jnp.float32)   # (T, T)

    # row softmax
    m = jnp.max(sim, axis=-1, keepdims=True)
    e = jnp.exp(sim - m)
    s = e / jnp.sum(e, axis=-1, keepdims=True)
    sm_ref[0] = s

    p = s * theta_ref[:]                        # hop-decay reweighting
    p_ref[0] = p

    if sample:
        pltpu.prng_seed(seed_ref[0] + b)
        u = _uniform_from_bits(
            pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32))
        pc = jnp.clip(p, _EPS, 1.0 - _EPS)
        logits = (jnp.log(pc) - jnp.log1p(-pc)
                  + jnp.log(u) - jnp.log1p(-u))
        adj_ref[0] = jax.nn.sigmoid(logits / temperature)
    else:
        adj_ref[0] = p


def _adjacency_fwd_pallas(seed: jnp.ndarray, q: jnp.ndarray, k: jnp.ndarray,
                          theta: jnp.ndarray, temperature: float,
                          sample: bool):
    b, t, d = q.shape
    kernel = functools.partial(_adjacency_kernel, temperature=temperature,
                               sample=sample)
    out_shapes = (
        jax.ShapeDtypeStruct((b, t, t), jnp.float32),  # adj
        jax.ShapeDtypeStruct((b, t, t), jnp.float32),  # softmax S
        jax.ShapeDtypeStruct((b, t, t), jnp.float32),  # p = S * theta
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, t), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, t, t), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, t), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, t), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
    )(seed.reshape(1).astype(jnp.int32), q, k, theta.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def graph_adjacency(q, k, theta, seed, temperature: float = 1.0,
                    sample: bool = True):
    """Fused sampled adjacency: (B,T,D),(B,T,D),(T,T) -> (B,T,T).

    ``seed``: float32 scalar (traced ok — e.g. derived from a PRNG key with
    ``jax.random.randint(...).astype(float32)``); cast to int32 for the
    on-chip PRNG.
    """
    adj, _, _ = _adjacency_fwd_pallas(seed.astype(jnp.int32), q, k, theta,
                                      temperature, sample)
    return adj


def _graph_adjacency_fwd(q, k, theta, seed, temperature, sample):
    adj, s, p = _adjacency_fwd_pallas(seed.astype(jnp.int32), q, k, theta,
                                      temperature, sample)
    return adj, (q, k, theta, seed, s, p, adj)


def _graph_adjacency_bwd(temperature, sample, res, g):
    q, k, theta, seed, s, p, adj = res
    g = g.astype(jnp.float32)
    if sample:
        pc = jnp.clip(p, _EPS, 1.0 - _EPS)
        dp = g * adj * (1.0 - adj) / temperature / (pc * (1.0 - pc))
        # zero gradient where p was clipped (saturated sample)
        dp = jnp.where((p > _EPS) & (p < 1.0 - _EPS), dp, 0.0)
    else:
        dp = g
    ds = dp * theta[None]
    dsim = s * (ds - jnp.sum(ds * s, axis=-1, keepdims=True))
    dq = jnp.einsum("bij,bjd->bid", dsim, k.astype(jnp.float32))
    dk = jnp.einsum("bij,bid->bjd", dsim, q.astype(jnp.float32))
    return (dq.astype(q.dtype), dk.astype(k.dtype), jnp.zeros_like(theta),
            jnp.zeros_like(seed))


graph_adjacency.defvjp(_graph_adjacency_fwd, _graph_adjacency_bwd)


def graph_adjacency_xla(q, k, theta, key, temperature: float = 1.0,
                        sample: bool = True) -> jnp.ndarray:
    """Reference XLA implementation (same math, jax.random noise) — used
    for correctness tests and as the non-TPU fallback."""
    sim = jnp.einsum("bid,bjd->bij", q.astype(jnp.float32),
                     k.astype(jnp.float32))
    s = jax.nn.softmax(sim, axis=-1)
    p = s * theta[None].astype(jnp.float32)
    if not sample:
        return p
    pc = jnp.clip(p, _EPS, 1.0 - _EPS)
    u = jax.random.uniform(key, p.shape, jnp.float32, _EPS, 1.0 - _EPS)
    logits = jnp.log(pc) - jnp.log1p(-pc) + jnp.log(u) - jnp.log1p(-u)
    return jax.nn.sigmoid(logits / temperature)
