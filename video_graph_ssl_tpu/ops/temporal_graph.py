"""Temporal-graph augmentation (the GCA core), TPU-native.

Re-implements the intended semantics of the reference's
``lib/ops/module_wrappers/temporal_graph.py``:

* ``temporal_hop_matrix``   — static multi-hop adjacency over T frames
  (reference: TemporalGraph, temporal_graph.py:7-36).  T is a compile-time
  constant on TPU, so the hop matrix is precomputed with numpy at trace time
  and baked into the program as a constant — no device work at all.
* ``hop_weight_matrix``     — the hop-decay reweighting
  θ(hop)=exp(-h)/(1+exp(-h)²)+α applied per hop class
  (reference: _parser_temporal_graph, temporal_graph.py:204-210).  The
  reference loops over hops with boolean masks per batch; here the whole
  (T,T) weight matrix is a single static constant multiplied in.
* ``GCN``                   — 1×1×1 conv feature transform + frame-axis
  message passing + skip (reference: temporal_graph.py:38-64).  On NDHWC
  layout the 1×1×1 conv is a Dense over channels and the propagation is a
  batched (T,T)×(T,F) matmul — both MXU ops.
* ``TemporalGraphAug``      — learned similarity adjacency from q/k 1×1×1
  conv embeddings (+ optional 2×2 spatial pool, BN), softmax over frames,
  hop reweighting, relaxed-Bernoulli (Gumbel-sigmoid) sampling with
  reparameterized gradients, then stacked GCN layers
  (reference: temporal_graph.py:66-239).
* ``compute_ppr`` / ``compute_heat`` — graph-diffusion alternatives
  (reference: temporal_graph.py:212-225), as pure jnp (the reference calls
  scipy on device tensors, which would host-round-trip on TPU).

Deviations from the reference (documented per SURVEY.md §7 hard-part (f)):
the reference's ``reset_parameter`` call is a latent AttributeError
(temporal_graph.py:117,124 vs :131) — we use the intended uniform fan-in
init; the reference's GCN stack with ``num_gcn_layers>1`` never returns to
``in_channels`` unless constructed exactly right — we implement the intended
in→inter→…→in channel plan.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


# --------------------------------------------------------------------------- #
# Static graph structure (trace-time numpy; compiled in as constants)
# --------------------------------------------------------------------------- #
def temporal_hop_matrix(tem_len: int, max_hop: int = 1) -> np.ndarray:
    """Hop-distance matrix over a frame chain graph.

    Nodes are frames 0..T-1 with self-links and (i, i+1) chain edges; entry
    [i, j] is the minimum number of edges between i and j, or +inf if it
    exceeds ``max_hop`` (reference: temporal_graph.py:20-36).
    """
    n = tem_len
    adj = np.zeros((n, n), dtype=np.float64)
    idx = np.arange(n)
    adj[idx, idx] = 1.0
    adj[idx[:-1], idx[:-1] + 1] = 1.0
    adj[idx[:-1] + 1, idx[:-1]] = 1.0

    hop_dis = np.full((n, n), np.inf)
    power = np.eye(n)
    reach = []
    for _ in range(max_hop + 1):
        reach.append(power > 0)
        power = power @ adj
    for d in range(max_hop, -1, -1):
        hop_dis[reach[d]] = d
    return hop_dis


def hop_theta(hop: float, alpha: float) -> float:
    """θ(h) = exp(-h) / (1 + exp(-h)²) + α (reference: temporal_graph.py:206)."""
    e = math.exp(-hop)
    return e / (1.0 + e * e) + alpha


def hop_weight_matrix(tem_len: int, max_hop: int, alpha: float) -> np.ndarray:
    """(T, T) static weights: θ(hop) within max_hop, 0 beyond (unreachable
    entries are zeroed, matching the reference's zeros-init adj that is only
    written at hop classes 0..max_hop, temporal_graph.py:207-210)."""
    hops = temporal_hop_matrix(tem_len, max_hop)
    w = np.zeros((tem_len, tem_len), dtype=np.float32)
    for d in range(max_hop + 1):
        w[hops == d] = hop_theta(float(d), alpha)
    return w


# --------------------------------------------------------------------------- #
# Stochastic adjacency sampling
# --------------------------------------------------------------------------- #
def relaxed_bernoulli_sample(
    key: jax.Array, probs: jnp.ndarray, temperature: float, eps: float = 1e-6
) -> jnp.ndarray:
    """Reparameterized RelaxedBernoulli (binary Gumbel-softmax) sample.

    Equals ``RelaxedBernoulli(temperature, probs).rsample()``
    (reference: temporal_graph.py:187-192):
        L = logit(p) + logit(u),  u ~ U(0,1);   sample = sigmoid(L / τ).
    Fully differentiable w.r.t. ``probs``.
    """
    p = jnp.clip(probs.astype(jnp.float32), eps, 1.0 - eps)
    u = jax.random.uniform(key, probs.shape, jnp.float32, minval=eps, maxval=1.0 - eps)
    logits = jnp.log(p) - jnp.log1p(-p) + jnp.log(u) - jnp.log1p(-u)
    return jax.nn.sigmoid(logits / temperature).astype(probs.dtype)


def gaussian_perturb_sample(
    key: jax.Array, adj: jnp.ndarray, alpha: float
) -> jnp.ndarray:
    """adj * (N(0,1)·α + 1) (reference: _sample_adj_with_gussion,
    temporal_graph.py:180-185)."""
    noise = jax.random.normal(key, adj.shape, jnp.float32) * alpha + 1.0
    return adj * noise.astype(adj.dtype)


# --------------------------------------------------------------------------- #
# Graph diffusion alternatives
# --------------------------------------------------------------------------- #
def compute_ppr(adj: jnp.ndarray, alpha: float = 0.2) -> jnp.ndarray:
    """Personalized PageRank diffusion α(I − (1−α) D^-1/2 A D^-1/2)^-1
    (reference: temporal_graph.py:212-219, there via scipy)."""
    deg = jnp.sum(adj, axis=-1)
    dinv_sqrt = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
    at = adj * dinv_sqrt[..., :, None] * dinv_sqrt[..., None, :]
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=adj.dtype)
    return alpha * jnp.linalg.inv(eye - (1.0 - alpha) * at)

def compute_heat(adj: jnp.ndarray, t: float = 5.0) -> jnp.ndarray:
    """Heat-kernel style diffusion exp(t · A (D^-1 − 1)), elementwise exp as
    in the reference (temporal_graph.py:221-225)."""
    deg = jnp.sum(adj, axis=-1)
    dinv = jnp.where(deg > 0, 1.0 / deg, 0.0)
    dinv_mat = jnp.zeros_like(adj).at[..., jnp.arange(adj.shape[-1]),
                                      jnp.arange(adj.shape[-1])].set(dinv)
    return jnp.exp(t * (adj @ (dinv_mat - 1.0)))


# --------------------------------------------------------------------------- #
# Modules
# --------------------------------------------------------------------------- #
def _fanin_uniform_init(dense_fan_in: int):
    """Uniform(-1/sqrt(n), 1/sqrt(n)) — the reference's intended conv init
    (temporal_graph.py:139-147)."""
    bound = 1.0 / math.sqrt(dense_fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class GCN(nn.Module):
    """Graph convolution over the frame axis (reference: temporal_graph.py:38-64).

    ``x``: (B, T, H, W, C) activations; ``adj``: (B, T, T) adjacency.
    support = Dense_C'(x); out[b,i] = Σ_j adj[b,i,j]·support[b,j] (+ skip).
    """

    features: int
    use_bias: bool = False
    skip: bool = True
    propagate_pallas: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        support = nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=_fanin_uniform_init(in_ch),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="transform",
        )(x)
        from .pallas.gcn_propagate import supports_shape

        if (self.propagate_pallas and jax.devices()[0].platform == "tpu"
                and supports_shape(support.shape)):
            # Layout-native VMEM propagation kernel (ops/pallas/
            # gcn_propagate.py).  Same math, fp32 accumulation.  Gated on
            # C % 128 == 0 — Mosaic rejects other widths (r5 chip ledger),
            # and default-off: at prod shapes the kernel's fwd+bwd loses ~2x
            # to the XLA einsum (perf/CHIP_QUEUE_r05.jsonl).
            from .pallas.gcn_propagate import gcn_propagate

            out = gcn_propagate(adj, support)
        else:
            # (B,T,T) x (B,T,H,W,C) over the frame axis — a batched matmul
            # the MXU eats whole (T<=32 so the adjacency tile lives in
            # VMEM/registers).
            out = jnp.einsum(
                "bij,bjhwc->bihwc", adj.astype(support.dtype), support,
                preferred_element_type=jnp.float32,
            ).astype(support.dtype)
        if self.skip:
            out = out + support
        return out


class TemporalGraphAug(nn.Module):
    """The GCA graph-augmentation block (reference: temporal_graph.py:66-239).

    Pipeline (all shapes static under jit):
      1. q/k embeddings: 1×1×1 conv (± BN) ± 2×2 spatial pool.
      2. similarity adjacency: softmax_j(q_i · k_j) over frames.
      3. static hop-decay reweighting (constant (T,T) matrix).
      4. stochastic augmentation: relaxed-Bernoulli rsample (default),
         Gaussian perturbation, or none (eval).
      5. ``num_gcn_layers`` stacked GCNs with skip connections.

    Needs an rng stream named ``'graph'`` when training with a stochastic
    sampler.
    """

    inter_channels: Optional[int] = None
    sub_sample: bool = True
    use_bias: bool = False
    bn_layer: bool = False
    max_pool: bool = True
    alpha: float = 0.5
    num_gcn_layers: int = 1
    temperature: float = 1.0
    max_hop: int = 3
    # relaxed_bernoulli        — rsample(): reparameterized, grads flow into
    #                            the adjacency (reference: temporal_graph.py:
    #                            187-192, _sample_adj_with_rel_ber).
    # relaxed_bernoulli_sample — sample(): same distribution, but the draw is
    #                            treated as a constant (no gradient through
    #                            the sampling; reference: temporal_graph.py:
    #                            194-199, _sample_adj_with_van).
    # gaussian | none
    sampler: str = "relaxed_bernoulli"
    # Temporal neighborhood masking before the softmax (reference:
    # temporal_graph.py:169-174).  The reference's loop is latently broken —
    # it indexes the *batch* dim with the neighbor range and fills nearly the
    # whole matrix with -inf (NaN softmax rows).  Intended semantics
    # implemented here: frame i may only attend to frames j with
    # |i - j| < nei_size; nei_size<=0 means the full sequence (no masking),
    # matching the reference's ``nei_size = sequence_len if not nei_size``.
    mask_frame: bool = False
    nei_size: int = 0
    use_pallas: bool = False
    propagate_pallas: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    def _embed(self, x: jnp.ndarray, name: str, inter: int,
               train: bool) -> jnp.ndarray:
        h = nn.Dense(
            inter,
            use_bias=self.use_bias,
            kernel_init=_fanin_uniform_init(x.shape[-1]),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )(x)
        if self.bn_layer:
            h = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, param_dtype=self.param_dtype,
                name=f"{name}_bn",
            )(h).astype(self.dtype)
        if self.sub_sample:
            # (1,2,2) spatial pool (reference: temporal_graph.py:102,127-129)
            pool = nn.max_pool if self.max_pool else nn.avg_pool
            b, t, hh, ww, c = h.shape
            h = h.reshape(b * t, hh, ww, c)
            h = pool(h, window_shape=(2, 2), strides=(2, 2))
            h = h.reshape(b, t, h.shape[1], h.shape[2], c)
        return h

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, t, hh, ww, c = x.shape
        inter = self.inter_channels or max(c // 2, 1)

        g_q = self._embed(x, "g_q", inter, train)   # (b,t,h',w',c')
        g_k = self._embed(x, "g_k", inter, train)

        theta = jnp.asarray(hop_weight_matrix(t, self.max_hop, self.alpha))
        sampling = train and self.sampler != "none"

        if (self.use_pallas and self.sampler == "relaxed_bernoulli"
                and not self.mask_frame
                and jax.devices()[0].platform == "tpu"):
            # Fused VMEM kernel: qk^T + softmax + hop reweight + Gumbel
            # sample in one pallas_call (see ops/pallas/graph_kernel.py).
            from .pallas.graph_kernel import graph_adjacency

            if sampling:
                seed = jax.random.randint(
                    self.make_rng("graph"), (), 0, 2**31 - 1
                ).astype(jnp.float32)
            else:
                seed = jnp.float32(0.0)
            adj = graph_adjacency(g_q.reshape(b, t, -1),
                                  g_k.reshape(b, t, -1), theta, seed,
                                  self.temperature, sampling)
        else:
            # Contract (h,w,c) directly instead of reshaping to (b,t,d):
            # the flatten relaminates the lane dim (c -> hwc) and costs a
            # relayout copy of both embeds per block (profiled r4: the graph
            # block's largest overhead family was `copy`, +2.5 ms/step).
            # dot_general handles multiple contracting dims natively.
            sim = jnp.einsum(
                "bihwc,bjhwc->bij", g_q, g_k,
                preferred_element_type=jnp.float32,
            )
            if self.mask_frame and 0 < self.nei_size < t:
                # Static trace-time band mask: -inf outside |i-j| < nei_size
                # so the softmax renormalizes over the neighborhood only
                # (intended semantics of reference temporal_graph.py:169-174;
                # see the field docstring for the reference's latent bug).
                idx = np.arange(t)
                band = np.abs(idx[:, None] - idx[None, :]) < self.nei_size
                sim = jnp.where(jnp.asarray(band)[None], sim, -jnp.inf)
            sim = jax.nn.softmax(sim, axis=-1)
            adj = sim * theta[None]

            if sampling:
                key = self.make_rng("graph")
                if self.sampler == "relaxed_bernoulli":
                    adj = relaxed_bernoulli_sample(key, adj, self.temperature)
                elif self.sampler == "relaxed_bernoulli_sample":
                    # .sample() vs .rsample(): identical draw, gradient cut
                    # (torch's sample() wraps rsample in no_grad).
                    adj = jax.lax.stop_gradient(
                        relaxed_bernoulli_sample(key, adj, self.temperature))
                elif self.sampler == "gaussian":
                    adj = gaussian_perturb_sample(key, adj, self.alpha)
                else:
                    raise ValueError(f"unknown graph sampler: {self.sampler}")

        adj = adj.astype(self.dtype)

        # GCN stack: in -> (inter)*(L-1 interior) -> in, skip-connected.
        if self.num_gcn_layers == 1:
            chans = [c]
        else:
            chans = [inter] * (self.num_gcn_layers - 1) + [c]
        for i, ch in enumerate(chans):
            x = GCN(
                features=ch,
                use_bias=self.use_bias,
                propagate_pallas=self.propagate_pallas,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"gcn_{i}",
            )(x, adj)
        return x
