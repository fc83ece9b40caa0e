"""Layout-native Pallas kernel for the GCN frame-axis propagation.

The GCN message passing (reference: lib/ops/module_wrappers/temporal_graph.py:
56-64) is

    out[b,i,h,w,c] = sum_j adj[b,i,j] * x[b,j,h,w,c]

XLA lowers this contraction by collapsing the (h,w,c) non-contracting dims
into one minor dimension, which re-tiles both the operand and the result:
the (W,C)-tiled conv layout becomes an (T,HWC)-tiled matmul layout and back,
costing HBM relayout copies on the order of the tensor size (profiled r4:
the graph block's residual `copy` family sits on exactly this einsum —
the similarity einsum was already fixed by contracting (h,w,c) directly,
but here (h,w,c) are NON-contracting, so that rewrite does not apply).

This kernel instead reads x in its native (..., W, C) tiling, performs the
tiny-T contraction in VMEM (T <= 32; the (T, W*C) reshape happens on-chip,
never through HBM), and writes the result in the same tiling: two HBM passes
total, the bandwidth floor of the op.

Backward (custom VJP):
    dx[b,j]   = sum_i adj[b,i,j] * dout[b,i]     -> the same kernel with
                                                    adj transposed
    dadj[b,i,j] = sum_{hwc} dout[b,i,·] x[b,j,·] -> XLA einsum contracting
                                                    the minor (h,w,c) dims
                                                    directly (relayout-free,
                                                    same form as the fixed
                                                    similarity einsum)

CHIP VERDICT (r5, perf/CHIP_QUEUE_r05.jsonl, 2026-08-20): the premise is
REFUTED at production shapes.  Mosaic rejects the in-kernel reshape whenever
C is not a lane-tile (128) multiple — which is 2 of the 3 S3D aug points
(c=192 at idx5, c=832 at idx14); a reshape-free in-kernel 3D einsum hits the
same reject.  At the one lane-aligned point (idx9, c=512) the forward wins
(7.97 vs 9-10 ms) but fwd+bwd loses ~2x (12.76 vs 6.60 ms): the custom-VJP
fusion boundary costs more than the relayout it avoids — the same failure
mode as every prior local Pallas substitution (NOTES perf ledger).
``supports_shape`` gates the kernel accordingly; ``GRAPH.PROPAGATE_PALLAS``
stays default-off and the XLA einsum is the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supports_shape(x_shape) -> bool:
    """Whether Mosaic compiles the kernel for this activation shape.

    Chip-established (r5 ledger): the in-kernel (t,w,c)->(t,w*c) reshape is
    rejected server-side unless C is a multiple of the 128-wide lane tile.
    """
    return int(x_shape[-1]) % 128 == 0


def _propagate_kernel(adj_ref, x_ref, out_ref):
    t = x_ref.shape[1]
    w, c = x_ref.shape[-2], x_ref.shape[-1]
    x = x_ref[0, :, 0]                                # (T, W, C) native tile
    xf = x.reshape(t, w * c)                          # in-VMEM relaminate
    adj = adj_ref[0]                                  # (T, T)
    out = jax.lax.dot_general(
        adj, xf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0, :, 0] = out.reshape(t, w, c).astype(out_ref.dtype)


def _propagate_pallas(adj: jnp.ndarray, x: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """adj (B,T,T), x (B,T,H,W,C) -> (B,T,H,W,C); fp32 accumulation."""
    b, t, h, w, c = x.shape
    adj = adj.astype(x.dtype)
    return pl.pallas_call(
        _propagate_kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, t, t), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1, w, c), lambda i, j: (i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, 1, w, c), lambda i, j: (i, 0, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(adj, x)


def propagate_xla(adj: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """The XLA formulation (exact same math; CPU/fallback path)."""
    return jnp.einsum(
        "bij,bjhwc->bihwc", adj.astype(x.dtype), x,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gcn_propagate(adj, x, interpret: bool = False):
    """Frame-axis graph propagation, layout-native on TPU.

    ``adj``: (B, T, T) adjacency; ``x``: (B, T, H, W, C) activations.
    Matches ``einsum('bij,bjhwc->bihwc', adj, x)`` with fp32 accumulation
    and a bf16-cast adjacency (the GCN's existing contract).
    """
    return _propagate_pallas(adj, x, interpret)


def _gcn_propagate_fwd(adj, x, interpret):
    return _propagate_pallas(adj, x, interpret), (adj, x)


def _gcn_propagate_bwd(interpret, res, g):
    adj, x = res
    dx = _propagate_pallas(adj.transpose(0, 2, 1), g, interpret)
    dadj = jnp.einsum(
        "bihwc,bjhwc->bij", g, x, preferred_element_type=jnp.float32,
    ).astype(adj.dtype)
    return dadj, dx.astype(x.dtype)


gcn_propagate.defvjp(_gcn_propagate_fwd, _gcn_propagate_bwd)
