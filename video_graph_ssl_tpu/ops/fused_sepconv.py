"""Fused SepConv3d train-mode step with a custom recompute backward.

The S3D hot path (reference lib/modeling/backbone/backbone_3d/s3d_1.py:50-69)
is the SepConv3d pair — spatial (1,3,3) conv + BN + ReLU, then temporal
(3,1,1) conv + BN + ReLU — and its XLA backward reads every stored
intermediate from HBM (~14 activation-sized passes; perf/bwd_floor.py).
This module re-expresses the TRAIN-mode pair as one differentiable function
whose backward recomputes the intermediates from ``x`` in three sweeps and
reads only ``x``/``g`` (plus one stored ``dz1``) — ~7 activation passes at
~2.25x the conv FLOPs, a good trade on an MXU running far from peak.

Sweep structure (BN train-mode backward needs the batch means of the
incoming cotangent BEFORE any per-element gradient can be produced, which
is why a single-pass "fused backward" cannot exist):

    sweep 1: recompute y1, a, y2; accumulate BN2 terms  S_g2, S_gx2
    sweep 2: recompute;  dz2 -> dy2 -> dWt, da, dz1 (stored);
             accumulate BN1 terms S_g1, S_gx1
    sweep 3: recompute y1; dz1 -> dy1 -> dWs, dx

Forward math is bit-identical to the ConvBN composition (flax BatchNorm
fast-variance stats, same cast points); tests/test_fused_sepconv.py pins
forward and all seven gradients against jax.grad of the module pair.

Backward runs as Pallas TPU kernels only under the explicit
``VGS_SEPCONV_PALLAS=1`` opt-in (see ``_pallas_mode`` for the measured
Mosaic rejection that forced this): resident per-batch-element kernels
(ops/pallas/sepconv_bwd.py) where one element fits VMEM, manual-DMA
H-slab grid kernels (ops/pallas/sepconv_bwd_grid.py) for the large early
stages.  Otherwise the identical math runs as the pure-XLA
`_bwd_reference` (also the CPU test oracle).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-3  # BN epsilon of the S3D family (s3d_1.py BasicConv3d/SepConv3d)

_DN = ("NDHWC", "DHWIO", "NDHWC")


def _conv(x, w, pads):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), pads, dimension_numbers=_DN)


def _conv_s(x, ws):
    return _conv(x, ws, [(0, 0), (1, 1), (1, 1)])


def _conv_t(a, wt):
    return _conv(a, wt, [(1, 1), (0, 0), (0, 0)])


def _stats(y):
    """flax _compute_stats fast-variance path (fp32 reductions)."""
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, axis=(0, 1, 2, 3))
    mu2 = jnp.mean(yf * yf, axis=(0, 1, 2, 3))
    var = jnp.maximum(0.0, mu2 - mu * mu)
    return mu, var


def _bn_relu(y, mu, var, gamma, beta, dtype):
    z = (y - mu) * (jax.lax.rsqrt(var + _EPS) * gamma) + beta
    return jnp.maximum(z, 0.0).astype(dtype)


def sepconv_fwd_core(x, ws, wt, g1, b1, g2, b2, dtype):
    """Forward returning (out, residual stats). Matches ConvBN+ConvBN."""
    y1 = _conv_s(x.astype(dtype), ws.astype(dtype))
    mu1, var1 = _stats(y1)
    a = _bn_relu(y1.astype(jnp.float32), mu1, var1, g1, b1, dtype)
    y2 = _conv_t(a, wt.astype(dtype))
    mu2, var2 = _stats(y2)
    out = _bn_relu(y2.astype(jnp.float32), mu2, var2, g2, b2, dtype)
    return out, (mu1, var1, mu2, var2)


def _bn_bwd_terms(dz, xhat):
    """Per-channel sums the BN train backward needs."""
    s_g = jnp.sum(dz, axis=(0, 1, 2, 3))
    s_gx = jnp.sum(dz * xhat, axis=(0, 1, 2, 3))
    return s_g, s_gx


def _bwd_reference(res, g):
    """Pure-XLA implementation of the 3-sweep math (test oracle + CPU path).

    Identical formulas to the Pallas kernels; jax.grad of the forward
    produces the same values by construction (pinned in tests)."""
    (x, ws, wt, g1, b1, g2, b2, mu1, var1, mu2, var2, dtype) = res
    n = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
    rs1 = jax.lax.rsqrt(var1 + _EPS)
    rs2 = jax.lax.rsqrt(var2 + _EPS)

    # recompute (sweeps fuse these; XLA DCEs duplicates here)
    y1 = _conv_s(x.astype(dtype), ws.astype(dtype)).astype(jnp.float32)
    xhat1 = (y1 - mu1) * rs1
    a = jnp.maximum(xhat1 * g1 + b1, 0.0).astype(dtype)
    y2 = _conv_t(a, wt.astype(dtype)).astype(jnp.float32)
    xhat2 = (y2 - mu2) * rs2
    z2 = xhat2 * g2 + b2

    gf = g.astype(jnp.float32)
    dz2 = jnp.where(z2 > 0, gf, 0.0)
    s_g2, s_gx2 = _bn_bwd_terms(dz2, xhat2)
    dy2 = (g2 * rs2) * (dz2 - s_g2 / n - xhat2 * (s_gx2 / n))

    # conv_t backward: dWt[k] = sum a[t+k-1] (x) dy2[t];  da = conv_t^T(dy2)
    dy2c = dy2.astype(dtype)
    dwt = _dw_temporal(a, dy2c)
    da = _conv_t_transpose(dy2c, wt.astype(dtype)).astype(jnp.float32)

    z1 = xhat1 * g1 + b1
    dz1 = jnp.where(z1 > 0, da, 0.0)
    s_g1, s_gx1 = _bn_bwd_terms(dz1, xhat1)
    # sweep 2 stores dz1 in the compute dtype (sums above use the
    # unrounded values, matching the kernels); sweep 3 reads it back
    dz1 = dz1.astype(dtype).astype(jnp.float32)
    dy1 = (g1 * rs1) * (dz1 - s_g1 / n - xhat1 * (s_gx1 / n))

    dy1c = dy1.astype(dtype)
    dws = _dw_spatial(x.astype(dtype), dy1c)
    dx = _conv_s_transpose(dy1c, ws.astype(dtype)).astype(x.dtype)

    return (dx, dws.astype(ws.dtype), dwt.astype(wt.dtype),
            s_gx1.astype(g1.dtype), s_g1.astype(b1.dtype),
            s_gx2.astype(g2.dtype), s_g2.astype(b2.dtype))


def _conv_t_transpose(dy, wt):
    """da = conv of dy with temporally-flipped, IO-swapped Wt, pad 1."""
    wt_t = jnp.flip(wt, axis=0).swapaxes(-1, -2)
    return _conv(dy, wt_t, [(1, 1), (0, 0), (0, 0)])


def _conv_s_transpose(dy, ws):
    """dx = conv of dy with spatially-flipped, IO-swapped Ws, pad 1."""
    ws_t = jnp.flip(jnp.flip(ws, axis=1), axis=2).swapaxes(-1, -2)
    return _conv(dy, ws_t, [(0, 0), (1, 1), (1, 1)])


def _dw_temporal(a, dy):
    """dWt[k, 0, 0, ci, co] = sum_{b,t,h,w} a[b, t+k-1, h, w, ci] dy[b,t,h,w,co]."""
    ap = jnp.pad(a, [(0, 0), (1, 1), (0, 0), (0, 0), (0, 0)])
    t = a.shape[1]
    taps = []
    for k in range(3):
        ak = ap[:, k:k + t]
        taps.append(jnp.einsum("bthwc,bthwf->cf", ak, dy,
                               preferred_element_type=jnp.float32))
    return jnp.stack(taps)[:, None, None]


def _dw_spatial(x, dy):
    """dWs[0, kh, kw, ci, co] = sum x[b,t,h+kh-1,w+kw-1,ci] dy[b,t,h,w,co]."""
    xp = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])
    h, w = x.shape[2], x.shape[3]
    rows = []
    for kh in range(3):
        cols = []
        for kw in range(3):
            xk = xp[:, :, kh:kh + h, kw:kw + w]
            cols.append(jnp.einsum("bthwc,bthwf->cf", xk, dy,
                                   preferred_element_type=jnp.float32))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)[None].reshape(1, 3, 3, x.shape[-1], dy.shape[-1])


def pallas_covered(x_shape, f_out) -> str | None:
    """Which Pallas backward covers this shape: 'resident' (whole batch
    element in VMEM, ops/pallas/sepconv_bwd.py), 'grid' (manual-DMA H
    slabs, ops/pallas/sepconv_bwd_grid.py), or None.

    ``VGS_SEPCONV_NOGRID=1`` shrinks coverage to resident-only (A/B knob
    for chip trials)."""
    import os

    from .pallas.sepconv_bwd import fits_vmem

    if fits_vmem(x_shape, f_out):
        return "resident"
    if os.environ.get("VGS_SEPCONV_NOGRID", "0") == "1":
        return None
    from .pallas.sepconv_bwd_grid import plan_grid

    if plan_grid(x_shape, f_out) is not None:
        return "grid"
    return None


def _pallas_mode(x, f_out) -> str | None:
    """Pallas path: single TPU device + a covering kernel exists.

    Multi-device meshes keep the XLA sweeps (same math): pallas_call has
    no GSPMD partitioning rule here, and the global-batch BN sums must
    span the data axis anyway.  ``VGS_SEPCONV_XLA=1`` forces the XLA
    sweeps on TPU too — measures the recompute restructure on its own.

    HISTORY: in r3 Mosaic REJECTED these kernels at every production
    S3D shape — the (t, h_t, w, c) -> (rows, c) collapse reshapes behind
    the tap matmuls need a relayout Mosaic cannot infer when w (3/7/14
    at bench geometry) is not a multiple of the sublane tile
    ("infer-vector-layout: unsupported shape cast"; ledger
    perf/CHIP_QUEUE_r03b.jsonl, trials sepconv_fused/nogrid/pack).  r4
    fixed this by zero-padding W to the sublane tile inside the kernel
    wrappers (see ops/pallas/sepconv_bwd.py docstring).  The kernels
    stay behind the explicit ``VGS_SEPCONV_PALLAS=1`` opt-in because the
    identical-math XLA sweeps measured 7.5% SLOWER than the standard
    autodiff backward (1228.7 vs 1328.2 clips/s, same ledger),
    consistent with perf/bwd_floor.py's verdict that the backward gap is
    distributed overhead rather than activation re-reads.  r4 MEASURED
    the padded resident kernels in the full GCA bench step: 933.9 vs
    1273.8 clips/s (-27%; perf/CHIP_QUEUE_r04.jsonl) — the megakernel
    premise is refuted with a live witness, and SEPCONV_FUSED stays
    default-off.  (The grid variant's manual-DMA kernels crash the
    server-side compiler outright — HTTP 500, same ledger.)"""
    import os

    if os.environ.get("VGS_SEPCONV_XLA", "0") == "1":
        return None
    if os.environ.get("VGS_SEPCONV_PALLAS", "0") != "1":
        return None
    if jax.default_backend() != "tpu" or jax.device_count() != 1:
        return None
    return pallas_covered(x.shape, f_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_sepconv_train(x, ws, wt, g1, b1, g2, b2, dtype=jnp.bfloat16):
    """Train-mode SepConv pair: returns (out, (mu1, var1, mu2, var2)).

    The stats outputs carry ZERO gradient by construction of the VJP —
    they feed BN running-average updates only, exactly like flax
    BatchNorm's ra_mean/ra_var buffer writes."""
    return sepconv_fwd_core(x, ws, wt, g1, b1, g2, b2, dtype)


def _fused_fwd(x, ws, wt, g1, b1, g2, b2, dtype):
    out, (mu1, var1, mu2, var2) = sepconv_fwd_core(
        x, ws, wt, g1, b1, g2, b2, dtype)
    res = (x, ws, wt, g1, b1, g2, b2, mu1, var1, mu2, var2)
    return (out, (mu1, var1, mu2, var2)), res


def _fused_bwd(dtype, res, cts):
    g, _g_stats = cts  # stats cotangents are discarded (buffer-write only)
    (x, ws, wt, g1, b1, g2, b2, mu1, var1, mu2, var2) = res
    mode = _pallas_mode(x, wt.shape[-1])
    if mode == "resident":
        from .pallas.sepconv_bwd import sepconv_bwd_pallas

        grads = sepconv_bwd_pallas(x, ws, wt, g1, b1, g2, b2,
                                   mu1, var1, mu2, var2, g, dtype)
    elif mode == "grid":
        from .pallas.sepconv_bwd_grid import sepconv_bwd_pallas_grid

        grads = sepconv_bwd_pallas_grid(x, ws, wt, g1, b1, g2, b2,
                                        mu1, var1, mu2, var2, g, dtype)
    else:
        grads = _bwd_reference(res + (dtype,), g)
    return grads


fused_sepconv_train.defvjp(_fused_fwd, _fused_bwd)
