"""Pallas TPU kernels: 3-sweep recompute backward for the SepConv3d pair.

Implements the backward of ops/fused_sepconv.py (reference hot path:
lib/modeling/backbone/backbone_3d/s3d_1.py:50-69) as three pallas_calls,
each a grid over batch elements with the whole (T, H, W, C) slab of one
element resident in VMEM:

    k1  recompute y1 -> a -> y2; accumulate the BN2 backward sums
    k2  recompute; dz2 -> dy2; dWt taps; da = conv_t^T; dz1 (stored);
        accumulate the BN1 backward sums
    k3  recompute y1; dz1 -> dy1; dWs taps; dx = conv_s^T

Convolutions run as tap-shifted (T*H*W, C) x (C, F) MXU matmuls on
jnp.pad'ed VMEM values; per-channel sums and the dW taps accumulate in
fp32 VMEM scratch that persists across the grid and is written to the
outputs at the last step.  Cast points mirror ops/fused_sepconv.py's
`_bwd_reference` exactly, so interpret-mode equality against it is exact
in fp32 (tests/test_fused_sepconv.py).

Why three sweeps: BN train backward needs batch-mean terms of the
incoming cotangent before any per-element gradient exists — a single
fused pass over the data cannot produce dx.  This design trades ~2.25x
conv FLOPs for reading only x/g/dz1 instead of every stored intermediate
(~7 activation passes vs ~14; perf/bwd_floor.py)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-3


def fits_vmem(x_shape, f_out, budget_bytes: int = 10 * 2**20) -> bool:
    """Rough per-batch-element VMEM working-set estimate for the kernels."""
    _, t, h, w, c = x_shape
    rows = t * h * w
    cmax = max(c, f_out)
    # padded input + activation + ~4 fp32 row-major intermediates + taps
    est = (t * (h + 2) * (w + 2) * c * 2 + rows * c * 2
           + 4 * rows * f_out * 4 + 2 * rows * cmax * 2
           + 9 * c * f_out * 4 + 3 * f_out * f_out * 4)
    return est <= budget_bytes


def _conv_taps_spatial(x, w_taps, h, wd, out_f, flip=False, transpose=False):
    """Sum of 9 shifted matmuls: x (T,H,W,Cin) -> (T*H*W, out_f) fp32."""
    t = x.shape[0]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((t * h * wd, out_f), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            sl = xp[:, dh:dh + h, dw:dw + wd, :].reshape(t * h * wd, -1)
            wk = w_taps[2 - dh, 2 - dw] if flip else w_taps[dh, dw]
            if transpose:
                wk = wk.T
            acc += jnp.dot(sl, wk, preferred_element_type=jnp.float32)
    return acc


def _conv_taps_temporal(a, w_taps, t, rows_hw, out_f, flip=False,
                        transpose=False):
    """Sum of 3 T-shifted matmuls: a (T,H,W,F) -> (T*H*W, out_f) fp32."""
    ap = jnp.pad(a, ((1, 1), (0, 0), (0, 0), (0, 0)))
    acc = jnp.zeros((t * rows_hw, out_f), jnp.float32)
    for k in range(3):
        sl = ap[k:k + t].reshape(t * rows_hw, -1)
        wk = w_taps[2 - k] if flip else w_taps[k]
        if transpose:
            wk = wk.T
        acc += jnp.dot(sl, wk, preferred_element_type=jnp.float32)
    return acc


def _recompute_to_a(x, ws, c_row, dims, dtype):
    """x -> y1 (fp32, post-bf16-rounding) -> xhat1, z1-mask, a (dtype)."""
    t, h, w, _c, f = dims
    mu1, rs1, g1, b1 = c_row[0], c_row[1], c_row[2], c_row[3]
    y1 = _conv_taps_spatial(x, ws, h, w, f)
    y1 = y1.astype(dtype).astype(jnp.float32)
    xhat1 = (y1 - mu1) * rs1
    z1 = xhat1 * g1 + b1
    a = jnp.maximum(z1, 0.0).astype(dtype)
    return xhat1, z1, a


def _recompute_to_z2(x, ws, wt, c_row, dims, dtype):
    t, h, w, _c, f = dims
    mu2, rs2 = c_row[4], c_row[5]
    g2, b2 = c_row[6], c_row[7]
    xhat1, z1, a = _recompute_to_a(x, ws, c_row, dims, dtype)
    a4 = a.reshape(t, h, w, f)
    y2 = _conv_taps_temporal(a4, wt, t, h * w, f)
    y2 = y2.astype(dtype).astype(jnp.float32)
    xhat2 = (y2 - mu2) * rs2
    z2 = xhat2 * g2 + b2
    return xhat1, z1, a4, xhat2, z2


def _k1_bn2_sums(x_ref, g_ref, ws_ref, wt_ref, c_ref, out_ref, acc,
                 *, dims, dtype):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    t, h, w, _c, f = dims
    c = c_ref[:]
    _xh1, _z1, _a, xhat2, z2 = _recompute_to_z2(
        x_ref[0], ws_ref[0], wt_ref[:, 0, 0], c, dims, dtype)
    gf = g_ref[0].reshape(t * h * w, f).astype(jnp.float32)
    dz2 = jnp.where(z2 > 0, gf, 0.0)
    acc[0, :] += jnp.sum(dz2, axis=0)
    acc[1, :] += jnp.sum(dz2 * xhat2, axis=0)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc[:]


def _k2_mid(x_ref, g_ref, ws_ref, wt_ref, c_ref, m2_ref,
            dz1_ref, dwt_ref, s1_ref, dwt_acc, s1_acc, *, dims, dtype):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dwt_acc[:] = jnp.zeros_like(dwt_acc)
        s1_acc[:] = jnp.zeros_like(s1_acc)

    t, h, w, _c, f = dims
    rows = t * h * w
    c = c_ref[:]
    xhat1, z1, a4, xhat2, z2 = _recompute_to_z2(
        x_ref[0], ws_ref[0], wt_ref[:, 0, 0], c, dims, dtype)
    gf = g_ref[0].reshape(rows, f).astype(jnp.float32)
    dz2 = jnp.where(z2 > 0, gf, 0.0)
    alpha2 = c[6] * c[5]  # g2 * rs2
    dy2 = alpha2 * (dz2 - m2_ref[0, :] - xhat2 * m2_ref[1, :])
    dy2c = dy2.astype(dtype)

    # dWt taps: a[t+k-1]^T . dy2
    ap = jnp.pad(a4, ((1, 1), (0, 0), (0, 0), (0, 0)))
    dy2r = dy2c.reshape(rows, f)
    for k in range(3):
        ak = ap[k:k + t].reshape(rows, f)
        dwt_acc[k] += jax.lax.dot_general(
            ak, dy2r, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # da = conv_t^T(dy2)
    da = _conv_taps_temporal(dy2c.reshape(t, h, w, f), wt_ref[:, 0, 0],
                             t, h * w, f, flip=True, transpose=True)
    dz1 = jnp.where(z1 > 0, da, 0.0)
    dz1_ref[0] = dz1.reshape(t, h, w, f).astype(dz1_ref.dtype)
    s1_acc[0, :] += jnp.sum(dz1, axis=0)
    s1_acc[1, :] += jnp.sum(dz1 * xhat1, axis=0)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        dwt_ref[:] = dwt_acc[:]
        s1_ref[:] = s1_acc[:]


def _k3_input_grads(x_ref, dz1_ref, ws_ref, c_ref, m1_ref,
                    dx_ref, dws_ref, dws_acc, *, dims, dtype):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dws_acc[:] = jnp.zeros_like(dws_acc)

    t, h, w, cc, f = dims
    rows = t * h * w
    c = c_ref[:]
    x = x_ref[0]
    y1 = _conv_taps_spatial(x, ws_ref[0], h, w, f)
    y1 = y1.astype(dtype).astype(jnp.float32)
    xhat1 = (y1 - c[0]) * c[1]
    dz1 = dz1_ref[0].reshape(rows, f).astype(jnp.float32)
    alpha1 = c[2] * c[1]  # g1 * rs1
    dy1 = alpha1 * (dz1 - m1_ref[0, :] - xhat1 * m1_ref[1, :])
    dy1c = dy1.astype(dtype)

    # dWs taps: x[h+kh-1, w+kw-1]^T . dy1
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dy1r = dy1c.reshape(rows, f)
    for kh in range(3):
        for kw in range(3):
            xk = xp[:, kh:kh + h, kw:kw + w, :].reshape(rows, cc)
            dws_acc[kh * 3 + kw] += jax.lax.dot_general(
                xk, dy1r, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    # dx = conv_s^T(dy1)
    dx = _conv_taps_spatial(dy1c.reshape(t, h, w, f), ws_ref[0], h, w, cc,
                            flip=True, transpose=True)
    dx_ref[0] = dx.reshape(t, h, w, cc).astype(dx_ref.dtype)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        dws_ref[:] = dws_acc[:]


def sepconv_bwd_pallas(x, ws, wt, g1, b1, g2, b2, mu1, var1, mu2, var2,
                       g, dtype, interpret: bool = False):
    """Returns (dx, dWs, dWt, dg1, db1, dg2, db2); math == _bwd_reference."""
    bsz, t, h, w, cc = x.shape
    f = ws.shape[-1]
    dims = (t, h, w, cc, f)
    n = bsz * t * h * w
    rs1 = jax.lax.rsqrt(var1 + _EPS)
    rs2 = jax.lax.rsqrt(var2 + _EPS)
    consts = jnp.stack([mu1, rs1, g1, b1, mu2, rs2, g2, b2]
                       ).astype(jnp.float32)
    xc = x.astype(dtype)
    wsc = ws.astype(dtype)
    wtc = wt.astype(dtype)

    el_spec = lambda ch: pl.BlockSpec((1, t, h, w, ch), lambda i: (i, 0, 0, 0, 0),
                                      memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)

    s2 = pl.pallas_call(
        functools.partial(_k1_bn2_sums, dims=dims, dtype=dtype),
        grid=(bsz,),
        in_specs=[el_spec(cc), el_spec(f), full(ws.shape), full(wt.shape),
                  full(consts.shape)],
        out_specs=full((2, f)),
        out_shape=jax.ShapeDtypeStruct((2, f), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, f), jnp.float32)],
        interpret=interpret,
    )(xc, g, wsc, wtc, consts)
    m2 = s2 / n

    dz1, dwt, s1 = pl.pallas_call(
        functools.partial(_k2_mid, dims=dims, dtype=dtype),
        grid=(bsz,),
        in_specs=[el_spec(cc), el_spec(f), full(ws.shape), full(wt.shape),
                  full(consts.shape), full((2, f))],
        out_specs=(el_spec(f), full((3, f, f)), full((2, f))),
        out_shape=(jax.ShapeDtypeStruct((bsz, t, h, w, f), dtype),
                   jax.ShapeDtypeStruct((3, f, f), jnp.float32),
                   jax.ShapeDtypeStruct((2, f), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((3, f, f), jnp.float32),
                        pltpu.VMEM((2, f), jnp.float32)],
        interpret=interpret,
    )(xc, g, wsc, wtc, consts, m2)
    m1 = s1 / n

    dx, dws = pl.pallas_call(
        functools.partial(_k3_input_grads, dims=dims, dtype=dtype),
        grid=(bsz,),
        in_specs=[el_spec(cc), el_spec(f), full(ws.shape),
                  full(consts.shape), full((2, f))],
        out_specs=(el_spec(cc), full((9, cc, f))),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((9, cc, f), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((9, cc, f), jnp.float32)],
        interpret=interpret,
    )(xc, dz1, wsc, consts, m1)

    return (dx, dws.reshape(1, 3, 3, cc, f).astype(ws.dtype),
            dwt.reshape(3, 1, 1, f, f).astype(wt.dtype),
            s1[1].astype(g1.dtype), s1[0].astype(b1.dtype),
            s2[1].astype(g2.dtype), s2[0].astype(b2.dtype))
