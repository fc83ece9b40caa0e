"""Pallas TPU kernels: 3-sweep recompute backward for the SepConv3d pair.

Implements the backward of ops/fused_sepconv.py (reference hot path:
lib/modeling/backbone/backbone_3d/s3d_1.py:50-69) as three pallas_calls,
each a grid over batch elements with the whole (T, H, W, C) slab of one
element resident in VMEM:

    k1  recompute y1 -> a -> y2; accumulate the BN2 backward sums
    k2  recompute; dz2 -> dy2; dWt taps; da = conv_t^T; dz1 (stored);
        accumulate the BN1 backward sums
    k3  recompute y1; dz1 -> dy1; dWs taps; dx = conv_s^T

Convolutions run as tap-shifted (rows, C) x (C, F) MXU matmuls on the
padded resident input; per-channel sums and the dW taps accumulate in
fp32 VMEM scratch that persists across the grid and is written to the
outputs at the last step.

Large spatial stages (mixed_3b/3c at 28x28) tile the COMPUTE over H
slabs while x stays resident: the spatial conv's H halo is handled by
recomputing one extra row each side in sweep 3 (the temporal conv has no
spatial dependence, so sweeps 1-2 tile cleanly).  ``plan_tiles`` picks
the largest H divisor whose working set fits VMEM; shapes with no viable
tiling (the 56x56 stem_3) return None and keep the standard backward.

Cast points mirror ops/fused_sepconv.py's `_bwd_reference` exactly, so
interpret-mode equality against it is exact in fp32
(tests/test_fused_sepconv.py, including a forced-tiling case).

SUBLANE PADDING (the r3 Mosaic blocker, fixed in r4): the
(t, h_t, w, c) -> (t*h_t*w, c) collapse reshapes behind each tap matmul
need a relayout Mosaic cannot infer when w is not a multiple of the
native sublane tile (w is 3/7/14 at bench geometry; r3 error:
"unsupported shape cast", vector<2x3x3x48xbf16> -> vector<18x48xbf16>).
Fix: ``sepconv_bwd_pallas`` zero-pads x and g along W to the sublane
multiple before the kernels run.  The zero-padded cotangent makes every
pad-column ``dz`` exactly zero (so the BN sums need no masks), but the
BN *backward* broadcasts the batch-mean terms into pad columns, so the
two places a broadcast cotangent feeds an accumulation — ``dy2`` before
the dWt taps / conv_t^T (k2) and ``dy1`` before the dWs taps / conv_s^T
(k3) — are masked with a rows-major column mask; ``dx`` pad columns are
sliced off at the end.  ``n`` (the BN count) keeps the TRUE element
count.  Interpret-mode tests pin padded-vs-reference equality at
non-multiple widths.

MEASURED (08-19, v5e): the padded resident kernels now COMPILE AND RUN
at every covered production shape (w=7/14) — and LOSE 27% in the full
GCA bench step (933.9 vs 1273.8 clips/s, perf/CHIP_QUEUE_r04.jsonl):
the same layout-pinning + lost-fusion tax every local Pallas
substitution has paid in this net.  The r3 "premise refuted" verdict is
now earned with a live witness; the kernels stay behind
VGS_SEPCONV_PALLAS=1.

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
_VMEM_BUDGET = 12 * 2**20
_SUBLANE = 8


def _padded_w(w: int) -> int:
    """W rounded up to the native sublane tile (see module docstring)."""
    return -(-w // _SUBLANE) * _SUBLANE


def _w_mask(rows: int, wp: int, true_w: int):
    """(rows, 1) fp32 mask over rows-major (t, h_t, wp) rows: 1.0 on real
    columns, 0.0 on the W sublane-pad columns.  None when no pad exists."""
    if wp == true_w:
        return None
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % wp
    return (col < true_w).astype(jnp.float32)


def _working_set(t, h, w, c, f, h_tile, dsize=2) -> int:
    """Rough VMEM bytes for one grid step at a given compute slab height.
    Grid-indexed blocks (x, g, dz1/dx) count twice: pallas double-buffers
    them to overlap the next element's DMA with compute."""
    rows = t * h_tile * w
    blocks = 2 * (t * h * w * (c + 2 * f)) * dsize    # x + g + dz1/dx
    padded_x = t * (h + 2) * (w + 2) * c * dsize
    slab = 5 * rows * f * 4 + rows * max(c, f) * 4    # fp32 intermediates
    accs = 9 * c * f * 4 + 3 * f * f * 4
    return blocks + padded_x + slab + accs


def plan_tiles(x_shape, f_out) -> int | None:
    """Largest H-divisor slab that fits the VMEM budget (None = no fit).
    Plans at the SUBLANE-PADDED width the kernels actually run at."""
    _, t, h, w, c = x_shape
    wp = _padded_w(w)
    for h_tile in [d for d in range(h, 0, -1) if h % d == 0]:
        if _working_set(t, h, wp, c, f_out, h_tile) <= _VMEM_BUDGET:
            return h_tile
    return None


def fits_vmem(x_shape, f_out) -> bool:
    return plan_tiles(x_shape, f_out) is not None


def _taps_spatial(xp, w_taps, h0, h_t, wd, out_f, flip=False,
                  transpose=False):
    """Sum of 9 shifted matmuls over rows [h0, h0+h_t) of the padded
    input xp (T, H+2, W+2, C) -> (T*h_t*wd, out_f) fp32."""
    t = xp.shape[0]
    acc = jnp.zeros((t * h_t * wd, out_f), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            sl = xp[:, h0 + dh:h0 + dh + h_t,
                    dw:dw + wd, :].reshape(t * h_t * wd, -1)
            wk = w_taps[2 - dh, 2 - dw] if flip else w_taps[dh, dw]
            if transpose:
                wk = wk.T
            acc += jnp.dot(sl, wk, preferred_element_type=jnp.float32)
    return acc


def _taps_temporal(a, w_taps, out_f, flip=False, transpose=False):
    """Sum of 3 T-shifted matmuls: a (T, h_t, W, F) -> (rows, out_f) fp32."""
    t = a.shape[0]
    rows = t * a.shape[1] * a.shape[2]
    ap = jnp.pad(a, ((1, 1), (0, 0), (0, 0), (0, 0)))
    acc = jnp.zeros((rows, out_f), jnp.float32)
    for k in range(3):
        sl = ap[k:k + t].reshape(rows, -1)
        wk = w_taps[2 - k] if flip else w_taps[k]
        if transpose:
            wk = wk.T
        acc += jnp.dot(sl, wk, preferred_element_type=jnp.float32)
    return acc


def _slab_to_z2(xp, ws, wt, c_row, h0, h_t, wd, f, dtype):
    """Recompute one H slab up to (xhat1, z1, a, xhat2, z2); rows-major."""
    t = xp.shape[0]
    y1 = _taps_spatial(xp, ws, h0, h_t, wd, f)
    y1 = y1.astype(dtype).astype(jnp.float32)
    xhat1 = (y1 - c_row[0]) * c_row[1]
    z1 = xhat1 * c_row[2] + c_row[3]
    a = jnp.maximum(z1, 0.0).astype(dtype)
    a4 = a.reshape(t, h_t, wd, f)
    y2 = _taps_temporal(a4, wt, f)
    y2 = y2.astype(dtype).astype(jnp.float32)
    xhat2 = (y2 - c_row[4]) * c_row[5]
    z2 = xhat2 * c_row[6] + c_row[7]
    return xhat1, z1, a4, xhat2, z2


def _k1_bn2_sums(x_ref, g_ref, ws_ref, wt_ref, c_ref, out_ref, acc,
                 *, dims, h_tile, dtype):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    t, h, w, _c, f = dims
    c = c_ref[:]
    xp = jnp.pad(x_ref[0], ((0, 0), (1, 1), (1, 1), (0, 0)))
    ws, wt = ws_ref[0], wt_ref[:, 0, 0]
    for h0 in range(0, h, h_tile):
        _x1, _z1, _a, xhat2, z2 = _slab_to_z2(
            xp, ws, wt, c, h0, h_tile, w, f, dtype)
        gf = g_ref[0, :, h0:h0 + h_tile].reshape(
            t * h_tile * w, f).astype(jnp.float32)
        dz2 = jnp.where(z2 > 0, gf, 0.0)
        acc[0, :] += jnp.sum(dz2, axis=0)
        acc[1, :] += jnp.sum(dz2 * xhat2, axis=0)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc[:]


def _k2_mid(x_ref, g_ref, ws_ref, wt_ref, c_ref, m2_ref,
            dz1_ref, dwt_ref, s1_ref, dwt_acc, s1_acc,
            *, dims, h_tile, dtype, true_w):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dwt_acc[:] = jnp.zeros_like(dwt_acc)
        s1_acc[:] = jnp.zeros_like(s1_acc)

    t, h, w, _c, f = dims
    c = c_ref[:]
    xp = jnp.pad(x_ref[0], ((0, 0), (1, 1), (1, 1), (0, 0)))
    ws, wt = ws_ref[0], wt_ref[:, 0, 0]
    alpha2 = c[6] * c[5]  # g2 * rs2
    for h0 in range(0, h, h_tile):
        rows = t * h_tile * w
        xhat1, z1, a4, xhat2, z2 = _slab_to_z2(
            xp, ws, wt, c, h0, h_tile, w, f, dtype)
        gf = g_ref[0, :, h0:h0 + h_tile].reshape(rows, f).astype(jnp.float32)
        dz2 = jnp.where(z2 > 0, gf, 0.0)
        dy2 = alpha2 * (dz2 - m2_ref[0, :] - xhat2 * m2_ref[1, :])
        # zero the W sublane-pad columns (dz2 is already zero there via the
        # zero-padded cotangent, but the BN mean terms broadcast into them)
        mask = _w_mask(rows, w, true_w)
        if mask is not None:
            dy2 = dy2 * mask
        dy2c = dy2.astype(dtype)

        # dWt taps: a[t+k-1]^T . dy2 (temporal shift only — tiles cleanly)
        ap = jnp.pad(a4, ((1, 1), (0, 0), (0, 0), (0, 0)))
        dy2r = dy2c.reshape(rows, f)
        for k in range(3):
            ak = ap[k:k + t].reshape(rows, f)
            dwt_acc[k] += jax.lax.dot_general(
                ak, dy2r, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        da = _taps_temporal(dy2c.reshape(t, h_tile, w, f), wt, f,
                            flip=True, transpose=True)
        dz1 = jnp.where(z1 > 0, da, 0.0)
        dz1_ref[0, :, h0:h0 + h_tile] = dz1.reshape(
            t, h_tile, w, f).astype(dz1_ref.dtype)
        s1_acc[0, :] += jnp.sum(dz1, axis=0)
        s1_acc[1, :] += jnp.sum(dz1 * xhat1, axis=0)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        dwt_ref[:] = dwt_acc[:]
        s1_ref[:] = s1_acc[:]


def _k3_input_grads(x_ref, dz1_ref, ws_ref, c_ref, m1_ref,
                    dx_ref, dws_ref, dws_acc, *, dims, h_tile, dtype,
                    true_w):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dws_acc[:] = jnp.zeros_like(dws_acc)

    t, h, w, cc, f = dims
    c = c_ref[:]
    xp = jnp.pad(x_ref[0], ((0, 0), (1, 1), (1, 1), (0, 0)))
    ws = ws_ref[0]
    alpha1 = c[2] * c[1]  # g1 * rs1

    def dy1_rows(r0, r1):
        """dy1 for rows [r0, r1) (fp32, rows-major), recomputing y1."""
        n_r = r1 - r0
        y1 = _taps_spatial(xp, ws, r0, n_r, w, f)
        y1 = y1.astype(dtype).astype(jnp.float32)
        xhat1 = (y1 - c[0]) * c[1]
        dz1 = dz1_ref[0, :, r0:r1].reshape(t * n_r * w, f
                                           ).astype(jnp.float32)
        dy1 = alpha1 * (dz1 - m1_ref[0, :] - xhat1 * m1_ref[1, :])
        # zero the W sublane-pad columns (dz1 is zero there; the BN mean
        # terms are not) — keeps dWs taps clean AND reproduces the
        # reference's zero column pad for the conv_s^T dx taps
        mask = _w_mask(t * n_r * w, w, true_w)
        if mask is not None:
            dy1 = dy1 * mask
        return dy1.astype(dtype), xhat1

    for h0 in range(0, h, h_tile):
        rows = t * h_tile * w
        # center slab: dWs taps (x halo is resident in xp)
        dy1c, _ = dy1_rows(h0, h0 + h_tile)
        dy1r = dy1c.reshape(rows, f)
        for kh in range(3):
            for kw in range(3):
                xk = xp[:, h0 + kh:h0 + kh + h_tile,
                        kw:kw + w, :].reshape(rows, cc)
                dws_acc[kh * 3 + kw] += jax.lax.dot_general(
                    xk, dy1r, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        # dx slab needs dy1 at rows h0-1 .. h0+h_tile (image-clamped);
        # recompute the halo rows and zero-pad at the image edges
        e0, e1 = max(h0 - 1, 0), min(h0 + h_tile + 1, h)
        dy1e, _ = dy1_rows(e0, e1)
        dy1e = dy1e.reshape(t, e1 - e0, w, f)
        pad_top = 1 - (h0 - e0)
        pad_bot = 1 - (e1 - (h0 + h_tile))
        dy1p = jnp.pad(dy1e, ((0, 0), (pad_top, pad_bot), (1, 1), (0, 0)))
        dx = jnp.zeros((rows, cc), jnp.float32)
        for dh in range(3):
            for dw in range(3):
                sl = dy1p[:, dh:dh + h_tile, dw:dw + w, :].reshape(rows, f)
                dx += jnp.dot(sl, ws[2 - dh, 2 - dw].T,
                              preferred_element_type=jnp.float32)
        dx_ref[0, :, h0:h0 + h_tile] = dx.reshape(
            t, h_tile, w, cc).astype(dx_ref.dtype)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        dws_ref[:] = dws_acc[:]


def sepconv_bwd_pallas(x, ws, wt, g1, b1, g2, b2, mu1, var1, mu2, var2,
                       g, dtype, interpret: bool = False,
                       h_tile: int | None = None):
    """Returns (dx, dWs, dWt, dg1, db1, dg2, db2); math == _bwd_reference."""
    bsz, t, h, w, cc = x.shape
    f = ws.shape[-1]
    if h_tile is None:
        h_tile = plan_tiles(x.shape, f)
        assert h_tile is not None, (x.shape, f)
    n = bsz * t * h * w          # the TRUE BN element count (pre-pad)
    true_w, wp = w, _padded_w(w)
    x_shape_true = x.shape
    if wp != w:                  # sublane-pad W (see module docstring)
        padw = ((0, 0), (0, 0), (0, 0), (0, wp - w), (0, 0))
        x = jnp.pad(x, padw)
        g = jnp.pad(g, padw)
        w = wp
    dims = (t, h, w, cc, f)
    rs1 = jax.lax.rsqrt(var1 + _EPS)
    rs2 = jax.lax.rsqrt(var2 + _EPS)
    consts = jnp.stack([mu1, rs1, g1, b1, mu2, rs2, g2, b2]
                       ).astype(jnp.float32)
    xc = x.astype(dtype)
    wsc = ws.astype(dtype)
    wtc = wt.astype(dtype)

    el_spec = lambda ch: pl.BlockSpec((1, t, h, w, ch),
                                      lambda i: (i, 0, 0, 0, 0),
                                      memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape,
                                      lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)

    s2 = pl.pallas_call(
        functools.partial(_k1_bn2_sums, dims=dims, h_tile=h_tile,
                          dtype=dtype),
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
        functools.partial(_k2_mid, dims=dims, h_tile=h_tile, dtype=dtype,
                          true_w=true_w),
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
        functools.partial(_k3_input_grads, dims=dims, h_tile=h_tile,
                          dtype=dtype, true_w=true_w),
        grid=(bsz,),
        in_specs=[el_spec(cc), el_spec(f), full(ws.shape),
                  full(consts.shape), full((2, f))],
        out_specs=(el_spec(cc), full((9, cc, f))),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((9, cc, f), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((9, cc, f), jnp.float32)],
        interpret=interpret,
    )(xc, dz1, wsc, consts, m1)

    if w != true_w:              # drop the W sublane-pad columns again
        dx = jax.lax.slice(dx, (0,) * 5, x_shape_true)
    return (dx, dws.reshape(1, 3, 3, cc, f).astype(ws.dtype),
            dwt.reshape(3, 1, 1, f, f).astype(wt.dtype),
            s1[1].astype(g1.dtype), s1[0].astype(b1.dtype),
            s2[1].astype(g2.dtype), s2[0].astype(b2.dtype))
