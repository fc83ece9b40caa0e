"""Grid-slab Pallas backward for SepConv3d pairs too large to sit in VMEM.

Extends ops/pallas/sepconv_bwd.py (same 3-sweep recompute math, same
reference hot path s3d_1.py:50-69) to the early high-resolution stages —
at the bench geometry these are the stem SepConv (64->192 @ 8x28x28) and
mixed_3c branch1 (128->192 @ 8x28x28), the two largest SepConvs in the
net — where even one batch element's activations exceed VMEM.

Instead of BlockSpec-delivered per-element blocks, the big operands stay
in HBM (``pl.ANY``) and each kernel manually DMAs overlapping H slabs,
double-buffered so slab j+1's loads overlap slab j's compute (and slab
writes overlap via two out-slots):

    x slab   rows [h0-halo, h0+ht+halo)  (halo 1 for sweeps 1-2, 2 for 3)
    g slab   rows [h0, h0+ht)            (no halo)
    dz1      written by sweep 2 into an H-padded HBM buffer so sweep 3's
             halo reads need no edge logic (edge rows are zero-DMA'd)

Image-edge halo rows are zero-filled in the slab before its DMA starts
(the zero rows and the DMA'd rows are disjoint), and sweep 3 zeroes the
dy1 halo rows that fall outside the image (those rows do not exist;
their dz1 is zero but their BN backward mean terms are not).  All slab
offsets are static python-loop constants, so every DMA has static shape.

Like the resident kernels, W is zero-padded to the native sublane tile
before the kernels run (the r3 Mosaic reshape blocker — see
sepconv_bwd's module docstring): the BN-backward mean terms that
broadcast into pad columns are masked at the two accumulation feeds
(dy2, dy1), the BN count ``n`` stays the TRUE element count, and dx pad
columns are sliced off at the end.

Math and cast points are identical to sepconv_bwd's resident kernels and
``_bwd_reference`` (the CPU/test oracle); tests/test_fused_sepconv.py
pins interpret-mode equality including multi-slab edge cases."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sepconv_bwd import (_EPS, _VMEM_BUDGET, _padded_w, _slab_to_z2,
                          _taps_spatial, _taps_temporal, _w_mask)


def _ws_grid(t, h, w, c, f, ht, dsize=2) -> int:
    """Rough VMEM bytes for one slab iteration (slabs double-buffered)."""
    xs = 2 * t * (ht + 4) * (w + 2) * c * dsize
    gs = 2 * t * ht * w * f * dsize
    ds1 = 2 * t * (ht + 2) * w * f * dsize
    dxs = 2 * t * ht * w * c * dsize
    zrow = t * w * f * dsize
    rows_e = t * (ht + 2) * w
    interm = 6 * rows_e * max(c, f) * 4
    accs = 9 * c * f * 4 + 3 * f * f * 4 + 6 * f * 4
    return xs + gs + ds1 + dxs + zrow + interm + accs


def plan_grid(x_shape, f_out) -> int | None:
    """Largest H-divisor slab height whose working set fits VMEM.
    Plans at the SUBLANE-PADDED width the kernels actually run at."""
    _, t, h, w, c = x_shape
    wp = _padded_w(w)
    for ht in [d for d in range(h, 0, -1) if h % d == 0]:
        if _ws_grid(t, h, wp, c, f_out, ht) <= _VMEM_BUDGET:
            return ht
    return None


def _issue(src, dst, sem):
    cp = pltpu.make_async_copy(src, dst, sem)
    cp.start()
    return cp


def _issue_x(xh, xs, semx, slot, b, h0, ht, halo, dims):
    """Zero-fill the image-edge rows of slab slot ``slot`` and start its
    x DMA (rows [h0-halo, h0+ht+halo), clamped).  The zero rows and the
    DMA'd rows are disjoint, so the fills never race the copy.  W pad
    columns are zeroed once per element by the caller."""
    t, h, w, cc, _f = dims
    lo, hi = max(h0 - halo, 0), min(h0 + ht + halo, h)
    tp = lo - (h0 - halo)
    bp = (h0 + ht + halo) - hi
    span = ht + 2 * halo
    if tp:
        xs[slot, :, 0:tp, 1:w + 1, :] = jnp.zeros((t, tp, w, cc), xs.dtype)
    if bp:
        xs[slot, :, span - bp:span, 1:w + 1, :] = jnp.zeros(
            (t, bp, w, cc), xs.dtype)
    return _issue(xh.at[b, :, pl.ds(lo, hi - lo)],
                  xs.at[slot, :, pl.ds(tp, hi - lo), pl.ds(1, w)],
                  semx.at[slot])


def _zero_w_pad(xs, t, span, cc):
    wp = xs.shape[3]  # W + 2
    for s in (0, 1):
        xs[s, :, :, 0:1, :] = jnp.zeros((t, span, 1, cc), xs.dtype)
        xs[s, :, :, wp - 1:wp, :] = jnp.zeros((t, span, 1, cc), xs.dtype)


def _k1g(xh, gh, ws_ref, wt_ref, c_ref, out_ref, acc, xs, gs, semx, semg,
         *, dims, ht, dtype):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    t, h, w, cc, f = dims
    c = c_ref[:]
    ws, wt = ws_ref[0], wt_ref[:, 0, 0]
    _zero_w_pad(xs, t, ht + 2, cc)
    nhb = h // ht
    pend = {}

    def issue(jj):
        h0, slot = jj * ht, jj % 2
        pend[jj] = (
            _issue_x(xh, xs, semx, slot, b, h0, ht, 1, dims),
            _issue(gh.at[b, :, pl.ds(h0, ht)], gs.at[slot], semg.at[slot]))

    issue(0)
    for jj in range(nhb):
        if jj + 1 < nhb:
            issue(jj + 1)
        for cp in pend.pop(jj):
            cp.wait()
        slot = jj % 2
        _x1, _z1, _a, xhat2, z2 = _slab_to_z2(xs[slot], ws, wt, c, 0, ht,
                                              w, f, dtype)
        gf = gs[slot].reshape(t * ht * w, f).astype(jnp.float32)
        dz2 = jnp.where(z2 > 0, gf, 0.0)
        acc[0, :] += jnp.sum(dz2, axis=0)
        acc[1, :] += jnp.sum(dz2 * xhat2, axis=0)

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc[:]


def _k2g(xh, gh, ws_ref, wt_ref, c_ref, m2_ref, dz1h, dwt_ref, s1_ref,
         dwt_acc, s1_acc, xs, gs, dzs, zrow, semx, semg, semo, semz,
         *, dims, ht, dtype, true_w):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dwt_acc[:] = jnp.zeros_like(dwt_acc)
        s1_acc[:] = jnp.zeros_like(s1_acc)

    t, h, w, cc, f = dims
    c = c_ref[:]
    ws, wt = ws_ref[0], wt_ref[:, 0, 0]
    alpha2 = c[6] * c[5]  # g2 * rs2
    _zero_w_pad(xs, t, ht + 2, cc)
    # the H-padded dz1 buffer's edge rows are never computed — zero them
    zrow[:] = jnp.zeros_like(zrow)
    ztop = _issue(zrow, dz1h.at[b, :, pl.ds(0, 1)], semz)
    ztop.wait()
    zbot = _issue(zrow, dz1h.at[b, :, pl.ds(h + 1, 1)], semz)
    zbot.wait()
    nhb = h // ht
    pend, out_pend = {}, {}

    def issue(jj):
        h0, slot = jj * ht, jj % 2
        pend[jj] = (
            _issue_x(xh, xs, semx, slot, b, h0, ht, 1, dims),
            _issue(gh.at[b, :, pl.ds(h0, ht)], gs.at[slot], semg.at[slot]))

    issue(0)
    for jj in range(nhb):
        if jj + 1 < nhb:
            issue(jj + 1)
        for cp in pend.pop(jj):
            cp.wait()
        h0, slot = jj * ht, jj % 2
        rows = t * ht * w
        xhat1, z1, a4, xhat2, z2 = _slab_to_z2(xs[slot], ws, wt, c, 0, ht,
                                               w, f, dtype)
        gf = gs[slot].reshape(rows, f).astype(jnp.float32)
        dz2 = jnp.where(z2 > 0, gf, 0.0)
        dy2 = alpha2 * (dz2 - m2_ref[0, :] - xhat2 * m2_ref[1, :])
        # zero the W sublane-pad columns (dz2 is already zero there via the
        # zero-padded cotangent, but the BN mean terms broadcast into them)
        mask = _w_mask(rows, w, true_w)
        if mask is not None:
            dy2 = dy2 * mask
        dy2c = dy2.astype(dtype)

        ap = jnp.pad(a4, ((1, 1), (0, 0), (0, 0), (0, 0)))
        dy2r = dy2c.reshape(rows, f)
        for k in range(3):
            ak = ap[k:k + t].reshape(rows, f)
            dwt_acc[k] += jax.lax.dot_general(
                ak, dy2r, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        da = _taps_temporal(dy2c.reshape(t, ht, w, f), wt, f,
                            flip=True, transpose=True)
        dz1 = jnp.where(z1 > 0, da, 0.0)
        s1_acc[0, :] += jnp.sum(dz1, axis=0)
        s1_acc[1, :] += jnp.sum(dz1 * xhat1, axis=0)
        if jj >= 2:
            out_pend.pop(jj - 2).wait()
        dzs[slot] = dz1.reshape(t, ht, w, f).astype(dzs.dtype)
        out_pend[jj] = _issue(dzs.at[slot],
                              dz1h.at[b, :, pl.ds(h0 + 1, ht)],
                              semo.at[slot])
    for cp in out_pend.values():
        cp.wait()

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        dwt_ref[:] = dwt_acc[:]
        s1_ref[:] = s1_acc[:]


def _k3g(xh, dz1h, ws_ref, c_ref, m1_ref, dx_ref, dws_ref,
         dws_acc, xs, ds1, dxs, semx, semd, semo, *, dims, ht, dtype,
         true_w):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        dws_acc[:] = jnp.zeros_like(dws_acc)

    t, h, w, cc, f = dims
    c = c_ref[:]
    ws = ws_ref[0]
    alpha1 = c[2] * c[1]  # g1 * rs1
    _zero_w_pad(xs, t, ht + 4, cc)
    nhb = h // ht
    pend, out_pend = {}, {}

    def issue(jj):
        h0, slot = jj * ht, jj % 2
        pend[jj] = (
            _issue_x(xh, xs, semx, slot, b, h0, ht, 2, dims),
            _issue(dz1h.at[b, :, pl.ds(h0, ht + 2)], ds1.at[slot],
                   semd.at[slot]))

    issue(0)
    for jj in range(nhb):
        if jj + 1 < nhb:
            issue(jj + 1)
        for cp in pend.pop(jj):
            cp.wait()
        h0, slot = jj * ht, jj % 2
        rows = t * ht * w
        rows_e = t * (ht + 2) * w
        xsl = xs[slot]

        # dy1 on the extended rows [h0-1, h0+ht+1): recompute xhat1 there
        y1e = _taps_spatial(xsl, ws, 0, ht + 2, w, f)
        y1e = y1e.astype(dtype).astype(jnp.float32)
        xhat1e = (y1e - c[0]) * c[1]
        dz1e = ds1[slot].reshape(rows_e, f).astype(jnp.float32)
        dy1e = alpha1 * (dz1e - m1_ref[0, :] - xhat1e * m1_ref[1, :])
        # zero the W sublane-pad columns (dz1 is zero there; the BN mean
        # terms are not) — keeps dWs taps clean AND reproduces the
        # reference's zero column pad for the conv_s^T dx taps
        mask = _w_mask(rows_e, w, true_w)
        if mask is not None:
            dy1e = dy1e * mask
        # halo rows outside the image do not exist — zero their dy1
        # (their dz1 is already zero, but the BN mean terms are not);
        # h0 is a static loop constant, so the zeroing is static slices
        dy1e4 = dy1e.reshape(t, ht + 2, w, f)
        if h0 == 0:
            dy1e4 = jnp.concatenate(
                [jnp.zeros_like(dy1e4[:, :1]), dy1e4[:, 1:]], axis=1)
        if h0 + ht == h:
            dy1e4 = jnp.concatenate(
                [dy1e4[:, :-1], jnp.zeros_like(dy1e4[:, -1:])], axis=1)
        dy1c = dy1e4.astype(dtype)

        # dWs taps over the center rows (x halo is resident in the slab)
        dy1r = dy1c[:, 1:ht + 1].reshape(rows, f)
        for kh in range(3):
            for kw in range(3):
                xk = xsl[:, kh + 1:kh + 1 + ht, kw:kw + w, :].reshape(
                    rows, cc)
                dws_acc[kh * 3 + kw] += jax.lax.dot_general(
                    xk, dy1r, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        # dx center rows from the W-padded extended dy1
        dy1p = jnp.pad(dy1c, ((0, 0), (0, 0), (1, 1), (0, 0)))
        dx = jnp.zeros((rows, cc), jnp.float32)
        for dh in range(3):
            for dw in range(3):
                sl = dy1p[:, dh:dh + ht, dw:dw + w, :].reshape(rows, f)
                dx += jnp.dot(sl, ws[2 - dh, 2 - dw].T,
                              preferred_element_type=jnp.float32)
        if jj >= 2:
            out_pend.pop(jj - 2).wait()
        dxs[slot] = dx.reshape(t, ht, w, cc).astype(dxs.dtype)
        out_pend[jj] = _issue(dxs.at[slot], dx_ref.at[b, :, pl.ds(h0, ht)],
                              semo.at[slot])
    for cp in out_pend.values():
        cp.wait()

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        dws_ref[:] = dws_acc[:]


def sepconv_bwd_pallas_grid(x, ws, wt, g1, b1, g2, b2, mu1, var1, mu2,
                            var2, g, dtype, interpret: bool = False,
                            h_tile: int | None = None):
    """Grid-slab variant of sepconv_bwd_pallas; identical return contract."""
    bsz, t, h, w, cc = x.shape
    f = ws.shape[-1]
    if h_tile is None:
        h_tile = plan_grid(x.shape, f)
        assert h_tile is not None, (x.shape, f)
    ht = h_tile
    n = bsz * t * h * w          # the TRUE BN element count (pre-pad)
    true_w, wp = w, _padded_w(w)
    x_shape_true = x.shape
    if wp != w:                  # sublane-pad W (see sepconv_bwd docstring)
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

    hbm = pl.BlockSpec(memory_space=pl.ANY)
    vmem_full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    dma2 = pltpu.SemaphoreType.DMA((2,))

    s2 = pl.pallas_call(
        functools.partial(_k1g, dims=dims, ht=ht, dtype=dtype),
        grid=(bsz,),
        in_specs=[hbm, hbm, vmem_full(ws.shape), vmem_full(wt.shape),
                  vmem_full(consts.shape)],
        out_specs=vmem_full((2, f)),
        out_shape=jax.ShapeDtypeStruct((2, f), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, f), jnp.float32),
                        pltpu.VMEM((2, t, ht + 2, w + 2, cc), dtype),
                        pltpu.VMEM((2, t, ht, w, f), g.dtype),
                        dma2, dma2],
        interpret=interpret,
    )(xc, g, wsc, wtc, consts)
    m2 = s2 / n

    dz1h, dwt, s1 = pl.pallas_call(
        functools.partial(_k2g, dims=dims, ht=ht, dtype=dtype,
                          true_w=true_w),
        grid=(bsz,),
        in_specs=[hbm, hbm, vmem_full(ws.shape), vmem_full(wt.shape),
                  vmem_full(consts.shape), vmem_full((2, f))],
        out_specs=(hbm, vmem_full((3, f, f)), vmem_full((2, f))),
        out_shape=(jax.ShapeDtypeStruct((bsz, t, h + 2, w, f), dtype),
                   jax.ShapeDtypeStruct((3, f, f), jnp.float32),
                   jax.ShapeDtypeStruct((2, f), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((3, f, f), jnp.float32),
                        pltpu.VMEM((2, f), jnp.float32),
                        pltpu.VMEM((2, t, ht + 2, w + 2, cc), dtype),
                        pltpu.VMEM((2, t, ht, w, f), g.dtype),
                        pltpu.VMEM((2, t, ht, w, f), dtype),
                        pltpu.VMEM((t, 1, w, f), dtype),
                        dma2, dma2, dma2,
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(xc, g, wsc, wtc, consts, m2)
    m1 = s1 / n

    dx, dws = pl.pallas_call(
        functools.partial(_k3g, dims=dims, ht=ht, dtype=dtype,
                          true_w=true_w),
        grid=(bsz,),
        in_specs=[hbm, hbm, vmem_full(ws.shape), vmem_full(consts.shape),
                  vmem_full((2, f))],
        out_specs=(hbm, vmem_full((9, cc, f))),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct((9, cc, f), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((9, cc, f), jnp.float32),
                        pltpu.VMEM((2, t, ht + 4, w + 2, cc), dtype),
                        pltpu.VMEM((2, t, ht + 2, w, f), dtype),
                        pltpu.VMEM((2, t, ht, w, cc), x.dtype),
                        dma2, dma2, dma2],
        interpret=interpret,
    )(xc, dz1h, wsc, consts, m1)

    if w != true_w:              # drop the W sublane-pad columns again
        dx = jax.lax.slice(dx, (0,) * 5, x_shape_true)
    return (dx, dws.reshape(1, 3, 3, cc, f).astype(ws.dtype),
            dwt.reshape(3, 1, 1, f, f).astype(wt.dtype),
            s1[1].astype(g1.dtype), s1[0].astype(b1.dtype),
            s2[1].astype(g2.dtype), s2[0].astype(b2.dtype))
