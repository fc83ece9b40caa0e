#!/usr/bin/env python
"""Conv-backward experiments on the chip.

The fused MoCo step's backward runs at ~29 TFLOP/s vs 61 forward
(NOTES_NEXT_ROUND.md).  This lab isolates single convolutions from the hot
stages and times fwd / fwd+bwd for:

  lax    — plain conv_general_dilated (XLA picks the grad algorithm)
  taps   — custom VJP: dx as a transposed conv, dw as per-tap
           dot_general contractions (explicit MXU matmuls with K = B*T*H*W)
  +bn    — conv + BN + ReLU (locates epilogue backward cost)

Run: python perf/convbwd_lab.py            (TPU chip)
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DN = ("NDHWC", "DHWIO", "NDHWC")


def make_conv(strides, pads):
    import jax.lax as lax

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, window_strides=strides,
            padding=[(p, p) for p in pads], dimension_numbers=DN)
    return conv


def make_taps_conv(strides, pads):
    """conv with custom VJP: dw = per-tap dot_general, dx = transposed conv."""
    import jax
    import jax.numpy as jnp
    import jax.lax as lax

    base = make_conv(strides, pads)

    @jax.custom_vjp
    def conv(x, w):
        return base(x, w)

    def fwd(x, w):
        return base(x, w), (x, w)

    def bwd(res, dy):
        x, w = res
        dy = dy.astype(x.dtype)
        kd, kh, kw, ci, co = w.shape
        st, sh, sw = strides
        pd, ph, pw = pads
        # dx: dilate dy by the stride, correlate with the flipped kernel
        w_flip = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
        dx = lax.conv_general_dilated(
            dy, w_flip, window_strides=(1, 1, 1),
            padding=[(kd - 1 - pd, kd - 1 - pd),
                     (kh - 1 - ph, kh - 1 - ph),
                     (kw - 1 - pw, kw - 1 - pw)],
            lhs_dilation=strides, dimension_numbers=DN).astype(x.dtype)
        # crop/pad dx to x's shape (stride-dilation can overshoot by s-1)
        dx = dx[:, :x.shape[1], :x.shape[2], :x.shape[3], :]
        # dw: one (Ci, Co) matmul per kernel tap, contracting B*T*H*W
        xpad = jnp.pad(x, ((0, 0), (pd, pd), (ph, ph), (pw, pw), (0, 0)))
        _, ot, oh, ow, _ = dy.shape
        taps = []
        for a in range(kd):
            for b in range(kh):
                for c in range(kw):
                    xs = lax.slice(
                        xpad, (0, a, b, c, 0),
                        (x.shape[0], a + (ot - 1) * st + 1,
                         b + (oh - 1) * sh + 1, c + (ow - 1) * sw + 1, ci),
                        (1, st, sh, sw, 1))
                    taps.append(lax.dot_general(
                        xs, dy,
                        (((0, 1, 2, 3), (0, 1, 2, 3)), ((), ())),
                        preferred_element_type=np.float32))
        dw = jnp.stack(taps, 0).reshape(kd, kh, kw, ci, co)
        return dx, dw.astype(w.dtype)

    conv.defvjp(fwd, bwd)
    return conv


def make_im2col_conv(strides, pads):
    """conv with custom VJP: dw via one im2col matmul (patches x dy),
    dx via the standard transposed conv.  Targets tiny-Ci stems where
    XLA's dw-as-conv (56x56 'kernel') underutilizes the MXU."""
    import jax
    import jax.numpy as jnp
    import jax.lax as lax

    base = make_conv(strides, pads)

    @jax.custom_vjp
    def conv(x, w):
        return base(x, w)

    def fwd(x, w):
        return base(x, w), (x, w)

    def bwd(res, dy):
        x, w = res
        dy = dy.astype(x.dtype)
        kd, kh, kw, ci, co = w.shape
        # dx: standard transposed conv (same as XLA would emit)
        w_flip = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
        pd, ph, pw = pads
        dx = lax.conv_general_dilated(
            dy, w_flip, window_strides=(1, 1, 1),
            padding=[(kd - 1 - pd, kd - 1 - pd),
                     (kh - 1 - ph, kh - 1 - ph),
                     (kw - 1 - pw, kw - 1 - pw)],
            lhs_dilation=strides, dimension_numbers=DN).astype(x.dtype)
        dx = dx[:, :x.shape[1], :x.shape[2], :x.shape[3], :]
        # dw: im2col patches (B,OT,OH,OW, kd*kh*kw*ci) x dy -> one matmul
        patches = lax.conv_general_dilated_patches(
            x, (kd, kh, kw), strides, [(p, p) for p in pads],
            dimension_numbers=DN)
        dw = lax.dot_general(
            patches, dy, (((0, 1, 2, 3), (0, 1, 2, 3)), ((), ())),
            preferred_element_type=np.float32)
        # patches feature order is Ci-major, tap-minor: (ci, kd, kh, kw)
        dw = dw.reshape(ci, kd, kh, kw, co).transpose(1, 2, 3, 0, 4)
        return dx, dw.astype(w.dtype)

    conv.defvjp(fwd, bwd)
    return conv


def timeit(fn, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn()
    float(out)  # value fetch = the only reliable sync over the axon relay
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--only", nargs="*", default=None,
                    help="substring filters on case names")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B = args.batch
    bf16 = jnp.bfloat16
    # (name, in(T,H,W,Ci), Co, kernel, strides, pads)
    cases = [
        ("stem0_sp 3>64", (16, 112, 112, 3), 64, (1, 7, 7), (1, 2, 2), (0, 3, 3)),
        ("stem0_tm 64", (16, 56, 56, 64), 64, (7, 1, 1), (2, 1, 1), (3, 0, 0)),
        ("stem3_sp 64>192", (16, 28, 28, 64), 192, (1, 3, 3), (1, 1, 1), (0, 1, 1)),
        ("stem3_tm 192", (16, 28, 28, 192), 192, (3, 1, 1), (1, 1, 1), (1, 0, 0)),
        ("m3b_sp 96>128", (16, 14, 14, 96), 128, (1, 3, 3), (1, 1, 1), (0, 1, 1)),
        ("m3b_tm 128", (16, 14, 14, 128), 128, (3, 1, 1), (1, 1, 1), (1, 0, 0)),
        ("m4c_sp 128>256", (8, 7, 7, 128), 256, (1, 3, 3), (1, 1, 1), (0, 1, 1)),
    ]
    g = np.random.default_rng(0)
    REP = 8

    for name, ishape, co, ks, st, pd in cases:
        if args.only and not any(o in name for o in args.only):
            continue
        t, h, w_, ci = ishape
        x = jnp.asarray(g.standard_normal((B, *ishape), np.float32), bf16)
        w = jnp.asarray(g.standard_normal((*ks, ci, co), np.float32) * 0.05,
                        bf16)
        ot = (t + 2 * pd[0] - ks[0]) // st[0] + 1
        oh = (h + 2 * pd[1] - ks[1]) // st[1] + 1
        ow = (w_ + 2 * pd[2] - ks[2]) // st[2] + 1
        flops = 2 * B * ot * oh * ow * np.prod(ks) * ci * co

        # numerics: im2col dw must match lax dw (checks patch feature order)
        if name == cases[0][0]:
            xs = jnp.asarray(g.standard_normal((2, 4, 16, 16, ci)), bf16)
            ref_g = jax.jit(jax.grad(
                lambda ww: jnp.sum(make_conv(st, pd)(xs, ww)
                                   .astype(jnp.float32) ** 2)))(w)
            for mk in (make_im2col_conv,):
                new_g = jax.jit(jax.grad(
                    lambda ww: jnp.sum(mk(st, pd)(xs, ww)
                                       .astype(jnp.float32) ** 2)))(w)
                err = float(jnp.max(jnp.abs(ref_g - new_g))
                            / (jnp.max(jnp.abs(ref_g)) + 1e-9))
                assert err < 2e-2, (mk.__name__, err)
                print(f"numerics ok ({mk.__name__} rel err {err:.2e})",
                      flush=True)

        results = {}
        for label, mk in (("lax", make_conv), ("im2col", make_im2col_conv)):
            cv = mk(st, pd)

            def loss(xx, ww):
                return jnp.sum(cv(xx, ww).astype(jnp.float32) ** 2)

            @jax.jit
            def fwd_fn(xx, ww):
                def body(i, acc):
                    return acc + loss(xx + i.astype(bf16) * 1e-6, ww)
                return jax.lax.fori_loop(0, REP, body, 0.0)

            @jax.jit
            def fb_fn(xx, ww):
                def body(i, acc):
                    l, (gx, gw) = jax.value_and_grad(loss, (0, 1))(
                        xx + i.astype(bf16) * 1e-6, ww)
                    return (acc + l
                            + jnp.sum(gx.astype(jnp.float32) ** 2)
                            + jnp.sum(gw.astype(jnp.float32) ** 2))
                return jax.lax.fori_loop(0, REP, body, 0.0)

            @jax.jit
            def fw_fn(xx, ww):
                # grad w.r.t. w ONLY — the realistic stem cost (the input
                # needs no gradient in the real model)
                def body(i, acc):
                    l, gw = jax.value_and_grad(loss, 1)(
                        xx + i.astype(bf16) * 1e-6, ww)
                    return acc + l + jnp.sum(gw.astype(jnp.float32) ** 2)
                return jax.lax.fori_loop(0, REP, body, 0.0)

            dt_f = timeit(lambda: fwd_fn(x, w)) / REP
            dt_fb = timeit(lambda: fb_fn(x, w)) / REP
            dt_fw = timeit(lambda: fw_fn(x, w)) / REP
            results[label] = (dt_f, dt_fb, dt_fw)

        (lf, lfb, lfw), (_, ifb, ifw) = results["lax"], results["im2col"]
        print(f"{name:16s} lax fwd {lf*1e3:6.2f} ({flops/lf/1e12:5.1f}T) "
              f"f+b {lfb*1e3:6.2f} f+dw {lfw*1e3:6.2f} | "
              f"im2col f+b {ifb*1e3:6.2f} f+dw {ifw*1e3:6.2f} "
              f"{'WIN' if min(ifb, ifw) < min(lfb, lfw) * 0.97 else ''}")


if __name__ == "__main__":
    main()
