"""Pallas TPU kernel: stride-1 3D max pooling, fused forward and backward.

Every S3D/I3D inception block carries a kxkxk stride-1 max-pool branch
(reference: lib/modeling/backbone/backbone_3d/s3d_1.py:71-329, the
``maxpool`` branch of each Mixed block).  XLA lowers its forward to
reduce_window and its gradient to SelectAndScatter — measured ~18 ms
fwd+bwd for ONE pool at (128,16,14,14,256) on v5e, i.e. the dominant
backward cost of the whole block.  Rewriting as shifted-``jnp.maximum``
chains helps the forward but the backward still burns one HBM round-trip
per select.

This kernel does each direction in ONE pass over HBM:

  forward : read x (one (T,H,W,Cb) block per program), compute the
            27-shift max entirely in VMEM, write y.
  backward: read x, y, dy; in VMEM compute
                dx[j] = sum_a dy_p[j+a] * (x[j] == y_p[j+a])
            (the compare-mask/one-hot max gradient: windows `j+a` are the
            output positions whose window covers j), write dx.

Gradient-at-ties semantics: ties split the gradient among all argmaxes —
a valid subgradient (SelectAndScatter instead picks one arbitrary
position; torch picks the first).  Continuous activations tie with
probability ~0; tests pin exactness on tie-free inputs.

Grid: (B, ceil(C / LANE_BLOCK)); each program holds the full (T, H+2p,
W+2p) spatial extent of one batch element and one 128-lane channel block
in VMEM (<= ~1 MB for every S3D/I3D stage), so all shifted reads are
vector-register moves, never HBM traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_BLOCK = 128
_NEG = -3.0e38  # < bf16/fp32 min normal activation; acts as -inf


def _pad3(z, pads, value):
    """Pad the three spatial axes of a (T, H, W, C) block with ``value``."""
    cfg = [(p, p, 0) for p in pads] + [(0, 0, 0)]
    return jax.lax.pad(z, jnp.asarray(value, z.dtype), cfg)


def _shifts(k):
    for a in range(k[0]):
        for b in range(k[1]):
            for c in range(k[2]):
                yield a, b, c


def _fwd_kernel(x_ref, y_ref, *, k, p):
    x = x_ref[0]                                   # (T, H, W, Cb)
    t, h, w, _ = x.shape
    xp = _pad3(x, p, _NEG)
    acc = None
    for a, b, c in _shifts(k):
        part = jax.lax.slice(
            xp, (a, b, c, 0), (a + t, b + h, c + w, xp.shape[3]))
        acc = part if acc is None else jnp.maximum(acc, part)
    y_ref[0] = acc


def _bwd_kernel(x_ref, y_ref, dy_ref, dx_ref, *, k, p):
    # VMEM budget: the padded y/dy copies stay in the input dtype (bf16);
    # only the per-tap slices are upcast to fp32, because Mosaic on v5e
    # rejects bf16 vector compares ("Target does not support this
    # comparison") and the mask-sum should accumulate in fp32 anyway.
    t, h, w, _ = x_ref.shape[1:]
    x = x_ref[0].astype(jnp.float32)               # (T, H, W, Cb)
    # output o covers input j = o + a - p  =>  contributing outputs for
    # input j are o = j + p - a; pad y/dy by (k-1-p) so o becomes a plain
    # shifted slice for every tap a.
    q = tuple(ki - 1 - pi for ki, pi in zip(k, p))
    yp = _pad3(y_ref[0], q, _NEG)
    dyp = _pad3(dy_ref[0], q, 0.0)
    acc = jnp.zeros(x.shape, jnp.float32)
    for a, b, c in _shifts(k):
        ys = jax.lax.slice(
            yp, (a, b, c, 0), (a + t, b + h, c + w, yp.shape[3]))
        ds = jax.lax.slice(
            dyp, (a, b, c, 0), (a + t, b + h, c + w, dyp.shape[3]))
        acc = acc + jnp.where(x == ys.astype(jnp.float32),
                              ds.astype(jnp.float32), 0.0)
    dx_ref[0] = acc.astype(dx_ref.dtype)


def _block_specs(shape):
    b_, t, h, w, c = shape
    spec = pl.BlockSpec((1, t, h, w, LANE_BLOCK),
                        lambda i, j: (i, 0, 0, 0, j),
                        memory_space=pltpu.VMEM)
    grid = (b_, pl.cdiv(c, LANE_BLOCK))
    return spec, grid


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def max_pool3d_s1(x: jnp.ndarray, kernel_size=(3, 3, 3),
                  padding=(1, 1, 1)) -> jnp.ndarray:
    """Stride-1 3D max pool on (B, T, H, W, C); PyTorch padding semantics.

    HYBRID: the forward stays XLA reduce_window — measured in the full
    train step, a Pallas forward here is an optimization barrier that
    costs ~23 ms of lost producer/consumer fusion (model fwd 17.3 ->
    40.4 ms).  Only the backward (XLA: SelectAndScatter, 26 ms/step
    across S3D's 11 block pools) is replaced by the one-pass kernel.
    """
    return _reduce_window_fwd(x, tuple(kernel_size), tuple(padding))


def _reduce_window_fwd(x, k, p):
    return jax.lax.reduce_window(
        x, jnp.asarray(-jnp.inf, x.dtype), jax.lax.max,
        (1, *k, 1), (1, 1, 1, 1, 1),
        [(0, 0), (p[0], p[0]), (p[1], p[1]), (p[2], p[2]), (0, 0)])


def _mp_fwd(x, k, p):
    y = _reduce_window_fwd(x, k, p)
    return y, (x, y)


def _mp_bwd(k, p, res, dy):
    x, y = res
    spec, grid = _block_specs(x.shape)
    kern = functools.partial(_bwd_kernel, k=k, p=p)
    # Raise the scoped-vmem budget only when the 27 unrolled tap slices
    # can't fit the default 16 MB accounting (big T blocks, e.g. the lab's
    # T=16 14^2 case; the in-model S3D blocks are T<=8 and fit).  Keeping
    # the default budget whenever possible preserves XLA's VMEM headroom
    # for prefetching around the kernel.
    t, h, w = x.shape[1:4]
    blk = (t + 2) * (h + 2) * (w + 2) * LANE_BLOCK * 2
    params = {}
    if 30 * blk > 14 * 2**20:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20)
    dx = pl.pallas_call(
        kern, grid=grid, in_specs=[spec, spec, spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        **params,
    )(x, y, dy.astype(x.dtype))
    return (dx,)


max_pool3d_s1.defvjp(_mp_fwd, _mp_bwd)
