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
import itertools

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


# --------------------------------------------------------------------------- #
# STRIDED max pool backward (the four inter-stage S3D/I3D pools).
#
# XLA lowers the strided pool gradient to SelectAndScatter too — profiled
# 4.7 ms/step across S3D's four strided pools (pool_1/4: (1,3,3)/(1,2,2),
# pool_7: 3^3/2, pool_13: 2^3/2) in the fused MoCo step.  Two passes, all
# in VMEM:
#   1. argmax pass: per output, the flat index of the FIRST tap equal to
#      the window max (k^3 strided x reads) — exact PyTorch tie semantics,
#      unlike SelectAndScatter's arbitrary pick.
#   2. phase scatter: an input position j has stride-phase j mod s; only
#      taps a ≡ j+p (mod s) connect it to outputs, each at a fixed shift
#      delta=(a-p-phi)/s.  So per phase, dx is a stride-1 accumulation of
#      dy over shifted slices gated by (argmax == tap), written back with
#      one strided store.  (Dilation-based alternatives don't lower:
#      Mosaic has no interior padding and no >2D gather.)
# --------------------------------------------------------------------------- #

def _edge_pad(z, pads, value):
    cfg = [(pi, pi, 0) for pi in pads] + [(0, 0, 0)]
    return jax.lax.pad(z, jnp.asarray(value, z.dtype), cfg)


def _argmax_taps(x_ref, y, prefix, k, s, p):
    """Per output position, the flat index of the FIRST window tap equal to
    the window max — PyTorch's argmax tie convention (scan order t,h,w).

    Taps read x through strided ``pl.Slice`` ref loads (Mosaic strided
    load; strided *value* slices lower to an unsupported gather); border
    outputs whose tap position falls in the padding get a NEG pad that can
    never match the max.  Compares in fp32 (no bf16 vector compares on
    v5e).
    """
    nsp = len(k)
    full = x_ref.shape[len(prefix):len(prefix) + nsp]
    cdim = x_ref.shape[-1]
    ny = y.shape[:-1]
    yf = y.astype(jnp.float32)
    am = jnp.full(y.shape, -1, jnp.int32)
    for ti, taps in enumerate(itertools.product(*[range(ki) for ki in k])):
        o_lo, o_hi, starts = [], [], []
        for a, pi, si, n, nyi in zip(taps, p, s, full, ny):
            lo = max(0, -(-(pi - a) // si))
            hi = min(nyi - 1, (n - 1 - a + pi) // si)
            o_lo.append(lo)
            o_hi.append(hi)
            starts.append(lo * si + a - pi)
        idx = tuple(pl.Slice(st, hi - lo + 1, si)
                    for st, lo, hi, si in zip(starts, o_lo, o_hi, s))
        xs = x_ref[prefix + idx + (slice(None),)].astype(jnp.float32)
        cfg = [(lo, nyi - 1 - hi, 0)
               for lo, hi, nyi in zip(o_lo, o_hi, ny)] + [(0, 0, 0)]
        xs = jax.lax.pad(xs, jnp.float32(_NEG), cfg)
        am = jnp.where((xs == yf) & (am < 0), ti, am)
    return am


def _phase_scatter(amp, dydp, dx_ref, prefix, k, s, p):
    """dx[j] = dy[o] where j is output o's argmax tap, routed per stride
    phase: input phase j mod s sees only taps a ≡ j+p (mod s), each at a
    fixed output shift delta=(a-p-phi)/s — a stride-1 accumulation over
    shifted slices of the edge-padded (am, dy)."""
    nsp = len(k)
    full = dx_ref.shape[len(prefix):len(prefix) + nsp]
    cdim = dx_ref.shape[-1]
    tap_index = {taps: ti for ti, taps in enumerate(
        itertools.product(*[range(ki) for ki in k]))}
    for phases in itertools.product(*[range(si) for si in s]):
        nph = tuple(-(-(n - phi) // si)
                    for n, phi, si in zip(full, phases, s))
        idx = tuple(pl.Slice(phi, n, si)
                    for phi, n, si in zip(phases, nph, s))
        acc = jnp.zeros(nph + (cdim,), jnp.float32)
        tap_sets = [[a for a in range(ki) if (a - pi) % si == phi]
                    for ki, si, pi, phi in zip(k, s, p, phases)]
        for taps in itertools.product(*tap_sets):
            deltas = [(a - pi - phi) // si
                      for a, pi, phi, si in zip(taps, p, phases, s)]
            start = tuple(K - d for K, d in zip(k, deltas)) + (0,)
            limit = tuple(K - d + n
                          for K, d, n in zip(k, deltas, nph)) + (cdim,)
            ams = jax.lax.slice(amp, start, limit)
            ds = jax.lax.slice(dydp, start, limit)
            acc = acc + jnp.where(ams == tap_index[taps],
                                  ds.astype(jnp.float32), 0.0)
        dx_ref[prefix + idx + (slice(None),)] = acc.astype(dx_ref.dtype)


def _bwd_kernel_spatial(x_ref, y_ref, dy_ref, dx_ref, *, k, s, p):
    # temporal window/stride == 1: one (H, W, Cb) slab per program
    am = _argmax_taps(x_ref, y_ref[0, 0], (0, 0), k, s, p)
    amp = _edge_pad(am, k, -1)
    dydp = _edge_pad(dy_ref[0, 0], k, 0.0)
    _phase_scatter(amp, dydp, dx_ref, (0, 0), k, s, p)


def _bwd_kernel_full(x_ref, y_ref, dy_ref, dx_ref, *, k, s, p):
    am = _argmax_taps(x_ref, y_ref[0], (0,), k, s, p)
    amp = _edge_pad(am, k, -1)
    dydp = _edge_pad(dy_ref[0], k, 0.0)
    _phase_scatter(amp, dydp, dx_ref, (0,), k, s, p)


def _strided_bwd(x, y, dy, k, s, p):
    b, t, h, w, c = x.shape
    _, t2, h2, w2, _ = y.shape
    cb = min(c, LANE_BLOCK)
    # Mosaic strided load/store is 32-bit only; x (phase reads) and dx
    # (phase writes) go through fp32, y/dy stay in their dtype (full-block
    # loads).  The conversions fuse into the surrounding XLA producers.
    out_dtype = x.dtype
    dy = dy.astype(y.dtype)
    if x.dtype.itemsize < 4:
        x = x.astype(jnp.float32)

    if k[0] == 1 and s[0] == 1:
        # spatial-only pools (pool_1 / pool_4): block over T as well — no
        # temporal halo needed, and the 56^2 stage would blow VMEM otherwise
        grid = (b, t, pl.cdiv(c, cb))
        spec_x = pl.BlockSpec((1, 1, h, w, cb), lambda i, j, l: (i, j, 0, 0, l),
                              memory_space=pltpu.VMEM)
        spec_y = pl.BlockSpec((1, 1, h2, w2, cb),
                              lambda i, j, l: (i, j, 0, 0, l),
                              memory_space=pltpu.VMEM)
        kern = functools.partial(_bwd_kernel_spatial, k=k[1:], s=s[1:],
                                 p=p[1:])
        blk = h * w * cb
    else:
        grid = (b, pl.cdiv(c, cb))
        spec_x = pl.BlockSpec((1, t, h, w, cb), lambda i, l: (i, 0, 0, 0, l),
                              memory_space=pltpu.VMEM)
        spec_y = pl.BlockSpec((1, t2, h2, w2, cb),
                              lambda i, l: (i, 0, 0, 0, l),
                              memory_space=pltpu.VMEM)
        kern = functools.partial(_bwd_kernel_full, k=k, s=s, p=p)
        blk = t * h * w * cb

    params = {}
    # fp32 x + acc + dilated pads: budget ~14 fp32-equivalents of the block
    if 14 * blk * 4 > 14 * 2**20:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2**20)
    dx = pl.pallas_call(
        kern, grid=grid, in_specs=[spec_x, spec_y, spec_y], out_specs=spec_x,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        **params,
    )(x, y, dy)
    return dx.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool3d_strided(x: jnp.ndarray, kernel_size=(3, 3, 3),
                       stride=(2, 2, 2), padding=(1, 1, 1)) -> jnp.ndarray:
    """Strided 3D max pool on (B, T, H, W, C); PyTorch padding semantics.

    HYBRID like :func:`max_pool3d_s1`: forward stays XLA reduce_window (it
    fuses with producers); only the SelectAndScatter gradient is replaced
    by the two-pass argmax/phase-scatter kernel.  Gradient ties route to
    the FIRST tap in window scan order — PyTorch's argmax convention
    (SelectAndScatter picks one arbitrary position)."""
    return _reduce_window_strided(x, tuple(kernel_size), tuple(stride),
                                  tuple(padding))


def _reduce_window_strided(x, k, s, p):
    from flax import linen as nn

    return nn.max_pool(x, window_shape=k, strides=s,
                       padding=[(pi, pi) for pi in p])


def _mps_fwd(x, k, s, p):
    y = _reduce_window_strided(x, k, s, p)
    return y, (x, y)


def _mps_bwd(k, s, p, res, dy):
    x, y = res
    return (_strided_bwd(x, y, dy, k, s, p),)


max_pool3d_strided.defvjp(_mps_fwd, _mps_bwd)
