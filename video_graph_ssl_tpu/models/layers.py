"""Core 3D-CNN building blocks as Flax modules, laid out TPU-first.

Design notes (vs the reference, lib/modeling/backbone/backbone_3d/s3d_1.py):

* **Layout**: all activations are channels-last ``(B, T, H, W, C)`` (NDHWC),
  the native layout for XLA:TPU convolutions — the reference's NCDHW tensors
  would force transposes in front of every conv on TPU.
* **Dtypes**: convolutions run in a configurable compute dtype (bfloat16 by
  default — MXU native), parameters and batch-norm statistics stay float32.
* **BatchNorm**: computed over the *global* batch.  Under jit with a sharded
  batch, the mean/variance reductions are global-view, so XLA inserts the
  cross-chip ``psum`` automatically — this is the TPU-native replacement for
  the reference's ShuffleBN leak countermeasure
  (reference: tools/train_video_contrast_dis.py:189-231).
* Explicit symmetric padding reproduces the reference's PyTorch padding
  arithmetic exactly (e.g. SepConv3d k=7,s=2,p=3:
  reference s3d_1.py:50-69).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

Dtype = Any


def _triple(v) -> Tuple[int, int, int]:
    if isinstance(v, (tuple, list)):
        assert len(v) == 3
        return tuple(v)
    return (v, v, v)


def max_pool_3d_ref(x: jnp.ndarray, kernel_size, stride,
                    padding=0) -> jnp.ndarray:
    """3D max pooling via lax reduce_window (XLA default gradient:
    SelectAndScatter — slow on TPU; see max_pool_3d)."""
    k = _triple(kernel_size)
    s = _triple(stride)
    p = _triple(padding)
    pads = [(pi, pi) for pi in p]
    return nn.max_pool(x, window_shape=k, strides=s, padding=pads)


def max_pool_3d(x: jnp.ndarray, kernel_size, stride, padding=0) -> jnp.ndarray:
    """3D max pooling on (B, T, H, W, C), PyTorch padding semantics.

    Stride-1 pools on TPU dispatch to a fused Pallas kernel
    (ops/pallas/maxpool_kernel.py): XLA's reduce_window forward +
    SelectAndScatter gradient cost ~18 ms fwd+bwd for ONE pool at
    (128,16,14,14,256) on v5e — and every S3D/I3D inception block carries
    a 3x3x3 s1 pool branch, making it the dominant backward cost of the
    block.  The kernel does each direction in one pass over HBM with all
    27 shifted reads in VMEM.  Strided pools (the four inter-stage pools)
    keep the XLA lowering.  Gradient ties: the kernel splits the gradient
    among all argmaxes (valid subgradient; SelectAndScatter picks one)."""
    # Stride-1 pools (every S3D/I3D inception block carries one) avoid
    # lax.reduce_window: XLA lowers its gradient to SelectAndScatter,
    # profiled at 26 ms/step across S3D's 11 pool branches
    # (perf/profile_step.py).  A separable chain of shifted-slice
    # jnp.maximum ops has the identical forward, and JAX differentiates
    # it into elementwise selects that fuse with neighbors and follow
    # whatever layout XLA picked (the activations here are batch-minor —
    # a Pallas kernel would force 4 layout transposes per pool; see
    # ops/pallas/maxpool_kernel.py for that measured dead end).
    # Gradient ties: maximum splits between tied operands (valid
    # subgradient; SelectAndScatter picks one arbitrary position).
    # Strided pools keep reduce_window (strided-slice backward pads are
    # catastrophic: 101 ms at the stem pool, perf/maxpool_lab.py).
    s = _triple(stride)
    if s == (1, 1, 1) or os.environ.get("VGS_POOL_STRIDED") == "chain":
        # Strided pools via VGS_POOL_STRIDED=chain: per axis, run the
        # SAME dense where(>=) chain and immediately strided-slice that
        # axis — one zero-interleave pad per axis in the backward instead
        # of SelectAndScatter.  MEASURED DEAD END #3 for strided pools
        # (08-18, v5e full step: 1359 -> 779 clips/s,
        # perf/CHIP_QUEUE_r03c.jsonl `pool_chain`): the dense stride-1
        # intermediates at stem resolution (4x the output elements) plus
        # their interleave-pad cotangents cost far more HBM traffic than
        # the 4.7 ms SelectAndScatter they replace.  Kept as the measured
        # witness; exact math either way (forward golden-tested).
        k = _triple(kernel_size)
        p = _triple(padding)
        neg = (jnp.finfo(x.dtype).min
               if jnp.issubdtype(x.dtype, jnp.floating)
               else jnp.iinfo(x.dtype).min)
        y = x
        for axis, (ki, pi, si) in enumerate(zip(k, p, s), start=1):
            if ki == 1 and pi == 0 and si == 1:
                continue
            pad5 = [(0, 0)] * y.ndim
            pad5[axis] = (pi, pi)
            yp = jnp.pad(y, pad5, constant_values=neg)
            n = y.shape[axis]
            acc = None
            for a in range(ki):
                sl = [slice(None)] * y.ndim
                sl[axis] = slice(a, a + n - ki + 1 + 2 * pi)
                part = yp[tuple(sl)]
                # where(>=) instead of jnp.maximum: identical forward, but
                # maximum's VJP tie-SPLITS the gradient with a divide
                # (profiled as 15 ms/step of divide_multiply fusions);
                # where's VJP is a plain select routing ties to the first
                # tap — PyTorch's argmax convention.
                acc = part if acc is None else jnp.where(acc >= part, acc,
                                                         part)
            if si != 1:
                sl = [slice(None)] * y.ndim
                sl[axis] = slice(None, None, si)
                acc = acc[tuple(sl)]
            y = acc
        return y
    # Strided pools keep the XLA lowering (SelectAndScatter gradient,
    # 4.7 ms/step across S3D's four strided pools).  A Pallas two-pass
    # argmax/phase-scatter backward (ops/pallas/maxpool_kernel.py:
    # max_pool3d_strided) is exact vs torch incl. tie routing and is kept
    # as a measured DEAD END: in the full fused step it costs 95.8 ->
    # 206 ms/step (bench 1338 -> 621 clips/s) — the pallas_call pins
    # batch-major layouts on x/y/dy that XLA otherwise keeps batch-minor
    # here, forcing transposes that dwarf the SelectAndScatter saving
    # (same failure mode as the stride-1 kernel, round 2).
    # VGS_POOL_BWD=pallas re-enables it for remeasurement.
    if (jax.default_backend() == "tpu"
            and os.environ.get("VGS_POOL_BWD") == "pallas"):
        from ..ops.pallas.maxpool_kernel import max_pool3d_strided

        return max_pool3d_strided(x, _triple(kernel_size), s,
                                  _triple(padding))
    return max_pool_3d_ref(x, kernel_size, stride, padding)


def avg_pool_3d(x: jnp.ndarray, kernel_size, stride, padding=0) -> jnp.ndarray:
    """3D average pooling on (B, T, H, W, C), PyTorch semantics
    (padded zeros *are* counted in the divisor, like torch's default)."""
    k = _triple(kernel_size)
    s = _triple(stride)
    p = _triple(padding)
    pads = [(pi, pi) for pi in p]
    return nn.avg_pool(x, window_shape=k, strides=s, padding=pads,
                       count_include_pad=True)


class ConvBN(nn.Module):
    """Conv3D (no bias by default) + BatchNorm + optional ReLU.

    The fused conv+BN+ReLU epilogue is what cuDNN gave the reference for
    free; on TPU, XLA fuses the BN scale/shift and ReLU into the convolution
    epilogue when they appear in one jitted graph.

    ``padding`` may be a per-dim int tuple (PyTorch symmetric semantics) or
    the string 'SAME' (TF semantics — what the reference's I3D emulates by
    hand, i3dpt.py:38-122).
    """

    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Any = (0, 0, 0)
    use_bias: bool = False
    relu: bool = True
    bn_eps: float = 1e-3
    bn_momentum: float = 0.999  # flax convention; == torch momentum 0.001
    kernel_init: Any = None
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 bn_frozen: bool = False) -> jnp.ndarray:
        if isinstance(self.padding, str):
            pads = self.padding
        else:
            # ints are symmetric (PyTorch semantics); (lo, hi) pairs pass
            # through (needed by the space-to-depth stem's off-center pads)
            pads = [tuple(p) if isinstance(p, (tuple, list)) else (p, p)
                    for p in self.padding]
        kw = {}
        if self.kernel_init is not None:
            kw["kernel_init"] = self.kernel_init
        x = nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=pads,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
            **kw,
        )(x)
        # Checkpoint tag for the 'conv_saved' remat policy (s3d.py): under
        # nn.remat(policy=save_only_these_names('conv_out')) the backward
        # keeps conv outputs and recomputes the cheap BN/ReLU epilogues —
        # half the stored-activation traffic with zero conv recompute.
        # Outside a remat scope the tag is an identity.
        x = checkpoint_name(x, "conv_out")
        # bn_frozen: partial-BN — use running stats even in training
        # (reference: VideoModelWrapper.train() override,
        # model_wrappers.py:130-146); affine params still receive grads.
        # dtype=self.dtype keeps the normalize/affine pass (and its
        # backward) in bf16 — mean/var reductions and running stats stay
        # float32 (matches flax normalization.py force_float32_reductions),
        # so stability matches the fp32-BN convention while halving the
        # elementwise HBM traffic, which dominates the big early-stage
        # activations in the backward.
        # VGS_FUSED_BN=1: custom-VJP BN with the ReLU folded into its
        # backward (ops/fused_bn.py).  Kept as a measured NEUTRAL-to-worse
        # alternative: the flax lowering's ~22 ms of reduce fusions +
        # 6.6 ms of ReLU selects looked attackable, but bench says
        # variadic-reduce stats 1205 clips/s, two-sum custom VJP 1315 vs
        # flax 1338 — XLA already fuses the select/reduce chain as well as
        # the hand-written backward does, and TPU's fast row-reduce only
        # exists for single-operand reduces.
        if os.environ.get("VGS_FUSED_BN", "0") == "1":
            from ..ops.fused_bn import FusedBatchNorm

            return FusedBatchNorm(
                use_running_average=(not train) or bn_frozen,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                relu=self.relu,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="bn",
            )(x)
        x = nn.BatchNorm(
            use_running_average=(not train) or bn_frozen,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="bn",
        )(x)
        x = x.astype(self.dtype)
        if self.relu:
            x = nn.relu(x)
        return x


class BasicConv3d(nn.Module):
    """1:1 counterpart of the reference's BasicConv3d (s3d_1.py:37-48):
    full 3D conv + BN(eps=1e-3, torch momentum=1e-3) + ReLU."""

    features: int
    kernel_size: int = 1
    strides: int = 1
    padding: int = 0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 bn_frozen: bool = False) -> jnp.ndarray:
        return ConvBN(
            features=self.features,
            kernel_size=_triple(self.kernel_size),
            strides=_triple(self.strides),
            padding=_triple(self.padding),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="block",
        )(x, train=train, bn_frozen=bn_frozen)


class _SepHalf(nn.Module):
    """ConvBN-shaped param holder ('conv' + 'bn' children, identical
    variable trees) for the fused-backward SepConv path."""

    features: int
    in_features: int
    kernel_size: Tuple[int, int, int]
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.conv = _ConvKernelParam(self.features, self.in_features,
                                     self.kernel_size,
                                     param_dtype=self.param_dtype,
                                     name="conv")
        self.bn = _BNVars(self.features, param_dtype=self.param_dtype,
                          name="bn")

    def kernel(self) -> jnp.ndarray:
        return self.conv()

    def bn_vars(self):
        return self.bn()


class SepConv3d(nn.Module):
    """Separable 3D conv: spatial (1,k,k) then temporal (k,1,1), each with
    BN+ReLU (reference: s3d_1.py:50-69).  This factorization is the S3D hot
    path — ~70% of model FLOPs — and both halves map straight onto the MXU
    as NDHWC convolutions.

    ``temporal_bias=True`` gives the S3DG 'STConv3d' variant: both convs
    biased, temporal conv init Normal(0, 0.01)
    (reference: S3DG_Pytorch.py:20-43).

    ``fused_bwd`` (TPU.SEPCONV_FUSED): route the k=3/s=1/p=1 unbiased
    instances (all inception-branch SepConvs) through the custom-VJP
    3-sweep recompute backward (ops/fused_sepconv.py; Pallas kernels on a
    single TPU device, identical-math XLA sweeps elsewhere).  Same forward
    bits, same variable tree; other shapes (the k=7 stem) keep the
    standard path.
    """

    features: int
    kernel_size: int
    strides: int = 1
    padding: int = 0
    temporal_bias: bool = False
    fused_bwd: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 bn_frozen: bool = False) -> jnp.ndarray:
        k, s, p = self.kernel_size, self.strides, self.padding
        if (self.fused_bwd and not self.temporal_bias
                and (k, s, p) == (3, 1, 1)):
            from ..ops.fused_sepconv import pallas_covered

            # instances with no covering kernel (resident VMEM slabs or
            # manual-DMA H-slab grid) keep the standard autodiff path —
            # the XLA fallback sweeps would only add recompute there
            if pallas_covered(x.shape, self.features) is not None:
                return self._fused(x, train, bn_frozen)
        x = ConvBN(
            features=self.features,
            kernel_size=(1, k, k),
            strides=(1, s, s),
            padding=(0, p, p),
            use_bias=self.temporal_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="spatial",
        )(x, train=train, bn_frozen=bn_frozen)
        x = ConvBN(
            features=self.features,
            kernel_size=(k, 1, 1),
            strides=(s, 1, 1),
            padding=(p, 0, 0),
            use_bias=self.temporal_bias,
            kernel_init=(nn.initializers.normal(stddev=0.01)
                         if self.temporal_bias else None),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="temporal",
        )(x, train=train, bn_frozen=bn_frozen)
        return x

    def _fused(self, x: jnp.ndarray, train: bool,
               bn_frozen: bool) -> jnp.ndarray:
        from ..ops.fused_sepconv import _bn_relu, fused_sepconv_train

        cin = x.shape[-1]
        pkw = dict(param_dtype=self.param_dtype)
        hs = _SepHalf(self.features, cin, (1, 3, 3), name="spatial", **pkw)
        ht = _SepHalf(self.features, self.features, (3, 1, 1),
                      name="temporal", **pkw)
        ws, wt = hs.kernel(), ht.kernel()
        g1, b1, rm1, rv1 = hs.bn_vars()
        g2, b2, rm2, rv2 = ht.bn_vars()

        if train and not bn_frozen:
            out, (mu1, var1, mu2, var2) = fused_sepconv_train(
                x, ws, wt, g1, b1, g2, b2, self.dtype)
            if not self.is_initializing():
                m = 0.999  # flax-convention momentum of ConvBN
                rm1.value = m * rm1.value + (1 - m) * mu1
                rv1.value = m * rv1.value + (1 - m) * var1
                rm2.value = m * rm2.value + (1 - m) * mu2
                rv2.value = m * rv2.value + (1 - m) * var2
            return out

        # eval / frozen-BN: running-stat affine, plain composition (the
        # backward here is the ordinary XLA one — grads still flow to the
        # conv kernels and BN affines, matching ConvBN's bn_frozen path)
        from ..ops.fused_sepconv import _conv_s, _conv_t

        y1 = _conv_s(x.astype(self.dtype), ws.astype(self.dtype))
        a = _bn_relu(y1.astype(jnp.float32), rm1.value, rv1.value,
                     g1, b1, self.dtype)
        y2 = _conv_t(a, wt.astype(self.dtype))
        return _bn_relu(y2.astype(jnp.float32), rm2.value, rv2.value,
                        g2, b2, self.dtype)


def space_to_depth_hw(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, T, H/2, W/2, 4C); channel order (dh, dw, c)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6))
    return x.reshape(b, t, h // 2, w // 2, 4 * c)


def space_to_depth_t(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, T/2, H, W, 2C); channel order (dt, c)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // 2, 2, h, w, c)
    x = jnp.transpose(x, (0, 1, 3, 4, 2, 5))
    return x.reshape(b, t // 2, h, w, 2 * c)


def fold_stem_kernel_s2d(w, axes: str):
    """Fold a k=7 stride-2 conv kernel into its space-to-depth equivalent.

    A stride-2 pad-3 7-tap conv equals a stride-1 4-tap conv on the
    2x-space-to-depth input with pads (2, 1): output o reads input
    2o + j - 3 (tap j in 0..6); in block space that is block o + a - 2,
    phase d, with j = 2a + d - 1 — only tap (a=0, d=0), j = -1, falls
    outside the 7-tap support and is zero.  This mapping is EXACT (the
    MLPerf-style trick, unlike the reference S3DG stem's approximate
    (2,4,4) conv, /root/reference/lib/modeling/backbone/s3dg.py:297-315).

    ``axes='hw'``: (1,7,7,C,F) -> (1,4,4,4C,F);
    ``axes='t'``:  (7,1,1,C,F) -> (4,1,1,2C,F).
    """
    import numpy as np

    w = np.asarray(w)
    if axes == "hw":
        _, kh, kw, c, f = w.shape
        assert (kh, kw) == (7, 7), w.shape
        out = np.zeros((1, 4, 4, 4 * c, f), w.dtype)
        for a in range(4):
            for dh in range(2):
                jh = 2 * a + dh - 1
                if not 0 <= jh < 7:
                    continue
                for bb in range(4):
                    for dw in range(2):
                        jw = 2 * bb + dw - 1
                        if not 0 <= jw < 7:
                            continue
                        ch = (dh * 2 + dw) * c
                        out[0, a, bb, ch:ch + c] = w[0, jh, jw]
        return out
    assert axes == "t"
    kd, _, _, c, f = w.shape
    assert kd == 7, w.shape
    out = np.zeros((4, 1, 1, 2 * c, f), w.dtype)
    for a in range(4):
        for dt in range(2):
            j = 2 * a + dt - 1
            if not 0 <= j < 7:
                continue
            out[a, 0, 0, dt * c:(dt + 1) * c] = w[j, 0, 0]
    return out


class SepConvS2D(nn.Module):
    """Space-to-depth S3D stem: SepConv3d(k=7, s=2, p=3) re-expressed as two
    STRIDE-1 convs on space-to-depth inputs — exactly the same function given
    ``fold_stem_kernel_s2d``-folded weights (BN/ReLU shapes are unchanged).

    Why: the standard stem convolves 3 input channels with stride 2 — the
    MXU tile pads Ci 3 -> 8 (62% wasted lanes) and the stride makes dx a
    dilated transposed conv in the backward.  Space-to-depth moves the
    stride into a free reshape: Ci becomes 12 (spatial) / 128 (temporal)
    and both convs are stride-1, so forward and both backward contractions
    are dense MXU matmuls.  Reference stem: s3d_1.py:50-69 (SepConv3d);
    the trick itself appears in the reference only as the approximate S3DG
    text-video stem (s3dg.py:297-315) — here it is exact and opt-in
    (``TPU.STEM_S2D``), with checkpoint folding in utils/torch_interop.

    Measured on v5e (full fused MoCo step, bs=128): full s2d 113.0 ms vs
    96.1 baseline (the temporal block transpose is an extra HBM round trip
    of the largest stem tensor); spatial-only 97.2 — neutral.  XLA's
    small-channel stem conv is not a bottleneck on this architecture, so
    the default stays off; the module remains for stem-swap experiments
    and as the measured record (perf/regime_bench.py moco+s2d*).
    """

    features: int
    temporal_bias: bool = False
    # apply the trick to the temporal (7,1,1)/s2 conv too; measured SLOWER
    # on v5e (the (B,T,56,56,64) block transpose is an extra HBM round
    # trip of the largest stem tensor), kept for the record
    temporal_s2d: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 bn_frozen: bool = False) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        assert t % 2 == 0 and h % 2 == 0 and w % 2 == 0, x.shape
        kw = dict(use_bias=self.temporal_bias, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        x = space_to_depth_hw(x)
        x = ConvBN(
            features=self.features,
            kernel_size=(1, 4, 4),
            padding=(0, (2, 1), (2, 1)),
            name="spatial",
            **kw,
        )(x, train=train, bn_frozen=bn_frozen)
        tkw = dict(
            kernel_init=(nn.initializers.normal(stddev=0.01)
                         if self.temporal_bias else None),
            name="temporal",
            **kw,
        )
        if self.temporal_s2d:
            x = space_to_depth_t(x)
            x = ConvBN(kernel_size=(4, 1, 1), padding=((2, 1), 0, 0),
                       features=self.features,
                       **tkw)(x, train=train, bn_frozen=bn_frozen)
        else:
            x = ConvBN(kernel_size=(7, 1, 1), strides=(2, 1, 1),
                       padding=(3, 0, 0), features=self.features,
                       **tkw)(x, train=train, bn_frozen=bn_frozen)
        return x


class _ConvKernelParam(nn.Module):
    """Param-only stand-in for ConvBN's ``nn.Conv`` child: declares the same
    'kernel' parameter (name, shape, init, dtype) without computing, so a
    parent can run the convolution itself differently (packed with siblings,
    or through a custom-VJP fused step) while the checkpoint tree stays
    byte-identical to the standard path."""

    features: int
    in_features: int
    kernel_size: Tuple[int, int, int] = (1, 1, 1)
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        from flax.linen.linear import default_kernel_init

        return self.param("kernel", default_kernel_init,
                          tuple(self.kernel_size)
                          + (self.in_features, self.features),
                          self.param_dtype)


# packed-pointwise path name (1x1x1 kernels)
_PointwiseKernel = _ConvKernelParam


class _BNVars(nn.Module):
    """Variable-tree stand-in for ``nn.BatchNorm``: declares the identical
    params ('scale', 'bias') and batch_stats ('mean', 'var') — same names,
    shapes, inits, dtypes — and returns them for the parent to apply over a
    PACKED channel range (per-channel math is unchanged, so one stat pass
    over the concatenated channels equals the per-branch BatchNorms)."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (self.features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (self.features,))
        return scale, bias, ra_mean, ra_var


def packed_bn_relu(parent: nn.Module, y: jnp.ndarray, bn_vars,
                   train: bool, momentum: float, eps: float,
                   dtype) -> jnp.ndarray:
    """BN+ReLU over packed channels, per-branch variables.

    Mirrors flax ``nn.BatchNorm`` exactly (normalization.py _compute_stats
    fast-variance path + _normalize) but runs ONE stat-reduce pair and ONE
    normalize/ReLU pass for all branches instead of one per branch;
    running stats update per branch slice.  ``bn_vars`` is a list of
    (scale, bias, ra_mean, ra_var) tuples in pack order."""
    scale = jnp.concatenate([v[0] for v in bn_vars])
    bias = jnp.concatenate([v[1] for v in bn_vars])
    if train:
        xf = y.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2, 3))
        mu2 = jnp.mean(xf * xf, axis=(0, 1, 2, 3))
        var = jnp.maximum(0.0, mu2 - mean * mean)
        if not parent.is_initializing():
            off = 0
            for _, _, ra_mean, ra_var in bn_vars:
                c = ra_mean.value.shape[0]
                ra_mean.value = (momentum * ra_mean.value
                                 + (1 - momentum) * mean[off:off + c])
                ra_var.value = (momentum * ra_var.value
                                + (1 - momentum) * var[off:off + c])
                off += c
    else:
        mean = jnp.concatenate([v[2].value for v in bn_vars])
        var = jnp.concatenate([v[3].value for v in bn_vars])
    z = (y - mean) * (jax.lax.rsqrt(var + eps) * scale) + bias
    return nn.relu(z.astype(dtype))


class _PointwiseBlock(nn.Module):
    """ConvBN-shaped param holder for the packed-pointwise path: child
    names ('conv', 'bn') and variable trees match ConvBN exactly; both the
    conv and the BN apply run packed in the parent
    (see InceptionBlock.pack_pointwise)."""

    features: int
    in_features: int
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.conv = _PointwiseKernel(self.features, self.in_features,
                                     param_dtype=self.param_dtype,
                                     name="conv")
        self.bn = _BNVars(self.features, param_dtype=self.param_dtype,
                          name="bn")

    def kernel(self) -> jnp.ndarray:
        return self.conv()

    def bn_vars(self):
        return self.bn()


class _PackedBasic(nn.Module):
    """BasicConv3d-shaped wrapper (child 'block') for packed 1x1x1 convs."""

    features: int
    in_features: int
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.block = _PointwiseBlock(self.features, self.in_features,
                                     param_dtype=self.param_dtype,
                                     name="block")

    def kernel(self) -> jnp.ndarray:
        return self.block.kernel()

    def bn_vars(self):
        return self.block.bn_vars()


class InceptionBlock(nn.Module):
    """Parameterized S3D Inception block.

    One module replaces the reference's nine near-identical Mixed_* classes
    (s3d_1.py:71-329): branch0 = 1x1x1 BasicConv; branch1/2 = 1x1x1 reduce +
    3x3x3 SepConv; branch3 = 3x3x3 maxpool + 1x1x1 BasicConv; channel concat.

    ``pack_pointwise`` (TPU.PACK_POINTWISE): compute branch0 + the two
    reduce convs as ONE 1x1x1 convolution over concatenated output channels,
    then split and run each branch's own BN+ReLU.  Identical math and an
    identical parameter tree (verified by tests/test_pack_pointwise.py) —
    but one well-shaped MXU matmul instead of three skinny ones: the b2
    reduce conv is as narrow as 16-48 output channels (lane tile pads to
    128, so up to 87% of the MXU columns idle), while the packed widths
    (e.g. mixed_4c 160+112+24=296, mixed_5c 384+192+48=624) fill the tiles.
    branch3's pointwise conv reads the pooled tensor, not x, so it cannot
    join the pack.
    """

    b0: int
    b1: Tuple[int, int]
    b2: Tuple[int, int]
    b3: int
    temporal_bias: bool = False
    pack_pointwise: bool = False
    fused_sepconv: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 bn_frozen: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        skw = dict(temporal_bias=self.temporal_bias,
                   fused_bwd=self.fused_sepconv, **kw)
        bf = dict(train=train, bn_frozen=bn_frozen)
        if self.pack_pointwise:
            cin = x.shape[-1]
            pkw = dict(param_dtype=self.param_dtype)
            pw0 = _PackedBasic(self.b0, cin, name="branch0", **pkw)
            pw1 = _PackedBasic(self.b1[0], cin, name="branch1_reduce", **pkw)
            pw2 = _PackedBasic(self.b2[0], cin, name="branch2_reduce", **pkw)
            kpack = jnp.concatenate(
                [pw.kernel() for pw in (pw0, pw1, pw2)],
                axis=-1).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kpack, (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            z = packed_bn_relu(
                self, y, [pw.bn_vars() for pw in (pw0, pw1, pw2)],
                train=train and not bn_frozen, momentum=0.999, eps=1e-3,
                dtype=self.dtype)
            c0, c1 = self.b0, self.b0 + self.b1[0]
            x0, x1, x2 = z[..., :c0], z[..., c0:c1], z[..., c1:]
        else:
            x0 = BasicConv3d(self.b0, 1, name="branch0", **kw)(x, **bf)
            x1 = BasicConv3d(self.b1[0], 1, name="branch1_reduce", **kw)(x, **bf)
            x2 = BasicConv3d(self.b2[0], 1, name="branch2_reduce", **kw)(x, **bf)
        x1 = SepConv3d(self.b1[1], 3, padding=1, name="branch1", **skw)(x1, **bf)
        x2 = SepConv3d(self.b2[1], 3, padding=1, name="branch2", **skw)(x2, **bf)
        x3 = max_pool_3d(x, 3, 1, 1)
        x3 = BasicConv3d(self.b3, 1, name="branch3", **kw)(x3, **bf)
        return jnp.concatenate([x0, x1, x2, x3], axis=-1)

    @staticmethod
    def out_channels(b0: int, b1: Sequence[int], b2: Sequence[int], b3: int) -> int:
        return b0 + b1[1] + b2[1] + b3
