"""Batch norm with single-pass reductions and a hand-written VJP.

Why this exists (profiled on the fused MoCo step, perf/profile_step.py
round 3): flax's ``nn.BatchNorm`` + separate ReLU lowers to FOUR
bandwidth-bound passes per layer around every convolution —
``convert_reduce`` (sum x), ``multiply_reduce`` (sum x*x) in the forward,
and in the backward a ``broadcast_select`` ReLU mask pass plus two more
reduction fusions (sum dy, sum dy*xhat).  Across S3D's ~60 BN layers that
is ~22 ms/step of reductions + 6.6 ms of selects — more than the
convolutions themselves.  XLA does not merge the two reduction passes (they
are separate HLO reduces), so we force the merge:

* forward: ONE variadic ``lax.reduce`` computes (sum x, sum x^2) reading
  the activation once; identical math to flax's fast-variance path
  (mean / E[x^2] - mean^2, float32 accumulation).
* backward: ONE variadic reduce computes (sum dm, sum dm*xhat) where
  ``dm = dy * (y > 0)`` folds the ReLU mask into the same read of dy;
  then the standard one-formula BN gradient
      dx = inv * gamma * (dm - mean(dm) - xhat * mean(dm * xhat))
  (the full gradient including the through-statistics paths).

Module interface mirrors the ``nn.BatchNorm`` subset used by ConvBN
(collection/param names ``batch_stats``/{mean,var}, params {scale,bias}),
so checkpoints and torch interop are unchanged.

Reference counterpart: the BN epilogues cuDNN fuses for the PyTorch
reference (lib/modeling/backbone/backbone_3d/s3d_1.py:37-69's
BasicConv3d/SepConv3d BN+ReLU pairs).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _moments(x: jnp.ndarray):
    """(mean, var) over all axes but the last.

    Two plain reduces (like flax): a variadic ``lax.reduce`` of the
    (x, x*x) pair was measured SLOWER end-to-end (bench 1338 -> 1205
    clips/s) — TPU's optimized row-reduce emitter only handles
    single-operand reduces, so forcing the pair into one HLO deoptimizes
    both.
    """
    n = x.size // x.shape[-1]
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    s1 = jnp.sum(xf, axes)
    s2 = jnp.sum(xf * xf, axes)
    mean = s1 / n
    return mean, s2 / n - mean * mean


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_relu_train(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                  eps: float, relu: bool):
    """Training-mode BN (+ optional fused ReLU) on (..., C).

    Returns (y, mean, var) — mean/var are the batch statistics (fp32) the
    caller feeds into the running-stat EMA.
    """
    y, mean, var, _ = _bn_fwd_impl(x, scale, bias, eps, relu)
    return y, mean, var


def _bn_fwd_impl(x, scale, bias, eps, relu):
    mean, var = _moments(x)
    inv = jax.lax.rsqrt(var + eps)
    a = (inv * scale.astype(jnp.float32)).astype(x.dtype)
    b = (bias.astype(jnp.float32)
         - mean * inv * scale.astype(jnp.float32)).astype(x.dtype)
    y = x * a + b
    if relu:
        y = jnp.maximum(y, jnp.zeros((), x.dtype))
    return y, mean, var, inv


def _bn_fwd(x, scale, bias, eps, relu):
    y, mean, var, inv = _bn_fwd_impl(x, scale, bias, eps, relu)
    return (y, mean, var), (x, y, scale, mean, inv)


def _bn_bwd(eps, relu, res, cts):
    dy, _, _ = cts          # no gradient flows into the emitted stats
    x, y, scale, mean, inv = res
    n = x.size // x.shape[-1]
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    if relu:
        dyf = jnp.where(y > 0, dyf, 0.0)
    xhat = (xf - mean) * inv
    axes = tuple(range(x.ndim - 1))
    s_dm = jnp.sum(dyf, axes)
    s_dmx = jnp.sum(dyf * xhat, axes)
    g = scale.astype(jnp.float32) * inv
    dx = (g * (dyf - s_dm / n - xhat * (s_dmx / n))).astype(x.dtype)
    return dx, s_dmx.astype(scale.dtype), s_dm.astype(scale.dtype)


bn_relu_train.defvjp(_bn_fwd, _bn_bwd)


class FusedBatchNorm(nn.Module):
    """Drop-in for the ``nn.BatchNorm`` (+ optional ReLU) pair in ConvBN.

    Same variable layout as ``nn.BatchNorm``: params ``scale``/``bias``,
    batch_stats ``mean``/``var``.  Training mode uses the single-pass
    custom-VJP kernel above; eval / frozen-BN mode is the plain affine
    transform on running statistics (elementwise — XLA fuses it into the
    producing convolution, and autodiff handles scale/bias grads).
    """

    use_running_average: bool = False
    momentum: float = 0.999
    epsilon: float = 1e-3
    relu: bool = False
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(),
                           (features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (features,), self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (features,))

        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        if self.use_running_average:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            a = (inv * scale.astype(jnp.float32)).astype(dtype)
            b = (bias.astype(jnp.float32)
                 - ra_mean.value * inv
                 * scale.astype(jnp.float32)).astype(dtype)
            y = x * a + b
            if self.relu:
                y = jnp.maximum(y, jnp.zeros((), dtype))
            return y

        y, mean, var = bn_relu_train(x, scale, bias, float(self.epsilon),
                                     self.relu)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return y
