"""BN-Inception (Inception-v2) 2D backbone — the TSN workhorse.

Counterpart of lib/modeling/backbone/backbone_2d/bninception.py:22-266.
Spec-driven: one parameterized block for the regular (4-branch, double-3x3)
and reduction (stride-2, 3-branch) inception modules, channels-last,
bf16.  Feature dim 1024; encoder mode when ``num_classes is None``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

BNINCEPTION_FEATURE_DIM = 1024

# (type, spec): 'i' = Inception(ch1x1, 3x3red, 3x3, dbl_red, dbl_mid,
# dbl_bot, pool_proj, pool_kind), 'r' = reduction(3x3red, 3x3, dbl_red,
# dbl_mid, dbl_bot).  Channel plan: bninception.py:35-49.
_PLAN: Sequence[Tuple[str, tuple]] = (
    ("i", (64, 64, 64, 64, 96, 96, 32, "avg")),       # 3a (in 192)
    ("i", (64, 64, 96, 64, 96, 96, 64, "avg")),       # 3b (in 256)
    ("r", (128, 160, 64, 96, 96)),                     # 3c (in 320)
    ("i", (224, 64, 96, 96, 128, 128, 128, "avg")),   # 4a (in 576)
    ("i", (192, 96, 128, 96, 128, 128, 128, "avg")),  # 4b
    ("i", (160, 128, 160, 128, 160, 160, 128, "avg")),# 4c
    ("i", (96, 128, 192, 160, 192, 192, 128, "avg")), # 4d (in 608)
    ("r", (128, 192, 192, 256, 256)),                  # 4e (in 608)
    ("i", (352, 192, 320, 160, 224, 224, 128, "avg")),# 5a (in 1056)
    ("i", (352, 192, 320, 192, 224, 224, 128, "max")),# 5b (in 1024, last)
)
_NAMES = ("inception3a", "inception3b", "inception3c", "inception4a",
          "inception4b", "inception4c", "inception4d", "inception4e",
          "inception5a", "inception5b")


class BasicConv2d(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, bn_frozen: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    (self.stride, self.stride),
                    [(self.padding, self.padding)] * 2, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        # bn_frozen: partial-BN — running stats even in training (reference
        # VideoModelWrapper.train() override, model_wrappers.py:130-146).
        x = nn.BatchNorm(use_running_average=(not train) or bn_frozen,
                         momentum=0.9,
                         epsilon=1e-3, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x.astype(self.dtype))


class InceptionBN(nn.Module):
    spec: tuple
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, bn_frozen: bool = False):
        c1, c3r, c3, cdr, cdm, cdb, cp, pool_kind = self.spec
        kw = dict(dtype=self.dtype)
        bf = bn_frozen
        b1 = BasicConv2d(c1, 1, name="branch1", **kw)(x, train, bf)
        b2 = BasicConv2d(c3r, 1, name="branch2_reduce", **kw)(x, train, bf)
        b2 = BasicConv2d(c3, 3, padding=1, name="branch2", **kw)(b2, train, bf)
        b3 = BasicConv2d(cdr, 1, name="branch3_reduce", **kw)(x, train, bf)
        b3 = BasicConv2d(cdm, 3, padding=1, name="branch3_mid", **kw)(b3, train, bf)
        b3 = BasicConv2d(cdb, 3, padding=1, name="branch3", **kw)(b3, train, bf)
        pool = nn.max_pool if pool_kind == "max" else nn.avg_pool
        b4 = pool(x, (3, 3), (1, 1), [(1, 1), (1, 1)])
        b4 = BasicConv2d(cp, 1, name="branch4", **kw)(b4, train, bf)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionBNReduce(nn.Module):
    spec: tuple
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, bn_frozen: bool = False):
        c3r, c3, cdr, cdm, cdb = self.spec
        kw = dict(dtype=self.dtype)
        bf = bn_frozen
        b1 = BasicConv2d(c3r, 1, name="branch1_reduce", **kw)(x, train, bf)
        b1 = BasicConv2d(c3, 3, 2, 1, name="branch1", **kw)(b1, train, bf)
        b2 = BasicConv2d(cdr, 1, name="branch2_reduce", **kw)(x, train, bf)
        b2 = BasicConv2d(cdm, 3, padding=1, name="branch2_mid", **kw)(b2, train, bf)
        b2 = BasicConv2d(cdb, 3, 2, 1, name="branch2", **kw)(b2, train, bf)
        b3 = nn.max_pool(x, (3, 3), (2, 2), [(0, 1), (0, 1)])  # ceil_mode
        return jnp.concatenate([b1, b2, b3], axis=-1)


class BNInception(nn.Module):
    num_classes: Optional[int] = None
    # Partial-BN (reference model_wrappers.py:130-146): when training
    # downstream, every BN after the first conv stage runs on its running
    # statistics (affine params still receive gradients).
    partial_bn: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype)
        bf = self.partial_bn and train
        x = x.astype(self.dtype)
        x = BasicConv2d(64, 7, 2, 3, name="conv1", **kw)(x, train, False)
        x = nn.max_pool(x, (3, 3), (2, 2), [(0, 1), (0, 1)])
        x = BasicConv2d(64, 1, name="conv2", **kw)(x, train, bf)
        x = BasicConv2d(192, 3, padding=1, name="conv3", **kw)(x, train, bf)
        x = nn.max_pool(x, (3, 3), (2, 2), [(0, 1), (0, 1)])
        for name, (kind, spec) in zip(_NAMES, _PLAN):
            cls = InceptionBN if kind == "i" else InceptionBNReduce
            x = cls(spec, name=name, **kw)(x, train, bf)
        feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if self.num_classes is None:
            return feat
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=self.param_dtype, name="fc")(feat)

    @property
    def feature_dim(self) -> int:
        return BNINCEPTION_FEATURE_DIM


def bninception(**kwargs):
    kwargs.pop("aug_points", None)
    kwargs.pop("graph_cfg", None)
    kwargs.pop("remat", None)
    return BNInception(**kwargs)
