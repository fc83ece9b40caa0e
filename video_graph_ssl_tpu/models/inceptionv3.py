"""Inception-v3 2D backbone.

Counterpart of lib/modeling/backbone/backbone_2d/inceptionv3.py:51-352
(torchvision-style Inception-v3: A/B/C/D/E block families, 299x299 native
input, feature dim 2048).  Channels-last, bf16; encoder mode when
``num_classes is None``; aux head omitted (unused by the wrappers).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

INCEPTIONV3_FEATURE_DIM = 2048


class ConvBNRelu(nn.Module):
    features: int
    kernel: Tuple[int, int] = (1, 1)
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, bn_frozen: bool = False):
        x = nn.Conv(self.features, self.kernel, (self.stride, self.stride),
                    [(self.padding[0],) * 2, (self.padding[1],) * 2],
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        # bn_frozen: partial-BN — running stats even in training (reference
        # VideoModelWrapper.train() override, model_wrappers.py:130-146).
        x = nn.BatchNorm(use_running_average=(not train) or bn_frozen,
                         momentum=0.9,
                         epsilon=1e-3, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x.astype(self.dtype))


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, bn_frozen: bool = False):
        kw = dict(dtype=self.dtype)
        b1 = ConvBNRelu(64, name="b1x1", **kw)(x, train, bn_frozen)
        b5 = ConvBNRelu(48, name="b5_1", **kw)(x, train, bn_frozen)
        b5 = ConvBNRelu(64, (5, 5), padding=(2, 2), name="b5_2", **kw)(b5, train, bn_frozen)
        b3 = ConvBNRelu(64, name="b3_1", **kw)(x, train, bn_frozen)
        b3 = ConvBNRelu(96, (3, 3), padding=(1, 1), name="b3_2", **kw)(b3, train, bn_frozen)
        b3 = ConvBNRelu(96, (3, 3), padding=(1, 1), name="b3_3", **kw)(b3, train, bn_frozen)
        bp = nn.avg_pool(x, (3, 3), (1, 1), [(1, 1), (1, 1)])
        bp = ConvBNRelu(self.pool_features, name="bpool", **kw)(bp, train, bn_frozen)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, bn_frozen: bool = False):
        kw = dict(dtype=self.dtype)
        b3 = ConvBNRelu(384, (3, 3), 2, name="b3", **kw)(x, train, bn_frozen)
        bd = ConvBNRelu(64, name="bd_1", **kw)(x, train, bn_frozen)
        bd = ConvBNRelu(96, (3, 3), padding=(1, 1), name="bd_2", **kw)(bd, train, bn_frozen)
        bd = ConvBNRelu(96, (3, 3), 2, name="bd_3", **kw)(bd, train, bn_frozen)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, bn_frozen: bool = False):
        kw = dict(dtype=self.dtype)
        c7 = self.c7
        # NB kernel orientations follow the REFERENCE file, which swaps
        # the torchvision ones: branch7x7 runs (7,1) THEN (1,7), and the
        # dbl branch alternates starting with (1,7)
        # (inceptionv3.py:213-222).
        b1 = ConvBNRelu(192, name="b1x1", **kw)(x, train, bn_frozen)
        b7 = ConvBNRelu(c7, name="b7_1", **kw)(x, train, bn_frozen)
        b7 = ConvBNRelu(c7, (7, 1), padding=(3, 0), name="b7_2", **kw)(b7, train, bn_frozen)
        b7 = ConvBNRelu(192, (1, 7), padding=(0, 3), name="b7_3", **kw)(b7, train, bn_frozen)
        bd = ConvBNRelu(c7, name="bd_1", **kw)(x, train, bn_frozen)
        bd = ConvBNRelu(c7, (1, 7), padding=(0, 3), name="bd_2", **kw)(bd, train, bn_frozen)
        bd = ConvBNRelu(c7, (7, 1), padding=(3, 0), name="bd_3", **kw)(bd, train, bn_frozen)
        bd = ConvBNRelu(c7, (1, 7), padding=(0, 3), name="bd_4", **kw)(bd, train, bn_frozen)
        bd = ConvBNRelu(192, (7, 1), padding=(3, 0), name="bd_5", **kw)(bd, train, bn_frozen)
        bp = nn.avg_pool(x, (3, 3), (1, 1), [(1, 1), (1, 1)])
        bp = ConvBNRelu(192, name="bpool", **kw)(bp, train, bn_frozen)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, bn_frozen: bool = False):
        kw = dict(dtype=self.dtype)
        b3 = ConvBNRelu(192, name="b3_1", **kw)(x, train, bn_frozen)
        b3 = ConvBNRelu(320, (3, 3), 2, name="b3_2", **kw)(b3, train, bn_frozen)
        b7 = ConvBNRelu(192, name="b7_1", **kw)(x, train, bn_frozen)
        # reference orientation: (7,1) then (1,7) (inceptionv3.py:252-254)
        b7 = ConvBNRelu(192, (7, 1), padding=(3, 0), name="b7_2", **kw)(b7, train, bn_frozen)
        b7 = ConvBNRelu(192, (1, 7), padding=(0, 3), name="b7_3", **kw)(b7, train, bn_frozen)
        b7 = ConvBNRelu(192, (3, 3), 2, name="b7_4", **kw)(b7, train, bn_frozen)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False, bn_frozen: bool = False):
        kw = dict(dtype=self.dtype)
        b1 = ConvBNRelu(320, name="b1x1", **kw)(x, train, bn_frozen)
        b3 = ConvBNRelu(384, name="b3_1", **kw)(x, train, bn_frozen)
        # reference orientation: 2a=(3,1), 2b=(1,3) (inceptionv3.py:283-284)
        b3a = ConvBNRelu(384, (3, 1), padding=(1, 0), name="b3_2a", **kw)(b3, train, bn_frozen)
        b3b = ConvBNRelu(384, (1, 3), padding=(0, 1), name="b3_2b", **kw)(b3, train, bn_frozen)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBNRelu(448, name="bd_1", **kw)(x, train, bn_frozen)
        bd = ConvBNRelu(384, (3, 3), padding=(1, 1), name="bd_2", **kw)(bd, train, bn_frozen)
        bda = ConvBNRelu(384, (3, 1), padding=(1, 0), name="bd_3a", **kw)(bd, train, bn_frozen)
        bdb = ConvBNRelu(384, (1, 3), padding=(0, 1), name="bd_3b", **kw)(bd, train, bn_frozen)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = nn.avg_pool(x, (3, 3), (1, 1), [(1, 1), (1, 1)])
        bp = ConvBNRelu(192, name="bpool", **kw)(bp, train, bn_frozen)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
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
        x = ConvBNRelu(32, (3, 3), 2, name="conv1a", **kw)(x, train, False)
        x = ConvBNRelu(32, (3, 3), name="conv2a", **kw)(x, train, bf)
        x = ConvBNRelu(64, (3, 3), padding=(1, 1), name="conv2b", **kw)(x, train, bf)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = ConvBNRelu(80, name="conv3b", **kw)(x, train, bf)
        x = ConvBNRelu(192, (3, 3), name="conv4a", **kw)(x, train, bf)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = InceptionA(32, name="mixed_5b", **kw)(x, train, bf)
        x = InceptionA(64, name="mixed_5c", **kw)(x, train, bf)
        x = InceptionA(64, name="mixed_5d", **kw)(x, train, bf)
        x = InceptionB(name="mixed_6a", **kw)(x, train, bf)
        for i, c7 in enumerate((128, 160, 160, 192)):
            x = InceptionC(c7, name=f"mixed_6{'bcde'[i]}", **kw)(x, train, bf)
        x = InceptionD(name="mixed_7a", **kw)(x, train, bf)
        x = InceptionE(name="mixed_7b", **kw)(x, train, bf)
        x = InceptionE(name="mixed_7c", **kw)(x, train, bf)
        feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if self.num_classes is None:
            return feat
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=self.param_dtype, name="fc")(feat)

    @property
    def feature_dim(self) -> int:
        return INCEPTIONV3_FEATURE_DIM


def inception_v3(**kwargs):
    kwargs.pop("aug_points", None)
    kwargs.pop("graph_cfg", None)
    kwargs.pop("remat", None)
    return InceptionV3(**kwargs)
