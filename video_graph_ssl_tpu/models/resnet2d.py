"""2D ResNet family for the frame-aggregation (BACKBONE_TYPE='2D') path.

Counterpart of the reference's torchvision-style 2D backbones
(lib/modeling/backbone/backbone_2d/resnet.py:114-296).  Channels-last
(B, H, W, C), bf16 compute; encoder mode when ``num_classes is None``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=jnp.float32, name="bn")(x)


class BasicBlock2d(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        residual = x
        s = (self.stride, self.stride)
        out = conv(self.planes, (3, 3), s, [(1, 1)] * 2, name="conv1")(x)
        out = nn.relu(_BN(name="bn1")(out, train).astype(self.dtype))
        out = conv(self.planes, (3, 3), (1, 1), [(1, 1)] * 2, name="conv2")(out)
        out = _BN(name="bn2")(out, train).astype(self.dtype)
        if self.downsample:
            residual = conv(self.planes, (1, 1), s, "VALID", name="ds_conv")(x)
            residual = _BN(name="ds_bn")(residual, train).astype(self.dtype)
        return nn.relu(out + residual)


class Bottleneck2d(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        residual = x
        s = (self.stride, self.stride)
        out = conv(self.planes, (1, 1), (1, 1), "VALID", name="conv1")(x)
        out = nn.relu(_BN(name="bn1")(out, train).astype(self.dtype))
        out = conv(self.planes, (3, 3), s, [(1, 1)] * 2, name="conv2")(out)
        out = nn.relu(_BN(name="bn2")(out, train).astype(self.dtype))
        out = conv(self.planes * 4, (1, 1), (1, 1), "VALID", name="conv3")(out)
        out = _BN(name="bn3")(out, train).astype(self.dtype)
        if self.downsample:
            residual = conv(self.planes * 4, (1, 1), s, "VALID", name="ds_conv")(x)
            residual = _BN(name="ds_bn")(residual, train).astype(self.dtype)
        return nn.relu(out + residual)


class ResNet2D(nn.Module):
    block: str
    layers: Sequence[int]
    num_classes: Optional[int] = None
    partial_bn: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = BasicBlock2d if self.block == "basic" else Bottleneck2d
        expansion = 1 if self.block == "basic" else 4
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), (2, 2), [(3, 3)] * 2, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv1")(x)
        x = nn.relu(_BN(name="bn1")(x, train).astype(self.dtype))
        x = nn.max_pool(x, (3, 3), (2, 2), [(1, 1), (1, 1)])
        block_train = train and not self.partial_bn
        in_ch = 64
        for stage, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers), start=1
        ):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 1) else 1
                need_ds = stride != 1 or in_ch != planes * expansion
                x = block_cls(planes, stride, need_ds, dtype=self.dtype,
                              name=f"layer{stage}_{b}")(x, block_train)
                in_ch = planes * expansion
        feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        if self.num_classes is None:
            return feat
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=self.param_dtype, name="fc")(feat)

    @property
    def feature_dim(self) -> int:
        return 512 * (1 if self.block == "basic" else 4)


def _variant(block, layers):
    def ctor(**kwargs):
        kwargs.pop("aug_points", None)   # graph aug is a 3D-path feature
        kwargs.pop("graph_cfg", None)
        kwargs.pop("remat", None)
        return ResNet2D(block=block, layers=tuple(layers), **kwargs)
    return ctor


resnet18 = _variant("basic", (2, 2, 2, 2))
resnet34 = _variant("basic", (3, 4, 6, 3))
resnet50 = _variant("bottleneck", (3, 4, 6, 3))
resnet101 = _variant("bottleneck", (3, 4, 23, 3))
resnet152 = _variant("bottleneck", (3, 8, 36, 3))
