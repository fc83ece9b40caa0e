"""3D ResNet (R3D) family — resnet10/18/34/50/101/152/200.

Counterpart of the reference's lib/modeling/backbone/backbone_3d/resnet.py
(:109-257): conv1 7×7×7 stride (1,2,2), maxpool 3³/2, four stages with
stride-2 spatio-temporal downsampling, global average pool.  Channels-last
(B, T, H, W, C), bf16 compute.  The graph augmentation can be inserted on
the inputs of stages layer2/3/4 — the reference's default resnet aug points
(lib/modeling/visual_wrappers.py:119-120) — via ``aug_points=(2, 3, 4)``
(stage number, 1-based to mirror layerN names).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.temporal_graph import TemporalGraphAug
from .layers import max_pool_3d

Dtype = Any


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=jnp.float32,
            name="bn",
        )(x)


class BasicBlock3d(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    expansion: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        residual = x
        s = (self.stride,) * 3
        out = conv(self.planes, (3, 3, 3), s, [(1, 1)] * 3, name="conv1")(x)
        out = _BN(name="bn1")(out, train).astype(self.dtype)
        out = nn.relu(out)
        out = conv(self.planes, (3, 3, 3), (1, 1, 1), [(1, 1)] * 3, name="conv2")(out)
        out = _BN(name="bn2")(out, train).astype(self.dtype)
        if self.downsample:
            residual = conv(self.planes, (1, 1, 1), s, "VALID", name="ds_conv")(x)
            residual = _BN(name="ds_bn")(residual, train).astype(self.dtype)
        return nn.relu(out + residual)


class Bottleneck3d(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        residual = x
        s = (self.stride,) * 3
        out = conv(self.planes, (1, 1, 1), (1, 1, 1), "VALID", name="conv1")(x)
        out = nn.relu(_BN(name="bn1")(out, train).astype(self.dtype))
        out = conv(self.planes, (3, 3, 3), s, [(1, 1)] * 3, name="conv2")(out)
        out = nn.relu(_BN(name="bn2")(out, train).astype(self.dtype))
        out = conv(self.planes * 4, (1, 1, 1), (1, 1, 1), "VALID", name="conv3")(out)
        out = _BN(name="bn3")(out, train).astype(self.dtype)
        if self.downsample:
            residual = conv(self.planes * 4, (1, 1, 1), s, "VALID", name="ds_conv")(x)
            residual = _BN(name="ds_bn")(residual, train).astype(self.dtype)
        return nn.relu(out + residual)


class FactorizedBasicBlock3d(nn.Module):
    """Factorized basic block (reference resnet_i3d.py:56-97): each 3×3×3
    conv becomes a spatial (1,3,3) + temporal (3,1,1) pair, stride split as
    (1,s,s)·(s,1,1) so the combined stride matches the downsample's
    (s,s,s).  No ReLU between the last pair and the residual add, matching
    the reference (bn2_2 output feeds the add directly)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    expansion: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        residual = x
        s = self.stride

        def pair(h, name, sp_stride, t_stride, relu_last):
            h = conv(self.planes, (1, 3, 3), (1, sp_stride, sp_stride),
                     [(0, 0), (1, 1), (1, 1)], name=f"{name}_s")(h)
            h = nn.relu(_BN(name=f"{name}_s_bn")(h, train).astype(self.dtype))
            h = conv(self.planes, (3, 1, 1), (t_stride, 1, 1),
                     [(1, 1), (0, 0), (0, 0)], name=f"{name}_t")(h)
            h = _BN(name=f"{name}_t_bn")(h, train).astype(self.dtype)
            return nn.relu(h) if relu_last else h

        out = pair(x, "conv1", s, s, relu_last=True)
        out = pair(out, "conv2", 1, 1, relu_last=False)
        if self.downsample:
            residual = conv(self.planes, (1, 1, 1), (s,) * 3, "VALID",
                            name="ds_conv")(x)
            residual = _BN(name="ds_bn")(residual, train).astype(self.dtype)
        return nn.relu(out + residual)


class FactorizedBottleneck3d(nn.Module):
    """Factorized bottleneck (reference resnet_i3d.py:99-138): the middle
    3×3×3 conv becomes BasicSTConv3d — spatial (1,3,3) stride (1,s,s) +
    BN+ReLU, temporal (3,1,1) stride (s,1,1) + BN+ReLU."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        residual = x
        s = self.stride
        out = conv(self.planes, (1, 1, 1), (1, 1, 1), "VALID", name="conv1")(x)
        out = nn.relu(_BN(name="bn1")(out, train).astype(self.dtype))
        out = conv(self.planes, (1, 3, 3), (1, s, s),
                   [(0, 0), (1, 1), (1, 1)], name="conv2_s")(out)
        out = nn.relu(_BN(name="bn2_s")(out, train).astype(self.dtype))
        out = conv(self.planes, (3, 1, 1), (s, 1, 1),
                   [(1, 1), (0, 0), (0, 0)], name="conv2_t")(out)
        out = nn.relu(_BN(name="bn2_t")(out, train).astype(self.dtype))
        out = conv(self.planes * 4, (1, 1, 1), (1, 1, 1), "VALID", name="conv3")(out)
        out = _BN(name="bn3")(out, train).astype(self.dtype)
        if self.downsample:
            residual = conv(self.planes * 4, (1, 1, 1), (s,) * 3, "VALID",
                            name="ds_conv")(x)
            residual = _BN(name="ds_bn")(residual, train).astype(self.dtype)
        return nn.relu(out + residual)


_BLOCKS = {
    "basic": BasicBlock3d,
    "bottleneck": Bottleneck3d,
    "fbasic": FactorizedBasicBlock3d,
    "fbottleneck": FactorizedBottleneck3d,
}


class ResNet3D(nn.Module):
    """Generic R3D backbone; encoder mode when ``num_classes is None``.

    ``block`` 'fbasic'/'fbottleneck' gives the factorized (R(1+3)D-style)
    resnet_i3d family (reference resnet_i3d.py:141-249)."""

    block: str  # 'basic' | 'bottleneck' | 'fbasic' | 'fbottleneck'
    layers: Sequence[int]
    num_classes: Optional[int] = None
    aug_points: Tuple[int, ...] = ()      # stage numbers in {1,2,3,4}
    graph_cfg: Optional[Dict[str, Any]] = None
    remat: bool = False
    # Partial-BN: after the first conv/BN, blocks' BNs run on running stats
    # during training (train only gates BN in these blocks, so passing
    # train=False to them is exactly the reference's partial-BN semantics,
    # model_wrappers.py:130-146).
    partial_bn: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        block_cls = _BLOCKS[self.block]
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        expansion = 1 if self.block in ("basic", "fbasic") else 4
        gcfg = dict(self.graph_cfg or {})

        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7, 7), (1, 2, 2), [(3, 3)] * 3, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv1")(x)
        x = _BN(name="bn1")(x, train).astype(self.dtype)
        x = nn.relu(x)
        x = max_pool_3d(x, 3, 2, 1)

        block_train = train and not self.partial_bn
        in_ch = 64
        for stage, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers), start=1
        ):
            if stage in self.aug_points:
                x = TemporalGraphAug(
                    name=f"graph_aug_{stage}",
                    dtype=self.dtype, param_dtype=self.param_dtype, **gcfg,
                )(x, train=train)
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 1) else 1
                need_ds = stride != 1 or in_ch != planes * expansion
                x = block_cls(
                    planes, stride, need_ds, dtype=self.dtype,
                    name=f"layer{stage}_{b}",
                )(x, block_train)
                in_ch = planes * expansion

        feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        if self.num_classes is None:
            return feat
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=self.param_dtype, name="fc")(feat)

    @property
    def feature_dim(self) -> int:
        return 512 * (1 if self.block in ("basic", "fbasic") else 4)


def _variant(block: str, layers: Sequence[int]):
    def ctor(**kwargs):
        return ResNet3D(block=block, layers=tuple(layers), **kwargs)
    return ctor


resnet3d_10 = _variant("basic", (1, 1, 1, 1))
resnet3d_18 = _variant("basic", (2, 2, 2, 2))
resnet3d_34 = _variant("basic", (3, 4, 6, 3))
resnet3d_50 = _variant("bottleneck", (3, 4, 6, 3))
resnet3d_101 = _variant("bottleneck", (3, 4, 23, 3))
resnet3d_152 = _variant("bottleneck", (3, 8, 36, 3))
resnet3d_200 = _variant("bottleneck", (3, 24, 36, 3))

# Factorized resnet_i3d family (reference resnet_i3d.py:203-249).  The
# reference stem differs from resnet.py only in intent, not shape (conv1
# 7^3 stride (1,2,2), maxpool 3^3/2), so the generic ResNet3D stem is
# shared; only the blocks are factorized.
resnet_i3d_10 = _variant("fbasic", (1, 1, 1, 1))
resnet_i3d_18 = _variant("fbasic", (2, 2, 2, 2))
resnet_i3d_34 = _variant("fbasic", (3, 4, 6, 3))
resnet_i3d_50 = _variant("fbottleneck", (3, 4, 6, 3))
resnet_i3d_101 = _variant("fbottleneck", (3, 4, 23, 3))
resnet_i3d_152 = _variant("fbottleneck", (3, 8, 36, 3))
resnet_i3d_200 = _variant("fbottleneck", (3, 24, 36, 3))
