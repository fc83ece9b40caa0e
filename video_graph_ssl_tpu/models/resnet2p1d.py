"""R(2+1)D — ResNets with (1,3,3)+(3,1,1) factorized convolutions.

Counterpart of lib/modeling/backbone/backbone_3d/resnet2p1d.py:139-285.
Mid-channel widths follow the paper's parameter-matching rule the reference
uses (:45-57): mid = (Cin*Cout*3*3*3) // (Cin*3*3 + 3*Cout), so each
(2+1)D pair has ~the parameter count of the full 3D conv it replaces.
Channels-last, bf16; encoder mode when ``num_classes is None``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.temporal_graph import TemporalGraphAug
from .layers import max_pool_3d

Dtype = Any


def _mid(cin: int, cout: int, kt: int = 3, ks: int = 3) -> int:
    return (cin * cout * kt * ks * ks) // (cin * ks * ks + kt * cout)


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=jnp.float32,
                            param_dtype=jnp.float32, name="bn")(x)


class Conv2Plus1D(nn.Module):
    """(1,3,3) spatial -> BN -> ReLU -> (3,1,1) temporal
    (reference: conv1x3x3/conv3x1x1 + interleaved BN, resnet2p1d.py:13-57)."""

    features: int
    mid: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        s = self.stride
        x = conv(self.mid, (1, 3, 3), (1, s, s),
                 [(0, 0), (1, 1), (1, 1)], name="spatial")(x)
        x = nn.relu(_BN(name="bn_s")(x, train).astype(self.dtype))
        x = conv(self.features, (3, 1, 1), (s, 1, 1),
                 [(1, 1), (0, 0), (0, 0)], name="temporal")(x)
        return x


class BasicBlock2p1d(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        residual = x
        out = Conv2Plus1D(self.planes, _mid(cin, self.planes), self.stride,
                          self.dtype, name="conv1")(x, train)
        out = nn.relu(_BN(name="bn1")(out, train).astype(self.dtype))
        out = Conv2Plus1D(self.planes, _mid(self.planes, self.planes), 1,
                          self.dtype, name="conv2")(out, train)
        out = _BN(name="bn2")(out, train).astype(self.dtype)
        if self.downsample:
            s = (self.stride,) * 3
            residual = nn.Conv(self.planes, (1, 1, 1), s, "VALID",
                               use_bias=False, dtype=self.dtype,
                               param_dtype=jnp.float32, name="ds_conv")(x)
            residual = _BN(name="ds_bn")(residual, train).astype(self.dtype)
        return nn.relu(out + residual)


class Bottleneck2p1d(nn.Module):
    """1x1x1 -> (2+1)D pair -> 1x1x1 (x4), reference Bottleneck
    (resnet2p1d.py:90-137; mid = 27*planes // 12)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv1x1 = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                          param_dtype=jnp.float32, kernel_size=(1, 1, 1),
                          padding="VALID")
        residual = x
        out = conv1x1(self.planes, name="conv1")(x)
        out = nn.relu(_BN(name="bn1")(out, train).astype(self.dtype))
        out = Conv2Plus1D(self.planes, _mid(self.planes, self.planes),
                          self.stride, self.dtype, name="conv2")(out, train)
        out = nn.relu(_BN(name="bn2")(out, train).astype(self.dtype))
        out = conv1x1(self.planes * 4, name="conv3")(out)
        out = _BN(name="bn3")(out, train).astype(self.dtype)
        if self.downsample:
            s = (self.stride,) * 3
            residual = conv1x1(self.planes * 4, strides=s,
                               name="ds_conv")(x)
            residual = _BN(name="ds_bn")(residual, train).astype(self.dtype)
        return nn.relu(out + residual)


class ResNet2Plus1D(nn.Module):
    layers: Sequence[int]
    block_type: str = "basic"    # basic (10/18/34) | bottleneck (50+)
    num_classes: Optional[int] = None
    aug_points: Tuple[int, ...] = ()
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
    def __call__(self, x, train: bool = False):
        gcfg = dict(self.graph_cfg or {})
        block = (BasicBlock2p1d if self.block_type == "basic"
                 else Bottleneck2p1d)
        exp = 1 if self.block_type == "basic" else 4
        if self.remat:
            block = nn.remat(block, static_argnums=(2,))

        x = x.astype(self.dtype)
        # (2+1)D stem: (1,7,7)/(1,2,2) then (7,1,1)/(1,1,1) — the
        # reference's conv1_t_size default is 7, and its stem mid-width
        # parameter-matches the full 3x7x7 3D conv accordingly
        # (mid = 110, reference :159-175).
        mid = _mid(3, 64, 7, 7)
        x = nn.Conv(mid, (1, 7, 7), (1, 2, 2),
                    [(0, 0), (3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem_s")(x)
        x = nn.relu(_BN(name="stem_bn_s")(x, train).astype(self.dtype))
        x = nn.Conv(64, (7, 1, 1), (1, 1, 1),
                    [(3, 3), (0, 0), (0, 0)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem_t")(x)
        x = nn.relu(_BN(name="stem_bn_t")(x, train).astype(self.dtype))
        x = max_pool_3d(x, 3, 2, 1)

        block_train = train and not self.partial_bn
        in_ch = 64
        for stage, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), self.layers), start=1
        ):
            if stage in self.aug_points:
                x = TemporalGraphAug(name=f"graph_aug_{stage}",
                                     dtype=self.dtype,
                                     param_dtype=self.param_dtype,
                                     **gcfg)(x, train=train)
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 1) else 1
                need_ds = stride != 1 or in_ch != planes * exp
                x = block(planes, stride, need_ds, self.dtype,
                          name=f"layer{stage}_{b}")(x, block_train)
                in_ch = planes * exp

        feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        if self.num_classes is None:
            return feat
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=self.param_dtype, name="fc")(feat)

    @property
    def feature_dim(self) -> int:
        return 512 * (1 if self.block_type == "basic" else 4)


def _variant(layers, block_type="basic"):
    def ctor(**kwargs):
        return ResNet2Plus1D(layers=tuple(layers), block_type=block_type,
                             **kwargs)
    return ctor


resnet2p1d_10 = _variant((1, 1, 1, 1))
resnet2p1d_18 = _variant((2, 2, 2, 2))
resnet2p1d_34 = _variant((3, 4, 6, 3))
resnet2p1d_50 = _variant((3, 4, 6, 3), "bottleneck")
resnet2p1d_101 = _variant((3, 4, 23, 3), "bottleneck")
resnet2p1d_152 = _variant((3, 8, 36, 3), "bottleneck")
resnet2p1d_200 = _variant((3, 24, 36, 3), "bottleneck")
