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


class ResNet2Plus1D(nn.Module):
    layers: Sequence[int]
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
        block = BasicBlock2p1d
        if self.remat:
            block = nn.remat(block, static_argnums=(2,))

        x = x.astype(self.dtype)
        # (2+1)D stem: (1,7,7)/ (1,2,2) then (3,1,1) (reference :159-171)
        mid = _mid(3, 64, 3, 7)
        x = nn.Conv(mid, (1, 7, 7), (1, 2, 2),
                    [(0, 0), (3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem_s")(x)
        x = nn.relu(_BN(name="stem_bn_s")(x, train).astype(self.dtype))
        x = nn.Conv(64, (3, 1, 1), (1, 1, 1),
                    [(1, 1), (0, 0), (0, 0)], use_bias=False,
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
                need_ds = stride != 1 or in_ch != planes
                x = block(planes, stride, need_ds, self.dtype,
                          name=f"layer{stage}_{b}")(x, block_train)
                in_ch = planes

        feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        if self.num_classes is None:
            return feat
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=self.param_dtype, name="fc")(feat)

    @property
    def feature_dim(self) -> int:
        return 512


def _variant(layers):
    def ctor(**kwargs):
        return ResNet2Plus1D(layers=tuple(layers), **kwargs)
    return ctor


resnet2p1d_10 = _variant((1, 1, 1, 1))
resnet2p1d_18 = _variant((2, 2, 2, 2))
resnet2p1d_34 = _variant((3, 4, 6, 3))
