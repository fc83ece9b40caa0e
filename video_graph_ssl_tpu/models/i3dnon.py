"""I3D-ResNet with non-local blocks.

Counterpart of lib/modeling/backbone/backbone_3d/i3dnon.py:47-437: an
inflated bottleneck ResNet (conv1 (5,7,7)/2, temporal pool after layer1,
alternating (3,1,1)/(1,1,1) temporal kernels in the bottleneck stacks) with
embedded-Gaussian non-local blocks inserted on the odd blocks of layer3
(the reference's ``addnon`` pattern for blocks==4/23 stacks).

The non-local block is spacetime self-attention — θ/φ/g 1×1×1 projections
at half channels, softmax(θᵀφ) attention over all T·H·W positions, output
projection with BN initialized so the block starts as identity
(reference: _NonLocalBlockND, i3dnon.py:248-409).  On TPU it is three
batched matmuls on the MXU.

Two severe reference latent bugs are fixed to intended behavior here
(per the project convention for dead-but-informative reference code):

1. ``nonlocalnet`` constructs a FRESH ``NONLocalBlock3D`` — new random
   θ/φ/g weights — at every forward call (i3dnon.py:42,437-446); the
   non-local parameters are never registered, never trained, and never
   checkpointed.  Because the fresh block's output BN is zero-init, the
   reference's non-local insertion is mathematically an identity on
   every call.  Ours is a registered, trainable submodule (``nonlocal``).
2. ``_make_layer_inflat`` dispatches on ``blocks in (3, 4, 23)`` only
   (i3dnon.py:81-112); the resnet50 config's 6-block layer3 matches no
   branch, silently building ONE block instead of six.  Ours builds the
   full stack with the same kernel alternation.

Consequence: no torch converter is provided for this backbone — a
reference checkpoint contains neither the non-local weights (bug 1) nor
5 of layer3's 6 blocks (bug 2), so checkpoint-level fidelity against
the executed reference is undefined by construction.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import max_pool_3d

Dtype = Any


class _BN(nn.Module):
    zero_init: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, param_dtype=jnp.float32,
            scale_init=(nn.initializers.zeros if self.zero_init
                        else nn.initializers.ones),
            name="bn")(x)


class NonLocalBlock3D(nn.Module):
    """Embedded-Gaussian non-local block over (T, H, W) positions
    (reference: i3dnon.py:248-409 + NONLocalBlock3D :429-437).

    ``sub_sample`` pools φ/g spatially (1,2,2) like the reference, quartering
    the attention matrix width.
    """

    sub_sample: bool = True
    bn_layer: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        inter = max(c // 2, 1)
        dense = partial(nn.Dense, use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32)

        theta = dense(inter, name="theta")(x).reshape(b, t * h * w, inter)
        phi = dense(inter, name="phi")(x)
        g = dense(inter, name="g")(x)
        if self.sub_sample:
            phi = phi.reshape(b * t, h, w, inter)
            g = g.reshape(b * t, h, w, inter)
            phi = nn.max_pool(phi, (2, 2), (2, 2)).reshape(b, -1, inter)
            g = nn.max_pool(g, (2, 2), (2, 2)).reshape(b, -1, inter)
        else:
            phi = phi.reshape(b, t * h * w, inter)
            g = g.reshape(b, t * h * w, inter)

        attn = jnp.einsum("bnd,bmd->bnm", theta, phi,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        y = jnp.einsum("bnm,bmd->bnd", attn, g,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        y = y.reshape(b, t, h, w, inter)
        y = dense(c, name="w_out")(y)
        if self.bn_layer:
            # zero-init BN scale: the block starts as identity
            # (reference zero-inits the final BN weight, i3dnon.py:300-309)
            y = _BN(zero_init=True, name="w_bn")(y, train).astype(self.dtype)
        return x + y


class InflatedBottleneck(nn.Module):
    """Bottleneck with (k,1,1) temporal conv1, (1,3,3) spatial conv2
    (reference: Bottleneck, i3dnon.py:6-45)."""

    planes: int
    time_kernel: int = 3
    space_stride: int = 1
    downsample: bool = False
    add_nonlocal: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)
        tk = self.time_kernel
        residual = x
        out = conv(self.planes, (tk, 1, 1), (1, 1, 1),
                   [((tk - 1) // 2,) * 2, (0, 0), (0, 0)], name="conv1")(x)
        out = nn.relu(_BN(name="bn1")(out, train).astype(self.dtype))
        s = self.space_stride
        out = conv(self.planes, (1, 3, 3), (1, s, s),
                   [(0, 0), (1, 1), (1, 1)], name="conv2")(out)
        out = nn.relu(_BN(name="bn2")(out, train).astype(self.dtype))
        out = conv(self.planes * 4, (1, 1, 1), (1, 1, 1), "VALID",
                   name="conv3")(out)
        out = _BN(name="bn3")(out, train).astype(self.dtype)
        if self.downsample:
            residual = conv(self.planes * 4, (1, 1, 1), (1, s, s), "VALID",
                            name="ds_conv")(x)
            residual = _BN(name="ds_bn")(residual, train).astype(self.dtype)
        out = nn.relu(out + residual)
        if self.add_nonlocal:
            out = NonLocalBlock3D(dtype=self.dtype, name="nonlocal")(out, train)
        return out


class I3DResNetNonLocal(nn.Module):
    """I3D-ResNet-50-style backbone with non-local blocks
    (reference: I3DResNet + i3d_res50_nonlocal, i3dnon.py:47-141,439-447)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    num_classes: Optional[int] = None
    aug_points: Tuple[int, ...] = ()
    graph_cfg: Optional[Dict[str, Any]] = None
    remat: bool = False
    partial_bn: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops.temporal_graph import TemporalGraphAug

        gcfg = dict(self.graph_cfg or {})
        x = x.astype(self.dtype)
        x = nn.Conv(64, (5, 7, 7), (2, 2, 2),
                    [(2, 2), (3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = nn.relu(_BN(name="bn1")(x, train).astype(self.dtype))
        x = max_pool_3d(x, 3, 2, 1)

        bt = train and not self.partial_bn
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
                need_ds = stride != 1 or in_ch != planes * 4
                # reference temporal-kernel alternation + non-local insertion
                # on odd blocks of the 4-/23-block stacks (i3dnon.py:90-112)
                time_kernel = 3 if (b == 0 or b % 2 == 1) else 1
                addnon = (n_blocks in (4, 23)) and (b > 0) and (b % 2 == 1)
                x = InflatedBottleneck(
                    planes, time_kernel, stride, need_ds, addnon,
                    self.dtype, name=f"layer{stage}_{b}")(x, bt if b or stage > 1 else train)
                in_ch = planes * 4
            if stage == 1:
                # temporal pool after layer1 (reference :58)
                x = max_pool_3d(x, (3, 1, 1), (2, 1, 1), (1, 0, 0))

        feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        if self.num_classes is None:
            return feat
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=self.param_dtype, name="fc")(feat)

    @property
    def feature_dim(self) -> int:
        return 2048


def i3d_res50_nonlocal(**kwargs):
    return I3DResNetNonLocal(layers=(3, 4, 6, 3), **kwargs)
