"""I3D — inflated Inception-v1 with TF-style SAME padding.

Counterpart of the reference's two I3D implementations
(lib/modeling/backbone/backbone_3d/i3dpt.py:161-311 'I3D' and
i3d_inception.py:152-338 'InceptionI3d' — byte-near duplicates of the same
network; one class here serves both registry names).  The reference
hand-rolls TF SAME padding with F.pad (Unit3Dpy :38-107,
MaxPool3dTFPadding :109-122); XLA's native ``padding='SAME'`` has exactly
TF's semantics, so the whole emulation layer disappears.

Inception-v1 channel plan (same Mixed specs as S3D — S3D is its separable
factorization), full 3D convolutions, BN eps 1e-3, feature dim 1024.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.temporal_graph import TemporalGraphAug
from .layers import _BNVars, _PointwiseKernel, packed_bn_relu
from .s3d import _MIXED_SPECS

Dtype = Any

I3D_FEATURE_DIM = 1024


def _same_max_pool(x, kernel, strides):
    return nn.max_pool(x, window_shape=kernel, strides=strides,
                       padding="SAME")


class Unit3D(nn.Module):
    """conv(SAME) + BN + ReLU (reference: Unit3Dpy, i3dpt.py:38-107)."""

    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, self.kernel_size, self.strides,
                    padding="SAME", use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.999,
                         epsilon=1e-3, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="bn")(x)
        return nn.relu(x.astype(self.dtype))


class _PackedUnit(nn.Module):
    """Unit3D-shaped param holder for the packed-pointwise path: child
    names ('conv', 'bn') and variable trees match Unit3D exactly; the 1x1x1
    conv and the BN apply run packed in I3DMixed (see
    InceptionBlock.pack_pointwise in layers.py — identical trick, I3D tree
    layout)."""

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


class I3DMixed(nn.Module):
    """Inception block with full 3D 3x3x3 branch convs
    (reference: Mixed, i3dpt.py:124-158).

    ``pack_pointwise``: branch0 + the two reduce convs as ONE 1x1x1
    convolution (same math, same checkpoint tree; see
    layers.InceptionBlock.pack_pointwise)."""

    b0: int
    b1: Tuple[int, int]
    b2: Tuple[int, int]
    b3: int
    pack_pointwise: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.pack_pointwise:
            cin = x.shape[-1]
            pkw = dict(param_dtype=self.param_dtype)
            pw0 = _PackedUnit(self.b0, cin, name="branch0", **pkw)
            pw1 = _PackedUnit(self.b1[0], cin, name="branch1_reduce", **pkw)
            pw2 = _PackedUnit(self.b2[0], cin, name="branch2_reduce", **pkw)
            kpack = jnp.concatenate(
                [pw.kernel() for pw in (pw0, pw1, pw2)],
                axis=-1).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kpack, (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            z = packed_bn_relu(self, y,
                               [pw.bn_vars() for pw in (pw0, pw1, pw2)],
                               train=train, momentum=0.999, eps=1e-3,
                               dtype=self.dtype)
            c0, c1 = self.b0, self.b0 + self.b1[0]
            x0, x1, x2 = z[..., :c0], z[..., c0:c1], z[..., c1:]
        else:
            x0 = Unit3D(self.b0, (1, 1, 1), name="branch0", **kw)(x, train)
            x1 = Unit3D(self.b1[0], (1, 1, 1), name="branch1_reduce", **kw)(x, train)
            x2 = Unit3D(self.b2[0], (1, 1, 1), name="branch2_reduce", **kw)(x, train)
        x1 = Unit3D(self.b1[1], (3, 3, 3), name="branch1", **kw)(x1, train)
        x2 = Unit3D(self.b2[1], (3, 3, 3), name="branch2", **kw)(x2, train)
        x3 = _same_max_pool(x, (3, 3, 3), (1, 1, 1))
        x3 = Unit3D(self.b3, (1, 1, 1), name="branch3", **kw)(x3, train)
        return jnp.concatenate([x0, x1, x2, x3], axis=-1)


class I3D(nn.Module):
    """Encoder mode when ``num_classes is None``; aug insertion points use
    the S3D stage indexing convention (5, 9, 14 = inputs of mixed_3b /
    mixed_4c / mixed_5b)."""

    num_classes: Optional[int] = None
    aug_points: Tuple[int, ...] = ()
    graph_cfg: Optional[Dict[str, Any]] = None
    remat: bool = False
    # Pack each inception block's branch0 + reduce 1x1x1 convs into one
    # MXU matmul (TPU.PACK_POINTWISE; same math, same checkpoint tree).
    pack_pointwise: bool = False
    # Partial-BN: after the first conv/BN, blocks' BNs run on running stats
    # during training (train only gates BN in these blocks, so passing
    # train=False to them is exactly the reference's partial-BN semantics,
    # model_wrappers.py:130-146).
    partial_bn: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        gcfg = dict(self.graph_cfg or {})
        mixed = I3DMixed
        unit = Unit3D
        if self.remat:
            mixed = nn.remat(mixed, static_argnums=(2,))
            unit = nn.remat(unit, static_argnums=(2,))

        def aug(idx, h):
            if idx in self.aug_points:
                return TemporalGraphAug(
                    name=f"graph_aug_{idx}", dtype=self.dtype,
                    param_dtype=self.param_dtype, **gcfg)(h, train=train)
            return h

        x = x.astype(self.dtype)
        x = unit(64, (7, 7, 7), (2, 2, 2), name="conv3d_1a", **kw)(x, train)
        bt = train and not self.partial_bn
        x = _same_max_pool(x, (1, 3, 3), (1, 2, 2))
        x = unit(64, (1, 1, 1), name="conv3d_2b", **kw)(x, bt)
        x = unit(192, (3, 3, 3), name="conv3d_2c", **kw)(x, bt)
        x = _same_max_pool(x, (1, 3, 3), (1, 2, 2))

        stage_plan = [
            (5, "mixed_3b"), (6, "mixed_3c"), (7, None),
            (8, "mixed_4b"), (9, "mixed_4c"), (10, "mixed_4d"),
            (11, "mixed_4e"), (12, "mixed_4f"), (13, None),
            (14, "mixed_5b"), (15, "mixed_5c"),
        ]
        for idx, name in stage_plan:
            x = aug(idx, x)
            if name is None:
                k = (3, 3, 3) if idx == 7 else (2, 2, 2)
                x = _same_max_pool(x, k, (2, 2, 2))
            else:
                b0, b1, b2, b3 = _MIXED_SPECS[name]
                x = mixed(b0, b1, b2, b3, name=name,
                          pack_pointwise=self.pack_pointwise, **kw)(x, bt)

        # Reference head pooling (i3dpt.py:230-262): AvgPool3d((2,7,7),
        # stride 1) -> 1x1x1 conv -> temporal mean.  As in S3D (s3d.py head),
        # this equals spatial mean -> adjacent-frame-pair average -> temporal
        # mean, weighting endpoint frames HALF of interior frames when T'>2;
        # the pair-average commutes with the linear classifier so features
        # can carry it.
        y = jnp.mean(x.astype(jnp.float32), axis=(2, 3))  # (B, T', C)
        if y.shape[1] > 1:
            y = (y[:, :-1] + y[:, 1:]) * 0.5
        feat = jnp.mean(y, axis=1)
        if self.num_classes is None:
            return feat
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=self.param_dtype, name="fc")(feat)

    @property
    def feature_dim(self) -> int:
        return I3D_FEATURE_DIM
