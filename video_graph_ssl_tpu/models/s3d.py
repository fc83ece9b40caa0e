"""S3D — separable 3D Inception network, the reference's default backbone.

TPU-first rebuild of the reference S3D (lib/modeling/backbone/backbone_3d/
s3d_1.py:5-329): channels-last (B, T, H, W, C) activations, bf16 compute,
one parameterized InceptionBlock instead of nine Mixed_* classes, and
first-class insertion points for the temporal-graph augmentation.

Stage indexing matches the reference's ``base`` Sequential exactly, so the
reference's default graph-aug points ``['base.5','base.9','base.14']``
(lib/modeling/visual_wrappers.py:121-122) map to ``aug_points=(5, 9, 14)``
— the augmentation runs on the *input* of the named stage, matching the
reference's ``Sequential(TemporalGraphAug, module)`` wrapping
(lib/ops/build.py:9-32).

| idx | stage                         | out ch |
|-----|-------------------------------|--------|
| 0   | SepConv3d k7 s2 p3            | 64     |
| 1   | MaxPool (1,3,3)/(1,2,2)       | 64     |
| 2   | BasicConv3d k1                | 64     |
| 3   | SepConv3d k3 p1               | 192    |
| 4   | MaxPool (1,3,3)/(1,2,2)       | 192    |
| 5   | Mixed_3b                      | 256    |
| 6   | Mixed_3c                      | 480    |
| 7   | MaxPool (3,3,3)/2             | 480    |
| 8-12| Mixed_4b..4f                  | 512,512,528,832 |
| 13  | MaxPool (2,2,2)/2             | 832    |
| 14  | Mixed_5b                      | 832    |
| 15  | Mixed_5c                      | 1024   |
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.temporal_graph import TemporalGraphAug
from .layers import (BasicConv3d, InceptionBlock, SepConv3d, SepConvS2D,
                     fold_stem_kernel_s2d, max_pool_3d)

Dtype = Any

# Inception channel plan: (b0, (b1r, b1), (b2r, b2), b3)
_MIXED_SPECS = {
    "mixed_3b": (64, (96, 128), (16, 32), 32),
    "mixed_3c": (128, (128, 192), (32, 96), 64),
    "mixed_4b": (192, (96, 208), (16, 48), 64),
    "mixed_4c": (160, (112, 224), (24, 64), 64),
    "mixed_4d": (128, (128, 256), (24, 64), 64),
    "mixed_4e": (112, (144, 288), (32, 64), 64),
    "mixed_4f": (256, (160, 320), (32, 128), 128),
    "mixed_5b": (256, (160, 320), (32, 128), 128),
    "mixed_5c": (384, (192, 384), (48, 128), 128),
}

S3D_FEATURE_DIM = 1024


class S3D(nn.Module):
    """S3D backbone.

    ``num_classes=None`` → encoder mode: returns globally pooled
    (B, 1024) clip features (what the SSL wrappers use after stripping the
    classifier, reference visual_wrappers.py:102-110).  With a class count,
    adds the 1×1×1-conv-equivalent Dense head and returns logits — the
    reference's avg_pool3d+conv+temporal-mean (s3d_1.py:28-35) reduces to
    global-mean-pool → Dense.
    """

    num_classes: Optional[int] = None
    aug_points: Tuple[int, ...] = ()
    graph_cfg: Optional[Dict[str, Any]] = None
    # False | True (block-granular recompute) | 'conv_saved' (keep conv
    # outputs, recompute only BN/ReLU epilogues — no conv recompute,
    # ~half the stored-activation traffic; TPU.REMAT_POLICY).
    remat: Any = False
    # S3DG variant (reference S3DG_Pytorch.py:310-355): same topology,
    # biased temporal convs with Normal(0, 0.01) init ('STConv3d').
    temporal_bias: bool = False
    # Space-to-depth stem (TPU.STEM_S2D): stage 0 becomes two stride-1
    # convs on space-to-depth inputs — exactly the same function as
    # SepConv3d(64, 7, 2, 3) under the fold_stem_kernel_s2d weight map
    # (see layers.SepConvS2D; standard-stem checkpoints convert via
    # stem_params_to_s2d).  Requires even T, H, W at the input.
    # True/'full' = both convs; 'spatial' = spatial conv only (the
    # temporal block transpose measured slower on v5e, see SepConvS2D).
    stem_s2d: Any = False
    # Pack each inception block's branch0 + reduce 1x1x1 convs into one
    # MXU matmul (TPU.PACK_POINTWISE; see layers.InceptionBlock) — same
    # math, same checkpoint tree.
    pack_pointwise: bool = False
    # Route eligible branch SepConvs through the custom-VJP 3-sweep
    # recompute backward (TPU.SEPCONV_FUSED; layers.SepConv3d.fused_bwd).
    fused_sepconv: bool = False
    # Partial-BN (reference: VideoModelWrapper.train() override,
    # model_wrappers.py:130-146): when training downstream, BNs after the
    # first conv stage run on running statistics.  Stage-granular here
    # (stem_0's two BNs stay live vs the reference's strictly-first-BN).
    partial_bn: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        skw = dict(temporal_bias=self.temporal_bias, **kw)
        gcfg = dict(self.graph_cfg or {})

        sep = SepConv3d
        sep_s2d = SepConvS2D
        basic = BasicConv3d
        mixed = InceptionBlock
        if self.remat:
            policy = None
            if self.remat == "conv_saved":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "conv_out")
            sep = nn.remat(sep, static_argnums=(2, 3), policy=policy)
            sep_s2d = nn.remat(sep_s2d, static_argnums=(2, 3), policy=policy)
            basic = nn.remat(basic, static_argnums=(2, 3), policy=policy)
            mixed = nn.remat(mixed, static_argnums=(2, 3), policy=policy)

        if self.stem_s2d:
            stem = lambda h, t, bf: sep_s2d(
                64, temporal_s2d=(self.stem_s2d != "spatial"),
                name="stem_0", **skw)(h, t, False)
        else:
            stem = lambda h, t, bf: sep(64, 7, 2, 3, name="stem_0", **skw)(h, t, False)
        stages = [
            ("stem_0", stem),
            ("pool_1", lambda h, t, bf: max_pool_3d(h, (1, 3, 3), (1, 2, 2), (0, 1, 1))),
            ("stem_2", lambda h, t, bf: basic(64, 1, name="stem_2", **kw)(h, t, bf)),
            ("stem_3", lambda h, t, bf: sep(192, 3, 1, 1, name="stem_3", **skw)(h, t, bf)),
            ("pool_4", lambda h, t, bf: max_pool_3d(h, (1, 3, 3), (1, 2, 2), (0, 1, 1))),
            ("mixed_3b", None),
            ("mixed_3c", None),
            ("pool_7", lambda h, t, bf: max_pool_3d(h, 3, 2, 1)),
            ("mixed_4b", None),
            ("mixed_4c", None),
            ("mixed_4d", None),
            ("mixed_4e", None),
            ("mixed_4f", None),
            ("pool_13", lambda h, t, bf: max_pool_3d(h, 2, 2, 0)),
            ("mixed_5b", None),
            ("mixed_5c", None),
        ]

        bn_frozen = self.partial_bn and train
        x = x.astype(self.dtype)
        for idx, (name, fn) in enumerate(stages):
            if idx in self.aug_points:
                x = TemporalGraphAug(
                    name=f"graph_aug_{idx}",
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    **gcfg,
                )(x, train=train)
            if fn is not None:
                x = fn(x, train, bn_frozen)
            else:
                b0, b1, b2, b3 = _MIXED_SPECS[name]
                x = mixed(b0, b1, b2, b3, name=name,
                          pack_pointwise=self.pack_pointwise,
                          fused_sepconv=self.fused_sepconv,
                          **skw)(x, train, bn_frozen)

        # Reference head pooling (s3d_1.py:28-35, S3DG_Pytorch.py:331-347):
        # avg_pool3d((2, H, W), stride 1) then mean over the remaining
        # temporal windows.  Equivalent to spatial mean -> average of
        # adjacent-frame pairs -> temporal mean, which gives endpoint frames
        # HALF the weight of interior frames when T' > 2 (e.g. the 32-frame
        # fine-tune setting, T'=4).  Identical to a uniform mean at T'<=2.
        y = jnp.mean(x.astype(jnp.float32), axis=(2, 3))  # (B, T', C)
        if y.shape[1] > 1:
            y = (y[:, :-1] + y[:, 1:]) * 0.5
        feat = jnp.mean(y, axis=1)
        if self.num_classes is None:
            return feat
        logits = nn.Dense(
            self.num_classes,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            name="fc",
        )(feat)
        return logits

    @property
    def feature_dim(self) -> int:
        return S3D_FEATURE_DIM


def stem_params_to_s2d(params, mode: str = "full"):
    """Convert a standard-stem S3D param tree to the ``stem_s2d`` layout:
    every ``stem_0`` (at any nesting depth — raw backbone trees and
    wrapper trees both work) gets its conv kernels folded with
    ``fold_stem_kernel_s2d``; biases and BN leaves are unchanged (the stem's
    intermediate tensors are identical).  ``mode='spatial'`` folds only the
    spatial conv (for ``stem_s2d='spatial'``).  Returns a new tree."""
    branches = ((("spatial", "hw"),) if mode == "spatial"
                else (("spatial", "hw"), ("temporal", "t")))

    def fold_stem(stem):
        stem = dict(stem)
        for branch, axes in branches:
            sub = dict(stem[branch])
            if "conv" not in sub:      # batch_stats subtree: BN stats only
                continue
            conv = dict(sub["conv"])
            conv["kernel"] = jnp.asarray(
                fold_stem_kernel_s2d(conv["kernel"], axes),
                dtype=jnp.asarray(conv["kernel"]).dtype)
            sub["conv"] = conv
            stem[branch] = sub
        return stem

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        return {k: fold_stem(v) if k == "stem_0" else walk(v)
                for k, v in tree.items()}

    return walk(params)
