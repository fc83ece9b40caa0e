"""Model wrappers: encoder, contrastive heads, SimSiam, downstream classifier.

TPU-native counterparts of the reference's
``VisualModelWrapper``/``VideoModelWrapper``/``GraphWrapper``
(lib/modeling/visual_wrappers.py:9-268, model_wrappers.py:9-263,
graph_wrappers.py:8-120).  Everything is a pure Flax module; EMA encoders
and contrast memories live in the functional train state, not here.

Layout contract: clips arrive channels-last —
  * 3D backbones: ``(B, T, H, W, C)``
  * 2D backbones: same, frames folded into the batch internally
    (the reference reshapes (B, T·C, H, W)→(B·T, C, H, W),
    visual_wrappers.py:87-95)
  * two-view SSL batches: ``(B, 2, T, H, W, C)`` — an explicit views axis
    instead of the reference's channel-dim concatenation
    (video_contrast_dataset.py:202, graph_wrappers.py:56).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pooling import temporal_aggregate
from .heads import PredictionMLP, ProjectHead, ProjectionMLP

Dtype = Any


def rgb_diff(x: jnp.ndarray, n_channels: int = 3) -> jnp.ndarray:
    """RGBDiff: consecutive-frame differences over channel-stacked groups.

    Input ``(..., C·(new_length+1))`` (the +1 frame loaded by the dataset,
    reference dataset.py:47-48) → ``(..., C·new_length)`` of later-minus-
    earlier group differences.  The reference's RGBDiff forward is missing
    its ``_get_diff`` (model_wrappers.py never defines one — latent bug);
    this implements the intended TSN semantics, applied after the on-device
    normalization like TSN's input-tensor diff.
    """
    groups = x.reshape(x.shape[:-1] + (-1, n_channels))
    d = groups[..., 1:, :] - groups[..., :-1, :]
    return d.reshape(x.shape[:-1] + (-1,))


class VisualEncoder(nn.Module):
    """Backbone + (2D) frame aggregation + feature dropout → (B, feat_dim).

    Mirrors ``VisualModelWrapper``: classifier stripped, ``feature_dim``
    features exposed; dropout replaces the reference's Dropout-in-place-of-fc
    (visual_wrappers.py:102-110).
    """

    backbone_ctor: Callable[..., nn.Module]
    backbone_type: str = "3D"
    agg_fun: str = "avg"
    dropout: float = 0.0
    aug_points: Tuple[int, ...] = ()
    graph_cfg: Optional[Dict[str, Any]] = None
    remat: bool = False
    partial_bn: bool = False
    # RGB | Flow | RGBDiff; with new_length the channel arithmetic is
    # sample_len = (3 if RGB/RGBDiff else 2) · new_length
    # (reference visual_wrappers.py:85, model_wrappers.py:73).
    modality: str = "RGB"
    new_length: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.modality == "RGBDiff":
            x = rgb_diff(x)
        backbone = self.backbone_ctor(
            num_classes=None,
            aug_points=self.aug_points,
            graph_cfg=self.graph_cfg,
            remat=self.remat,
            partial_bn=self.partial_bn,
            dtype=self.dtype,
            name="base_model",
        )
        if self.backbone_type == "2D":
            b, t = x.shape[0], x.shape[1]
            feat = backbone(x.reshape((b * t,) + x.shape[2:]), train=train)
            feat = feat.reshape(b, t, -1)
            feat = temporal_aggregate(feat, mode=self.agg_fun, axis=1)
        elif self.backbone_type == "3D":
            feat = backbone(x, train=train)
        else:
            raise ValueError(f"Backbone type must be 2D or 3D, got {self.backbone_type}")
        if self.dropout > 0:
            feat = nn.Dropout(rate=self.dropout, deterministic=not train)(feat)
        return feat


class ContrastWrapper(nn.Module):
    """encoder → ProjectHead (L2-normalized) (reference: graph_wrappers.py:8-26)."""

    encoder_cfg: Dict[str, Any]
    hid_dim: int = 128
    head_type: str = "mlp"

    def setup(self):
        self.encoder = VisualEncoder(**self.encoder_cfg, name="encoder")
        self.proj_head = ProjectHead(self.hid_dim, self.head_type, name="proj_head")

    def __call__(self, x: jnp.ndarray, train: bool = False,
                 bb_grad: bool = True) -> jnp.ndarray:
        feat = self.encoder(x, train=train)
        feat = self.proj_head(feat, train=train)
        if not bb_grad:
            feat = jax.lax.stop_gradient(feat)
        return feat

    def encode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Backbone features only (retrieval / probing drop proj_head,
        reference: tools/video_retrieval.py:42)."""
        return self.encoder(x, train=train)


class SimSiam(nn.Module):
    """Two-view SimSiam with the symmetric negative-cosine loss computed
    inside the model (reference: graph_wrappers.py:30-108).

    Input ``(B, 2, T, H, W, C)``; returns the scalar loss.  The encoder and
    both MLPs are shared across views; each view takes its own forward pass
    (same per-view BatchNorm batch semantics as the reference).
    """

    encoder_cfg: Dict[str, Any]
    hid_dim: int = 1024

    def setup(self):
        self.encoder = VisualEncoder(**self.encoder_cfg, name="encoder")
        self.projection = ProjectionMLP(self.hid_dim, self.hid_dim,
                                        name="projection")
        self.prediction = PredictionMLP(self.hid_dim // 2, self.hid_dim,
                                        name="prediction")

    def _branch(self, x, train):
        h = self.projection(self.encoder(x, train=train), train=train)
        p = self.prediction(h, train=train)
        return h, p

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x1, x2 = x[:, 0], x[:, 1]
        h1, p1 = self._branch(x1, train)
        h2, p2 = self._branch(x2, train)
        return simsiam_d(p1, h2) / 2 + simsiam_d(p2, h1) / 2

    def encode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.encoder(x, train=train)


def simsiam_d(p: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Negative cosine similarity with stop-gradient on z — the reference's
    D 'v2' (graph_wrappers.py:93-108)."""
    z = jax.lax.stop_gradient(z)
    p = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
    return -jnp.mean(jnp.sum(p * z, axis=-1))


def temporal_diff(x: jnp.ndarray) -> jnp.ndarray:
    """Second CMC modality stream: adjacent-frame differences along T,
    front-padded with the first difference so the clip shape is preserved
    (both CMC encoders then share one input geometry).  The reference
    defines CMC memories/criteria but never a modality pair — its tools
    never build the second encoder (lib/memory/build.py:7-11 dispatches,
    tools/train_video_contrast_dis.py never branches) — so the pair here
    is RGB + temporal difference, the TSN 'RGBDiff' idea on the time axis
    (reference model_wrappers.py:41-45 uses the channel-stacked variant
    for 2D nets)."""
    d = x[:, 1:] - x[:, :-1]
    return jnp.concatenate([d[:, :1], d], axis=1)


class CmcWrapper(nn.Module):
    """Two-modality CMC model (CROSS.MODALITY != 'visual').

    One full encoder+head stack per modality (``model_1`` = RGB,
    ``model_2`` = temporal difference); ``__call__`` encodes ONE clip batch
    ``(B, T, H, W, C)`` through both and returns L2-normalized
    ``(f1, f2)``.  The CMC steps (engine/pretrain.py) call it once per
    view — query pass with grads, EMA key pass — exactly the four-stream
    contract of the reference's CMCMoCo (mem_moco.py:101-142) and the
    two-stream one of CMCMem (mem_bank.py:107-141)."""

    encoder_cfg: Dict[str, Any]
    hid_dim: int = 128
    head_type: str = "mlp"

    def setup(self):
        self.model_1 = ContrastWrapper(self.encoder_cfg, self.hid_dim,
                                       self.head_type, name="model_1")
        self.model_2 = ContrastWrapper(self.encoder_cfg, self.hid_dim,
                                       self.head_type, name="model_2")

    def __call__(self, x: jnp.ndarray, train: bool = False):
        f1 = self.model_1(x, train=train)
        f2 = self.model_2(temporal_diff(x), train=train)
        return f1, f2

    def encode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Feature extraction for retrieval/downstream: modality-1 encoder
        (the RGB stream is what downstream evaluation consumes)."""
        return self.model_1.encode(x, train=train)


class GraphWrapper(nn.Module):
    """Dispatch on MEM_TYPE: SimSiam for 'simsiam', ContrastWrapper otherwise
    (reference: graph_wrappers.py:110-120)."""

    encoder_cfg: Dict[str, Any]
    hid_dim: int = 1024
    head_type: str = "mlp"
    mem_type: str = "simsiam"

    def setup(self):
        if self.mem_type == "simsiam":
            self.model = SimSiam(self.encoder_cfg, self.hid_dim, name="model")
        else:
            self.model = ContrastWrapper(self.encoder_cfg, self.hid_dim,
                                         self.head_type, name="model")

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.model(x, train=train)

    def encode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.model.encode(x, train=train)


class VideoModel(nn.Module):
    """Downstream classifier: encoder + ``new_fc`` head with
    Normal(0, 0.001) weight init and zero bias
    (reference: model_wrappers.py:94-114)."""

    encoder_cfg: Dict[str, Any]
    num_classes: int = 101

    def setup(self):
        self.encoder = VisualEncoder(**self.encoder_cfg, name="encoder")
        self.new_fc = nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.normal(stddev=0.001),
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32,
            name="new_fc",
        )

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.new_fc(self.encoder(x, train=train))

    def encode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self.encoder(x, train=train)
