"""Text-video S3D-G: gated S3D video tower + sentence-embedding text tower.

Counterpart of lib/modeling/backbone/backbone_3d/s3dg.py:238-331 (the
MIL-NCE-style text-video model, unexported in the reference): a full-3D
stem (optionally via the **space-to-depth trick** — which the reference
itself labels "for TPU optimization", :297-305), SelfGating feature gating
(:77-88), TF-SAME pooling, the Inception stack, a joint-embedding ``fc``,
and ``Sentence_Embedding`` (:184-236; word embeddings → per-word ReLU MLP →
max-pool over words → linear).

Space-to-depth here: (B, T, H, W, C) → (B, T/2, H/2, W/2, 8C) with the
stem conv becoming (2,4,4)/s1 — turning the bandwidth-bound 3-channel
stem conv into an MXU-friendly 24-channel one.
"""

from __future__ import annotations

import re
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from .i3d import _same_max_pool
from .layers import max_pool_3d
from .s3d import _MIXED_SPECS

Dtype = Any


def space_to_depth_3d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, T/2, H/2, W/2, 8C)
    (reference: _space_to_depth, s3dg.py:297-305)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // 2, 2, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
    return x.reshape(b, t // 2, h // 2, w // 2, 8 * c)


class SelfGating(nn.Module):
    """S3D-G feature gating: sigmoid(Dense(global-avg)) channel gate
    (reference: SelfGating, s3dg.py:77-88)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        w = nn.Dense(x.shape[-1], dtype=jnp.float32, name="fc")(pooled)
        w = nn.sigmoid(w).astype(x.dtype)
        return w[:, None, None, None, :] * x


class SentenceEmbedding(nn.Module):
    """Word-token sentence encoder (reference: Sentence_Embedding,
    s3dg.py:184-236): Embedding → ReLU(fc1) per word → max over words
    (zero-padded) → fc2.  Tokenization is host-side (``tokenize``)."""

    embd_dim: int = 512
    num_embeddings: int = 66250
    word_embedding_dim: int = 300
    output_dim: int = 2048

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        """token_ids: (B, max_words) int32, 0 = padding."""
        emb = nn.Embed(self.num_embeddings, self.word_embedding_dim,
                       name="word_embd")(token_ids)
        h = nn.relu(nn.Dense(self.output_dim, name="fc1")(emb))
        # max over words INCLUDING the zero-padding token's
        # ReLU(fc1(embed(0))) — exactly the reference (s3dg.py:230-233).
        # This is a real semantic (the MIL-NCE weights are trained with
        # the pad embedding competing in the max), not a latent bug, so
        # no masking: converted checkpoints must reproduce it.
        h = jnp.max(h, axis=1)
        return nn.Dense(self.embd_dim, name="fc2")(h)


def build_word_to_token(vocab: Sequence[str]) -> Dict[str, int]:
    """token dict: word -> id (1-based; 0 is padding), matching the
    reference's dict.npy convention (s3dg.py:200-202)."""
    return {w: i + 1 for i, w in enumerate(vocab)}


def tokenize(sentences: List[str], word_to_token: Dict[str, int],
             max_words: int = 16) -> np.ndarray:
    """Host-side tokenizer (reference: _split_text/_words_to_token,
    s3dg.py:204-227)."""
    out = np.zeros((len(sentences), max_words), np.int32)
    for i, sent in enumerate(sentences):
        words = re.findall(r"[\w']+", str(sent).lower())
        ids = [word_to_token[w] for w in words if w in word_to_token]
        ids = ids[:max_words]
        out[i, :len(ids)] = ids
    return out


class STConv(nn.Module):
    """STConv3D (reference s3dg.py:91-150): conv + BN + ReLU; separable
    runs spatial (1,k,k) then temporal (k,1,1), EACH with its own BN+ReLU,
    child names conv1/bn1(/conv2/bn2) mirroring the torch fields.  BN uses
    the torch defaults this file relies on (eps 1e-5, momentum 0.1 → flax
    0.9), unlike s3d_1.py's eps 1e-3."""

    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    separable: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype)
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
                     param_dtype=self.param_dtype)
        kt, kh, kw_ = self.kernel
        st, sh, sw = self.stride
        pt, ph, pw = self.padding
        if self.separable and kt != 1:
            x = conv(self.features, (1, kh, kw_), (1, sh, sw),
                     [(0, 0), (ph, ph), (pw, pw)], name="conv1")(x)
            x = nn.relu(bn(name="bn1")(x).astype(self.dtype))
            x = conv(self.features, (kt, 1, 1), (st, 1, 1),
                     [(pt, pt), (0, 0), (0, 0)], name="conv2")(x)
            return nn.relu(bn(name="bn2")(x).astype(self.dtype))
        x = conv(self.features, self.kernel, self.stride,
                 [(pt, pt), (ph, ph), (pw, pw)], name="conv1")(x)
        return nn.relu(bn(name="bn1")(x).astype(self.dtype))


class TextInceptionBlock(nn.Module):
    """Reference InceptionBlock (s3dg.py:25-75): 1x1x1 / 1x1x1→sep-3³ /
    1x1x1→sep-3³ / maxpool→1x1x1 branches, each followed by its own
    SelfGating when ``gating`` (the reference DEFAULT — constructed
    without the arg at :262-293)."""

    b0: int
    b1: Tuple[int, int]
    b2: Tuple[int, int]
    b3: int
    gating: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype)
        x0 = STConv(self.b0, (1, 1, 1), name="conv_b0", **kw)(x, train)
        x1 = STConv(self.b1[0], (1, 1, 1), name="conv_b1_a", **kw)(x, train)
        x1 = STConv(self.b1[1], (3, 3, 3), padding=(1, 1, 1), separable=True,
                    name="conv_b1_b", **kw)(x1, train)
        x2 = STConv(self.b2[0], (1, 1, 1), name="conv_b2_a", **kw)(x, train)
        x2 = STConv(self.b2[1], (3, 3, 3), padding=(1, 1, 1), separable=True,
                    name="conv_b2_b", **kw)(x2, train)
        # branch pool: plain torch MaxPool3d(3, 1, padding=1) (:47), NOT
        # the TF-SAME stage pools
        x3 = max_pool_3d(x, 3, 1, 1)
        x3 = STConv(self.b3, (1, 1, 1), name="conv_b3_b", **kw)(x3, train)
        if self.gating:
            x0 = SelfGating(dtype=self.dtype, name="gating_b0")(x0)
            x1 = SelfGating(dtype=self.dtype, name="gating_b1")(x1)
            x2 = SelfGating(dtype=self.dtype, name="gating_b2")(x2)
            x3 = SelfGating(dtype=self.dtype, name="gating_b3")(x3)
        return jnp.concatenate([x0, x1, x2, x3], axis=-1)


class S3DGText(nn.Module):
    """Joint text-video embedding model (reference: s3dg.py S3D class)."""

    embd_dim: int = 512
    gating: bool = True
    space_to_depth: bool = True
    num_text_embeddings: int = 66250
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, video: Optional[jnp.ndarray] = None,
                 text_ids: Optional[jnp.ndarray] = None,
                 train: bool = False):
        outs = {}
        if video is not None:
            outs["video_embedding"] = self.encode_video(video, train)
        if text_ids is not None:
            outs["text_embedding"] = SentenceEmbedding(
                self.embd_dim, self.num_text_embeddings,
                name="text_module")(text_ids)
        return outs

    @nn.compact_name_scope
    def encode_video(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype)
        x = x.astype(self.dtype)
        if self.space_to_depth:
            x = space_to_depth_3d(x)
            x = STConv(64, (2, 4, 4), (1, 1, 1), (1, 2, 2),
                       name="conv1", **kw)(x, train)
            # replicate the reference's SAME-padding correction (:312-315)
            x = x[:, 1:, 1:, 1:, :]
        else:
            x = STConv(64, (3, 7, 7), (2, 2, 2), (1, 3, 3),
                       name="conv1", **kw)(x, train)
        x = _same_max_pool(x, (1, 3, 3), (1, 2, 2))
        x = STConv(64, (1, 1, 1), name="conv_2b", **kw)(x, train)
        x = STConv(192, (3, 3, 3), padding=(1, 1, 1), separable=True,
                   name="conv_2c", **kw)(x, train)
        if self.gating:
            x = SelfGating(dtype=self.dtype, name="gating")(x)
        x = _same_max_pool(x, (1, 3, 3), (1, 2, 2))

        # stage sequence with pools (reference :256-293); every block
        # carries per-branch SelfGating (InceptionBlock's gating DEFAULT)
        blk = partial(TextInceptionBlock, gating=self.gating, **kw)
        x = blk(*_MIXED_SPECS["mixed_3b"], name="mixed_3b")(x, train)
        x = blk(*_MIXED_SPECS["mixed_3c"], name="mixed_3c")(x, train)
        x = _same_max_pool(x, (3, 3, 3), (2, 2, 2))
        for nm in ("mixed_4b", "mixed_4c", "mixed_4d", "mixed_4e", "mixed_4f"):
            x = blk(*_MIXED_SPECS[nm], name=nm)(x, train)
        x = _same_max_pool(x, (2, 2, 2), (2, 2, 2))
        x = blk(*_MIXED_SPECS["mixed_5b"], name="mixed_5b")(x, train)
        x = blk(*_MIXED_SPECS["mixed_5c"], name="mixed_5c")(x, train)
        feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        return nn.Dense(self.embd_dim, dtype=jnp.float32, name="fc")(feat)
