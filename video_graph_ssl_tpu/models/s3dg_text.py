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
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from .i3d import Unit3D, _same_max_pool
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
        # masked max over words (padding token 0 embeds arbitrarily; the
        # reference relies on ReLU(fc1(embed(0))) — we mask explicitly)
        mask = (token_ids > 0)[..., None]
        h = jnp.where(mask, h, -jnp.inf)
        h = jnp.max(h, axis=1)
        h = jnp.where(jnp.isfinite(h), h, 0.0)
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
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        if self.space_to_depth:
            x = space_to_depth_3d(x)
            x = Unit3D(64, (2, 4, 4), (1, 1, 1), name="conv1")(x, train)
            # replicate the reference's SAME-padding correction (:312-315)
            x = x[:, 1:, 1:, 1:, :]
        else:
            x = Unit3D(64, (3, 7, 7), (2, 2, 2), name="conv1")(x, train)
        x = _same_max_pool(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, (1, 1, 1), name="conv_2b")(x, train)
        x = Unit3D(192, (3, 3, 3), name="conv_2c")(x, train)
        if self.gating:
            x = SelfGating(dtype=self.dtype, name="gating")(x)
        x = _same_max_pool(x, (1, 3, 3), (1, 2, 2))

        from .i3d import I3DMixed

        # stage sequence with pools (reference :256-293)
        x = I3DMixed(*_MIXED_SPECS["mixed_3b"], name="mixed_3b",
                     dtype=self.dtype)(x, train)
        x = I3DMixed(*_MIXED_SPECS["mixed_3c"], name="mixed_3c",
                     dtype=self.dtype)(x, train)
        x = _same_max_pool(x, (3, 3, 3), (2, 2, 2))
        for nm in ("mixed_4b", "mixed_4c", "mixed_4d", "mixed_4e", "mixed_4f"):
            x = I3DMixed(*_MIXED_SPECS[nm], name=nm, dtype=self.dtype)(x, train)
        x = _same_max_pool(x, (2, 2, 2), (2, 2, 2))
        x = I3DMixed(*_MIXED_SPECS["mixed_5b"], name="mixed_5b",
                     dtype=self.dtype)(x, train)
        x = I3DMixed(*_MIXED_SPECS["mixed_5c"], name="mixed_5c",
                     dtype=self.dtype)(x, train)
        feat = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        return nn.Dense(self.embd_dim, dtype=jnp.float32, name="fc")(feat)
