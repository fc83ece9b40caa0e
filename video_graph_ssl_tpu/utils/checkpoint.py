"""Checkpoint serialization of the functional train state.

Counterpart of the reference's torch.save checkpoints
(lib/utils/saver.py:20-43 + tools/train_video_contrast_dis.py:271-287).
State layout mirrors the reference's dict:
``{'epoch', 'state_dict' (params+batch_stats), 'optimizer', 'contrast',
'model_ema', 'best_pred'}`` so resume semantics match 1:1
(reference: _resume, train_video_contrast_dis.py:148-174).

Serialization is flax msgpack (``flax.serialization``) — a single portable
file with no framework pickles.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
import jax
from flax import serialization


def _is_key(x) -> bool:
    return hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype,
                                                         jax.dtypes.prng_key)


def _to_host(tree):
    """Device pytree -> numpy; typed PRNG keys stored as their raw data."""
    def conv(x):
        if _is_key(x):
            x = jax.random.key_data(x)
        return np.asarray(x)

    return jax.tree_util.tree_map(conv, tree)


def _rewrap_keys(template, restored):
    """Re-wrap raw key data wherever the template holds a typed PRNG key."""
    return jax.tree_util.tree_map(
        lambda t, r: jax.random.wrap_key_data(r) if _is_key(t) else r,
        template, restored,
    )


def save_checkpoint_state(path: str, state, epoch: int,
                          best_pred: float = 0.0,
                          extra: Optional[Dict[str, Any]] = None) -> None:
    """Write the TrainState + metadata to ``path`` (.msgpack)."""
    payload = {
        "state": serialization.to_state_dict(_to_host(state)),
        "meta": {"epoch": int(epoch), "best_pred": float(best_pred),
                 **(extra or {})},
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    with open(path + ".meta.json", "w") as f:
        json.dump(payload["meta"], f)


def load_checkpoint_state(path: str, state_template):
    """Restore into a template TrainState; returns (state, meta)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(state_template, payload["state"])
    state = _rewrap_keys(state_template, state)
    return state, payload["meta"]


def load_params_only(path: str):
    """Raw nested dict of a checkpoint (for checkpoint surgery: loading SSL
    encoders into downstream models skipping heads,
    reference: tools/train_ds.py:70-79, video_retrieval.py:24-53)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload["state"], payload["meta"]


def transfer_encoder_params(
    ssl_state_dict: Dict[str, Any],
    target_params: Dict[str, Any],
    target_batch_stats: Dict[str, Any],
    mem_type: str = "simsiam",
) -> tuple:
    """Checkpoint surgery: copy the SSL encoder subtree into a downstream
    model's params/batch_stats, keeping the fresh ``new_fc``
    (reference: train_ds.py:70-79 skips 'new_fc' keys; video_retrieval.py:42
    strips the 'encoder.' prefix and drops proj_head).

    SSL layouts: params['model']['encoder'] holds the VisualEncoder for both
    SimSiam and ContrastWrapper (see models.wrappers.GraphWrapper).
    """
    params = ssl_state_dict["params"]
    stats = ssl_state_dict.get("batch_stats", {})
    enc_params = params["model"]["encoder"]
    enc_stats = stats.get("model", {}).get("encoder", {})

    new_params = dict(target_params)
    new_params["encoder"] = enc_params
    new_stats = dict(target_batch_stats)
    if enc_stats:
        new_stats["encoder"] = enc_stats
    return new_params, new_stats
