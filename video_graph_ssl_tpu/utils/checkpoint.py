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


# --------------------------------------------------------------------------- #
# Orbax backend: sharded (per-host) + optionally async checkpointing.
#
# TPU-native alternative to the single-file msgpack path for multi-host
# meshes: every process writes only the array shards it owns (tensorstore),
# and restore lays shards out directly onto the template's sharding. The
# reference's torch.save-on-rank-0 (lib/utils/saver.py:20-43) has no
# equivalent scale-out story. Select with TPU.CKPT_BACKEND = 'orbax'.
# --------------------------------------------------------------------------- #

_ASYNC_CKPTRS: list = []


def _unwrap_keys(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.random.key_data(x) if _is_key(x) else x, tree)


def save_checkpoint_orbax(path: str, state, epoch: int,
                          best_pred: float = 0.0,
                          extra: Optional[Dict[str, Any]] = None,
                          async_save: bool = False) -> None:
    """Write the TrainState to the ``path`` directory via orbax.

    ``async_save=True`` returns immediately and commits in the background
    (call :func:`wait_for_async_checkpoints` before exiting); arrays are
    snapshotted at call time so training can continue into the next step.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    payload = serialization.to_state_dict(_unwrap_keys(state))
    if async_save:
        # at most one save in flight: drain earlier ones first, and make
        # sure in-flight saves commit before interpreter teardown kills the
        # executor threads (leaving an .orbax-checkpoint-tmp behind)
        import atexit
        wait_for_async_checkpoints()
        atexit.register(wait_for_async_checkpoints)
        ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        _ASYNC_CKPTRS.append(ckptr)
    else:
        ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
    meta = {"epoch": int(epoch), "best_pred": float(best_pred),
            **(extra or {})}
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def wait_for_async_checkpoints() -> None:
    """Block until every in-flight async orbax save has committed."""
    while _ASYNC_CKPTRS:
        _ASYNC_CKPTRS.pop().wait_until_finished()


def load_checkpoint_orbax(path: str, state_template):
    """Restore an orbax checkpoint into a template TrainState.

    Each leaf is restored with the template's shape/dtype/sharding, so a
    checkpoint written on one mesh reloads onto another (e.g. resume a
    v5e-8 run on v5e-16) — re-sharding happens inside tensorstore reads.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    raw_template = serialization.to_state_dict(_unwrap_keys(state_template))

    def abstract(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    target = jax.tree_util.tree_map(abstract, raw_template)
    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    restored = ckptr.restore(path, args=ocp.args.StandardRestore(target))
    state = serialization.from_state_dict(state_template, restored)
    state = _rewrap_keys(state_template, state)
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    return state, meta


def load_checkpoint_any(path: str, state_template):
    """Dispatch restore on checkpoint kind: orbax dirs vs msgpack files."""
    if os.path.isdir(path):
        return load_checkpoint_orbax(path, state_template)
    return load_checkpoint_state(path, state_template)


def load_params_only(path: str):
    """Raw nested dict of a checkpoint (for checkpoint surgery: loading SSL
    encoders into downstream models skipping heads,
    reference: tools/train_ds.py:70-79, video_retrieval.py:24-53).
    Accepts both msgpack files and orbax directories."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
        state = ckptr.restore(os.path.abspath(path))
        with open(path + ".meta.json") as f:
            meta = json.load(f)
        return state, meta
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
    SimSiam and ContrastWrapper (see models.wrappers.GraphWrapper); CMC
    checkpoints (CROSS.MODALITY != 'visual') carry two stacks and the
    modality-1 (RGB) encoder params['model_1']['encoder'] is what
    downstream consumes.
    """
    params = ssl_state_dict["params"]
    stats = ssl_state_dict.get("batch_stats", {})
    root = "model_1" if "model_1" in params else "model"
    enc_params = params[root]["encoder"]
    enc_stats = stats.get(root, {}).get("encoder", {})

    new_params = dict(target_params)
    new_params["encoder"] = enc_params
    new_stats = dict(target_batch_stats)
    if enc_stats:
        new_stats["encoder"] = enc_stats
    return new_params, new_stats
