"""ShuffleBN — per-device BN with a global batch shuffle for the MoCo key
encoder.

The reference's countermeasure against intra-batch BN leakage
(tools/train_video_contrast_dis.py:189-231): gather the key batch, apply a
shared random permutation so each GPU's BN sees other GPUs' samples, run
the EMA encoder with *local* BN, then unshuffle.

This framework's default is global-batch BN statistics (every BN reduction
spans the whole sharded batch under jit), which removes per-device leakage
by construction.  For bit-level behavioral parity with the reference,
``TPU.SHUFFLE_BN: True`` switches the key path to this implementation:

  1. globally permute the batch (one cross-chip resharding gather — cheaper
     than the reference's full all_gather of the batch to every GPU),
  2. run the encoder inside ``shard_map`` so BN reductions are LOCAL to
     each chip (per-GPU BN semantics),
  3. inverse-permute the features; ``pmean`` the updated BN statistics
     (the reference lets per-GPU stats drift and checkpoints rank 0's;
     averaging is the deterministic single-controller equivalent).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def shuffle_bn_apply(
    model,
    params,
    batch_stats,
    x: jnp.ndarray,
    key: jax.Array,
    mesh: Mesh,
    data_axis: str = "data",
    rngs: Any = None,
) -> Tuple[jnp.ndarray, Any]:
    """EMA-key forward with ShuffleBN semantics.

    ``x``: (B, ...) global batch (sharded over ``data_axis``).
    Returns (features (B, D), updated batch_stats).
    """
    b = x.shape[0]
    perm = jax.random.permutation(key, b)
    inv_perm = jnp.argsort(perm)
    x_shuf = jnp.take(x, perm, axis=0)

    def local_apply(params, stats, x_local):
        feat, muts = model.apply(
            {"params": params, "batch_stats": stats},
            x_local, train=True, mutable=["batch_stats"],
            rngs=rngs,
        )
        new_stats = jax.lax.pmean(muts["batch_stats"], data_axis)
        return feat, new_stats

    feat_shuf, new_stats = jax.shard_map(
        local_apply,
        mesh=mesh,
        in_specs=(P(), P(), P(data_axis)),
        out_specs=(P(data_axis), P()),
        check_vma=False,
    )(params, batch_stats, x_shuf)

    feat = jnp.take(feat_shuf, inv_perm, axis=0)
    return jax.lax.stop_gradient(feat), new_stats
