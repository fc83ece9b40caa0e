"""First-conv channel inflation for non-RGB modalities.

Counterpart of the reference's flow-model construction
(lib/modeling/visual_wrappers.py:214-235): when fine-tuning an
RGB-pretrained network on optical flow (2·new_length input channels), the
first conv's kernel is replaced by its mean over the RGB input-channel
axis, broadcast to the new channel count.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


def _find_first_conv(params, old_in_channels: int = 3) -> Tuple[tuple, Any]:
    """Locate the stem conv kernel: the conv (rank>=4 'kernel' leaf) whose
    input-channel dim equals ``old_in_channels`` — pytree traversal order is
    alphabetical, so 'first in the network' must be found structurally."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    hits = []
    for path, leaf in flat:
        names = [str(getattr(p, "key", "")) for p in path]
        if names and names[-1] == "kernel" and hasattr(leaf, "ndim") \
                and leaf.ndim >= 4 and leaf.shape[-2] == old_in_channels:
            hits.append((path, leaf))
    if not hits:
        raise ValueError(
            f"no conv kernel with {old_in_channels} input channels found")
    if len(hits) > 1:
        raise ValueError(
            f"ambiguous stem conv: {[h[0] for h in hits]}")
    return hits[0]


def inflate_first_conv(params, new_in_channels: int,
                       old_in_channels: int = 3):
    """Return params with the stem conv kernel inflated to
    ``new_in_channels`` input channels (mean over the old channel axis,
    tiled — reference visual_wrappers.py:221-229)."""
    path, kernel = _find_first_conv(params, old_in_channels)
    # flax conv kernels: (..., in, out); channels-last layout
    mean = jnp.mean(kernel, axis=-2, keepdims=True)
    new_kernel = jnp.tile(mean, [1] * (kernel.ndim - 2)
                          + [new_in_channels, 1])

    def replace(p, leaf):
        return new_kernel if p == path else leaf

    return jax.tree_util.tree_map_with_path(replace, params)
