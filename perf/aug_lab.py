#!/usr/bin/env python
"""Stage-by-stage timing of the SSL augmentation chain on the chip."""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, sync, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from video_graph_ssl_tpu.data import transforms_device as td

    B, V, T, S = 128, 2, 16, 128
    OUT = (112, 112)
    mean = (0.485, 0.456, 0.406)
    std = (0.229, 0.224, 0.225)
    cd = jnp.bfloat16

    g = np.random.default_rng(0)
    raw = jnp.asarray(g.integers(0, 256, (B, V, T, S, S, 3), dtype=np.uint8))
    key = jax.random.key(0)

    def batched(per_clip):
        def fn(key, clips):
            b, v = clips.shape[0], clips.shape[1]
            keys = jax.random.split(key, b * v).reshape(b, v)
            return jax.vmap(jax.vmap(per_clip))(keys, clips)
        return jax.jit(fn)

    def sync(o):
        float(jnp.sum(o[0, 0, 0, 0, 0]).astype(jnp.float32))

    order = jnp.asarray([0, 1, 2, 3])

    stages = {}

    # full chain
    stages["full"] = batched(partial(
        td.ssl_augment_cf, out_hw=OUT, mean=mean, std=std,
        jitter_order=order, compute_dtype=cd))

    # rrc only (+ normalize)
    def rrc_only(k, clip):
        x = jnp.transpose(clip, (0, 3, 1, 2)).astype(cd)
        x = td._rrc_cf(k, x, OUT)
        return jnp.transpose(x, (0, 2, 3, 1))
    stages["rrc_only"] = batched(rrc_only)

    # jitter only (on pre-cropped 112)
    cropped = None

    def jitter_only(k, clip):
        x = jnp.transpose(clip, (0, 3, 1, 2)).astype(cd)[:, :, :OUT[0], :OUT[1]]
        x = td._color_jitter_cf(k, x, order)
        return x
    stages["jitter_only"] = batched(jitter_only)

    def hue_only(k, clip):
        x = jnp.transpose(clip, (0, 3, 1, 2)).astype(cd)[:, :, :OUT[0], :OUT[1]]
        return td._hue_cf(x, 0.05)
    stages["hue_only"] = batched(hue_only)

    def blur_only(k, clip):
        x = jnp.transpose(clip, (0, 3, 1, 2)).astype(cd)[:, :, :OUT[0], :OUT[1]]
        return td._blur_cf(k, x)
    stages["blur_only"] = batched(blur_only)

    def gray_flip_norm(k, clip):
        x = jnp.transpose(clip, (0, 3, 1, 2)).astype(cd)[:, :, :OUT[0], :OUT[1]]
        x = jnp.where(jax.random.uniform(k) < 0.2, td._gray_cf(x), x)
        x = jnp.where(jax.random.uniform(k) < 0.5, x[..., ::-1], x)
        m = jnp.asarray(mean, jnp.float32).reshape(1, 3, 1, 1) * 255.0
        s = jnp.asarray(std, jnp.float32).reshape(1, 3, 1, 1) * 255.0
        return ((x - m) / s).astype(cd)
    stages["gray_flip_norm"] = batched(gray_flip_norm)

    def transpose_only(k, clip):
        x = jnp.transpose(clip, (0, 3, 1, 2)).astype(cd)
        return jnp.transpose(x, (0, 2, 3, 1))[:, :OUT[0], :OUT[1], :]
    stages["transpose_rt"] = batched(transpose_only)

    for name, fn in stages.items():
        dt = timeit(lambda f=fn: f(key, raw), sync)
        print(f"{name:16s} {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
