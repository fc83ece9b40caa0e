#!/usr/bin/env python
"""Per-stage fwd / fwd+bwd timing of the S3D backbone on the chip.

Each stage is timed in isolation with its real input shape (bs=128, T=16,
112x112 input, bf16): grads wrt that stage's params only — mirrors the
cost structure of the full backward.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

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
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--t", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from video_graph_ssl_tpu.models.layers import (
        BasicConv3d, InceptionBlock, SepConv3d)
    from video_graph_ssl_tpu.models.s3d import _MIXED_SPECS

    B, T = args.batch, args.t
    bf16 = jnp.bfloat16

    # (name, module ctor, input shape (t, h, w, c))
    stages = [
        ("stem_0 sep7s2", lambda: SepConv3d(64, 7, 2, 3, dtype=bf16),
         (T, 112, 112, 3)),
        ("stem_2 1x1", lambda: BasicConv3d(64, 1, dtype=bf16),
         (T, 28, 28, 64)),
        ("stem_3 sep3", lambda: SepConv3d(192, 3, 1, 1, dtype=bf16),
         (T, 28, 28, 64)),
        ("mixed_3b", lambda: InceptionBlock(*_MIXED_SPECS["mixed_3b"], dtype=bf16),
         (T, 14, 14, 192)),
        ("mixed_3c", lambda: InceptionBlock(*_MIXED_SPECS["mixed_3c"], dtype=bf16),
         (T, 14, 14, 256)),
        ("mixed_4b", lambda: InceptionBlock(*_MIXED_SPECS["mixed_4b"], dtype=bf16),
         (T // 2, 7, 7, 480)),
        ("mixed_4c", lambda: InceptionBlock(*_MIXED_SPECS["mixed_4c"], dtype=bf16),
         (T // 2, 7, 7, 512)),
        ("mixed_4d", lambda: InceptionBlock(*_MIXED_SPECS["mixed_4d"], dtype=bf16),
         (T // 2, 7, 7, 512)),
        ("mixed_4e", lambda: InceptionBlock(*_MIXED_SPECS["mixed_4e"], dtype=bf16),
         (T // 2, 7, 7, 512)),
        ("mixed_4f", lambda: InceptionBlock(*_MIXED_SPECS["mixed_4f"], dtype=bf16),
         (T // 2, 7, 7, 528)),
        ("mixed_5b", lambda: InceptionBlock(*_MIXED_SPECS["mixed_5b"], dtype=bf16),
         (T // 4, 3, 3, 832)),
        ("mixed_5c", lambda: InceptionBlock(*_MIXED_SPECS["mixed_5c"], dtype=bf16),
         (T // 4, 3, 3, 832)),
    ]

    g = np.random.default_rng(0)
    total_f = total_fb = 0.0
    print(f"batch={B} t={T}")
    for name, ctor, shape in stages:
        mod = ctor()
        x = jnp.asarray(g.standard_normal((B, *shape), np.float32), bf16)
        variables = jax.jit(mod.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=False)
        params, bs = variables["params"], variables.get("batch_stats", {})

        REP = 8  # amortize per-dispatch relay overhead inside one jit

        def one(p, xx, mod=mod, b=bs):
            out, _ = mod.apply({"params": p, "batch_stats": b}, xx,
                               train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)

        @jax.jit
        def fwd(p, xx):
            def body(i, acc):
                return acc + one(p, xx + i.astype(bf16) * 1e-6)
            return jax.lax.fori_loop(0, REP, body, 0.0)

        @jax.jit
        def fwdbwd(p, xx):
            # grads wrt params AND input: the full backward work of the
            # stage inside the model's chain (dx feeds the stage below)
            def body(i, acc):
                l, (gp, gx) = jax.value_and_grad(one, (0, 1))(
                    p, xx + i.astype(bf16) * 1e-6)
                return acc + l + jnp.sum(gx.astype(jnp.float32) ** 2) \
                    + jax.tree.reduce(
                        lambda a, v: a + jnp.sum(v.astype(jnp.float32) ** 2),
                        gp, 0.0)
            return jax.lax.fori_loop(0, REP, body, 0.0)

        dt_f = timeit(lambda: fwd(params, x), lambda o: float(o)) / REP
        dt_fb = timeit(lambda: fwdbwd(params, x), lambda o: float(o)) / REP
        total_f += dt_f
        total_fb += dt_fb
        print(f"{name:14s} fwd {dt_f*1e3:7.2f} ms   fwd+bwd {dt_fb*1e3:7.2f} ms"
              f"   bwd-only {(dt_fb-dt_f)*1e3:7.2f} ms")
    print(f"{'TOTAL':14s} fwd {total_f*1e3:7.2f} ms   fwd+bwd {total_fb*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
