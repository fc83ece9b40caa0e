#!/usr/bin/env python
"""Isolated graph-adjacency kernel bench: Pallas vs XLA (VERDICT r1 item 3).

Times fwd and fwd+bwd of the sampled-adjacency block at the exact shapes the
three S3D aug points produce under the bench config (B=128 clips x 2 views):

  idx5  : (256, 16, 18816)   192ch @ 28^2 -> inter 96,  pooled 14^2
  idx9  : (256,  8, 12544)   512ch @ 14^2 -> inter 256, pooled 7^2
  idx14 : (256,  4,  6656)   832ch @  7^2 -> inter 416, pooled 4^2 (ceil)

Run on the chip: python perf/graph_lab.py [--cases idx5 ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = {
    "idx5": (256, 16, 18816),
    "idx9": (256, 8, 12544),
    "idx14": (256, 4, 6656),
}


def timeit(fn, iters=10, warmup=1):
    import jax

    for _ in range(warmup):
        out = fn()
    out = jax.tree_util.tree_leaves(out)[0]
    float(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    out = jax.tree_util.tree_leaves(out)[0]
    float(out.reshape(-1)[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", nargs="*", default=list(CASES))
    ap.add_argument("--skip_pallas", action="store_true")
    ap.add_argument("--skip_xla", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from video_graph_ssl_tpu.ops.pallas.graph_kernel import (
        graph_adjacency, graph_adjacency_xla)
    from video_graph_ssl_tpu.ops.temporal_graph import hop_weight_matrix

    g = np.random.default_rng(0)
    for name in args.cases:
        b, t, d = CASES[name]
        q = jnp.asarray(g.standard_normal((b, t, d), np.float32) * 0.05,
                        jnp.bfloat16)
        k = jnp.asarray(g.standard_normal((b, t, d), np.float32) * 0.05,
                        jnp.bfloat16)
        theta = jnp.asarray(hop_weight_matrix(t, 3, 0.5))
        key = jax.random.key(0)
        seed = jnp.float32(1234.0)

        def xla_loss(qq, kk):
            adj = graph_adjacency_xla(qq, kk, theta, key, 1.0, True)
            return jnp.sum(adj.astype(jnp.float32) ** 2)

        def pal_loss(qq, kk):
            adj = graph_adjacency(qq, kk, theta, seed, 1.0, True)
            return jnp.sum(adj.astype(jnp.float32) ** 2)

        row = [f"{name:6s} b{b} t{t} d{d}"]
        variants = () if args.skip_xla else (("xla", xla_loss),)
        if not args.skip_pallas:
            variants += (("pallas", pal_loss),)
        for label, loss in variants:
            fwd = jax.jit(loss)
            grad = jax.jit(jax.value_and_grad(loss, (0, 1)))
            tc0 = time.perf_counter()
            dt_f = timeit(lambda: fwd(q, k))
            dt_fb = timeit(lambda: grad(q, k))
            compile_s = time.perf_counter() - tc0
            row.append(f"{label} fwd {dt_f*1e3:6.2f}ms "
                       f"f+b {dt_fb*1e3:6.2f}ms (compile {compile_s:4.0f}s)")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
