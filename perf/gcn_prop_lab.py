#!/usr/bin/env python
"""Isolated GCN-propagation kernel bench: layout-native Pallas vs XLA einsum.

Measures ``ops/pallas/gcn_propagate.py`` (VERDICT r4 item 1) at the exact
(B,T,H,W,C) activation shapes the three S3D aug points produce under the
bench config (B=128 clips x 2 views), fwd and fwd+bwd, against the XLA
``bij,bjhwc`` einsum it would replace (reference op:
lib/ops/module_wrappers/temporal_graph.py:56-64).

Also the ADVICE-r4 compile probe: prod widths (28/14/7) are not sublane-tile
multiples, so the in-kernel (t,w,c)->(t,w*c) reshape may hit the same Mosaic
relayout reject class as the r3 sepconv kernels. A compile failure here IS a
result — record it in the ledger.

Run on the chip: python perf/gcn_prop_lab.py [--cases idx5 ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (B, T, H, W, C) at each S3D aug point under the bench geometry.
CASES = {
    "idx5": (256, 16, 28, 28, 192),
    "idx9": (256, 8, 14, 14, 512),
    "idx14": (256, 4, 7, 7, 832),
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

    from video_graph_ssl_tpu.ops.pallas.gcn_propagate import (
        gcn_propagate, propagate_xla)

    g = np.random.default_rng(0)
    for name in args.cases:
        b, t, h, w, c = CASES[name]
        x = jnp.asarray(g.standard_normal((b, t, h, w, c), np.float32) * 0.05,
                        jnp.bfloat16)
        adj = jnp.asarray(
            jax.nn.softmax(g.standard_normal((b, t, t), np.float32), -1),
            jnp.bfloat16)

        def xla_loss(a, xx):
            return jnp.sum(propagate_xla(a, xx).astype(jnp.float32) ** 2)

        def pal_loss(a, xx):
            return jnp.sum(gcn_propagate(a, xx).astype(jnp.float32) ** 2)

        row = [f"{name:6s} b{b} t{t} h{h} w{w} c{c}"]
        variants = () if args.skip_xla else (("xla", xla_loss),)
        if not args.skip_pallas:
            variants += (("pallas", pal_loss),)
        for label, loss in variants:
            fwd = jax.jit(loss)
            grad = jax.jit(jax.value_and_grad(loss, (0, 1)))
            tc0 = time.perf_counter()
            try:
                dt_f = timeit(lambda: fwd(adj, x))
                dt_fb = timeit(lambda: grad(adj, x))
            except Exception as e:  # Mosaic reject is a result, not a crash
                row.append(f"{label} COMPILE-FAIL: {type(e).__name__}: "
                           f"{str(e)[:200]}")
                continue
            compile_s = time.perf_counter() - tc0
            row.append(f"{label} fwd {dt_f*1e3:6.2f}ms "
                       f"f+b {dt_fb*1e3:6.2f}ms (compile {compile_s:4.0f}s)")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()
