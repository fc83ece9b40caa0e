#!/usr/bin/env python
"""Max-pool backward on TPU: SelectAndScatter vs compare-mask custom VJP.

Every S3D/I3D inception block has a 3x3x3 stride-1 max-pool branch; the
stage lab shows block backward at 4-6x forward (healthy ~2x).  XLA lowers
max-pool's gradient to SelectAndScatter, which TPU executes poorly.  The
alternative: forward = reduce_window max (same), backward = sum over the
27 taps of dy * (x == window_max), all vectorized compares/adds.

Semantics note: where several inputs tie for the window max, the mask
variant sends the gradient to ALL of them (SelectAndScatter picks one).
With continuous activations ties have measure ~0; bf16 rounding makes
them possible but gradient-splitting is a standard, equally-valid
subgradient choice (it is what TF's one-hot maxpool grad does).

Run: python perf/maxpool_lab.py
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn()
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from video_graph_ssl_tpu.models.layers import max_pool_3d, max_pool_3d_ref

    B = args.batch
    bf16 = jnp.bfloat16
    cases = [
        ("m3x 16x14x14x256", (16, 14, 14, 256)),
        ("m3xpad 16x16x16x256", (16, 16, 16, 256)),
        ("m3xT 14x16x16x256", (14, 16, 16, 256)),
        ("m4x 8x7x7x512", (8, 7, 7, 512)),
        ("stem 16x56x56x64 s2", (16, 56, 56, 64)),
    ]
    g = np.random.default_rng(0)
    REP = 8

    for name, shape in cases:
        x = jnp.asarray(g.standard_normal((B, *shape), np.float32), bf16)
        stride = 2 if name.endswith("s2") else 1
        k, s, p = (3, 3, 3), (stride,) * 3, (1, 1, 1)

        for label, pool in (("lax", max_pool_3d_ref), ("mask", max_pool_3d)):
            def loss(xx):
                return jnp.sum(pool(xx, k, s, p).astype(jnp.float32) ** 2)

            @jax.jit
            def fwd(xx):
                def body(i, acc):
                    return acc + loss(xx + i.astype(bf16) * 1e-6)
                return jax.lax.fori_loop(0, REP, body, 0.0)

            @jax.jit
            def fb(xx):
                def body(i, acc):
                    l, gx = jax.value_and_grad(loss)(
                        xx + i.astype(bf16) * 1e-6)
                    return acc + l + jnp.sum(gx.astype(jnp.float32) ** 2)
                return jax.lax.fori_loop(0, REP, body, 0.0)

            dt_f = timeit(lambda: fwd(x)) / REP
            dt = timeit(lambda: fb(x)) / REP
            print(f"{name:22s} {label:5s} fwd {dt_f*1e3:7.2f} f+b "
                  f"{dt*1e3:7.2f} ms", flush=True)

        # numerics: identical forward; backward equal where no ties
        xs = jnp.asarray(g.standard_normal((2, 4, 8, 8, 16)), jnp.float32)
        f1 = max_pool_3d_ref(xs, k, s, p)
        f2 = max_pool_3d(xs, k, s, p)
        assert float(jnp.max(jnp.abs(f1 - f2))) == 0.0
        g1 = jax.jit(jax.grad(lambda v: jnp.sum(
            max_pool_3d_ref(v, k, s, p) ** 2)))(xs)
        g2 = jax.jit(jax.grad(lambda v: jnp.sum(
            max_pool_3d(v, k, s, p) ** 2)))(xs)
        err = float(jnp.max(jnp.abs(g1 - g2)))
        print(f"{name:22s} grad max-abs-diff {err:.2e} (0 iff no ties)",
              flush=True)


if __name__ == "__main__":
    main()
