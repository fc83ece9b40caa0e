#!/usr/bin/env python
"""Perf lab: break the flagship fused MoCo step into timed pieces on the
real chip.  Not part of the package — experiment harness for round-2 perf
work (VERDICT.md next-round item 2).

Timing convention: value-fetch sync (float(x)), never block_until_ready
(a no-op over the axon relay).
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
    ap.add_argument("--what", default="all",
                    help="comma list: fused,inner,aug,fwd,fwdbwd,key")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from video_graph_ssl_tpu.config import cfg as CFG
    from video_graph_ssl_tpu.data.transforms_device import make_batch_augment_fn
    from video_graph_ssl_tpu.engine import (
        create_pretrain_state,
        make_fused_pretrain_step,
        make_pretrain_step,
    )
    from video_graph_ssl_tpu.models import create_visual_model
    from video_graph_ssl_tpu.parallel import make_mesh, replicate_state, shard_batch

    cfg = CFG.clone()
    cfg.merge_from_file("configs/visual_moco.yaml")
    cfg.DATASET.SOURCE = "synthetic"

    B = args.batch
    t = int(cfg.INPUT.VIDEO_LENGTH)
    canvas = (int(cfg.INPUT.SCALE_SIZE[0]), int(cfg.INPUT.SCALE_SIZE[1]))
    base = (int(cfg.INPUT.BASE_SIZE[0]), int(cfg.INPUT.BASE_SIZE[1]))

    mesh = make_mesh((-1,), ("data",))
    model, _ = create_visual_model(cfg)
    example = np.zeros((2, t, *base, 3), np.float32)
    state, tx = create_pretrain_state(cfg, model, example, n_data=1000)
    state = replicate_state(state, mesh)
    # donation-safe snapshot: restore a fresh device copy per experiment
    def _get(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            return ("__key__", np.asarray(jax.device_get(jax.random.key_data(x))))
        return np.asarray(jax.device_get(x))

    state_host = jax.tree.map(_get, state)

    def _put(x):
        if isinstance(x, tuple) and len(x) == 2 and x[0] == "__key__":
            return jax.random.wrap_key_data(jnp.asarray(x[1]))
        return np.asarray(x)

    def fresh_state():
        import jax.numpy as jnp  # noqa: F811
        return replicate_state(
            jax.tree.map(
                _put, state_host,
                is_leaf=lambda v: (isinstance(v, tuple) and len(v) == 2
                                   and isinstance(v[0], str)
                                   and v[0] == "__key__")),
            mesh)

    g = np.random.default_rng(0)
    raw = {
        "clips": g.integers(0, 256, (B, 2, t, *canvas, 3), dtype=np.uint8),
        "label": np.zeros(B, np.int32),
        "index": np.arange(B, dtype=np.int32),
    }
    raw = shard_batch(raw, mesh)

    what = set(args.what.split(","))
    results = {}

    def sync_state(out):
        float(out[1]["loss"])

    if what & {"all", "fused"}:
        step = jax.jit(make_fused_pretrain_step(cfg, model, tx, n_data=1000),
                       donate_argnums=0)
        s = fresh_state()
        def run():
            nonlocal s
            s, m = step(s, raw, 0.06)
            return (s, m)
        dt = timeit(run, sync_state)
        results["fused_step"] = dt
        del s, step

    # pre-augmented float clips for the inner-step measurements
    augment = jax.jit(make_batch_augment_fn(cfg, "ssl"))
    key = jax.random.key(0)
    clips = augment(key, raw["clips"])
    float(jnp.sum(clips[0, 0, 0, 0, 0]))
    batch = {"clips": clips, "label": raw["label"], "index": raw["index"]}

    if what & {"all", "aug"}:
        def run_aug():
            return augment(key, raw["clips"])
        dt = timeit(lambda: run_aug(), lambda o: float(o[0, 0, 0, 0, 0, 0]))
        results["aug_only"] = dt

    if what & {"all", "inner"}:
        inner = jax.jit(make_pretrain_step(cfg, model, tx, n_data=1000),
                        donate_argnums=0)
        s = fresh_state()
        def run_inner():
            nonlocal s
            s, m = inner(s, batch, 0.06)
            return (s, m)
        dt = timeit(run_inner, sync_state)
        results["inner_step"] = dt
        del s, inner

    if what & {"all", "fwd", "key", "fwdbwd"}:
        x1 = batch["clips"][:, 0]

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        rngs = {"dropout": jax.random.key(1), "graph": jax.random.key(2)}

        if what & {"all", "fwd"}:
            @jax.jit
            def fwd(params, bs, x):
                out, muts = model.apply(
                    {"params": params, "batch_stats": bs}, x, train=True,
                    rngs=rngs, mutable=["batch_stats"])
                return jnp.sum(out)
            dt = timeit(lambda: fwd(state.params, state.batch_stats, x1),
                        lambda o: float(o))
            results["fwd_query"] = dt

        if what & {"all", "fwdbwd"}:
            @jax.jit
            def fwdbwd(params, bs, x):
                def f(p):
                    out, muts = model.apply(
                        {"params": p, "batch_stats": bs}, x, train=True,
                        rngs=rngs, mutable=["batch_stats"])
                    return jnp.sum(out * out)
                l, gr = jax.value_and_grad(f)(params)
                gsum = jax.tree.reduce(
                    lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
                    gr, 0.0)
                return l + gsum
            dt = timeit(lambda: fwdbwd(state.params, state.batch_stats, x1),
                        lambda o: float(o))
            results["fwdbwd_query"] = dt

    print(f"batch={B} views=2 t={t} base={base}")
    for k, v in results.items():
        clips_s = 0.0
        if k in ("fused_step", "inner_step"):
            clips_s = B / v
        print(f"{k:14s} {v*1e3:8.2f} ms" +
              (f"  ({clips_s:7.1f} clips/s)" if clips_s else ""))


if __name__ == "__main__":
    main()
