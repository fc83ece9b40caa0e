#!/usr/bin/env python
"""Sequence-parallel scaling table (VERDICT r4 item 7).

Characterizes ``parallel/sequence.py`` (the SURVEY §5 long-clip extension:
frame axis sharded over a ``seq`` mesh axis, ppermute ring exchange) beyond
the correctness pins in tests/test_sequence_parallel.py: one table of
wall-time + per-device resident activation bytes over T x seq-degree.

Run on the fake mesh (the real fleet is 1 chip; ring steps there are
inter-process memcpys, so the WALL numbers characterize schedule overhead
shape, not ICI bandwidth — the resident-bytes column is the exact
device-memory story, which is the property that makes T >> VMEM feasible):

  PYTHONPATH= JAX_PLATFORMS=cpu JAX_NUM_CPU_DEVICES=8 \
      python perf/seq_scaling_lab.py --jsonl perf/SEQ_SCALING_r05.jsonl

Caveat recorded in each row: on the fake CPU mesh every 'device' shares
one host core, so wall time tracks TOTAL work (expect roughly flat-or-worse
with seq degree); the meaningful scaling column is bytes_per_device, which
drops 1/P, plus the fact that the T=128 geometry runs at all degrees.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", nargs="*", type=int, default=[64, 128])
    ap.add_argument("--seq", nargs="*", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--hw", type=int, default=8)
    ap.add_argument("--c", type=int, default=12)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--jsonl", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from video_graph_ssl_tpu.ops.temporal_graph import TemporalGraphAug
    from video_graph_ssl_tpu.parallel import make_mesh
    from video_graph_ssl_tpu.parallel.sequence import sp_graph_aug_apply

    devs = jax.devices()
    g = np.random.default_rng(0)
    rows = []
    for t in args.t:
        x = jnp.asarray(g.normal(
            size=(args.b, t, args.hw, args.hw, args.c)).astype(np.float32))
        mod = TemporalGraphAug(num_gcn_layers=2, dtype=jnp.float32)
        variables = jax.jit(
            lambda xx: mod.init(jax.random.PRNGKey(0), xx, train=False))(x)
        for p in args.seq:
            if p > len(devs) or t % p:
                continue
            mesh = make_mesh((p,), ("seq",), devices=devs[:p])
            spec = P(None, "seq")

            def body(xl):
                return sp_graph_aug_apply(
                    variables, xl, axis="seq", tem_len=t,
                    sampler="none", dtype=jnp.float32)

            fn = jax.jit(shard_map(body, mesh=mesh, in_specs=(spec,),
                                   out_specs=spec, check_rep=False))
            xs = jax.device_put(x, NamedSharding(mesh, spec))
            tc0 = time.perf_counter()
            out = fn(xs)
            out.block_until_ready()
            compile_s = time.perf_counter() - tc0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(xs)
            out.block_until_ready()
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            # resident activation per device: the local x shard + one
            # rotating support block (ring_propagate's carry) — the
            # O(one block) property; fp32 here, bf16 in prod.
            blk = args.b * (t // p) * args.hw * args.hw * args.c * 4
            row = {"T": t, "seq": p, "ms_per_call": round(ms, 2),
                   "compile_s": round(compile_s, 1),
                   "bytes_per_device": 2 * blk,
                   "backend": jax.default_backend(),
                   "caveat": "fake mesh: all devices share one host core; "
                             "wall tracks total work, bytes track 1/P"}
            rows.append(row)
            print(json.dumps(row), flush=True)
    if args.jsonl:
        with open(args.jsonl, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
