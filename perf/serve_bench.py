#!/usr/bin/env python
"""Serving throughput of an exported artifact (tools/export_model.py).

Loads a serialized StableHLO artifact exactly the way a serving process
would (no model code, no config — just the blob + manifest), then measures
steady-state inference clips/s on the attached backend with the same
honest value-fetch sync as bench.py.

Run:  python perf/serve_bench.py export/encoder.stablehlo [--iters 50]
Prints one JSON line: {"metric": "serve_clips_per_sec", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=0,
                    help="only for polymorphic-batch artifacts")
    args = ap.parse_args()

    import jax

    with open(args.artifact, "rb") as f:
        exp = jax.export.deserialize(bytearray(f.read()))
    man_path = args.artifact.replace(".stablehlo", ".manifest.json")
    with open(man_path) as f:
        man = json.load(f)

    shape = list(man["input"]["shape"])
    if isinstance(shape[0], str):  # polymorphic batch
        shape[0] = args.batch or 64
    elif args.batch:
        raise SystemExit("--batch only applies to polymorphic artifacts")
    raw = np.random.default_rng(0).integers(0, 256, tuple(shape),
                                            dtype=np.uint8)

    call = jax.jit(exp.call)
    raw_dev = jax.device_put(raw)
    out = call(raw_dev)
    float(np.asarray(out).reshape(-1)[0])  # warm + hard sync

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = call(raw_dev)
        float(np.asarray(out).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)

    cps = shape[0] * args.iters / best
    print(json.dumps({
        "metric": "serve_clips_per_sec",
        "artifact": os.path.basename(args.artifact),
        "batch": shape[0],
        "value": round(cps, 2),
        "unit": "clips/s",
        "ms_per_batch": round(best / args.iters * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
