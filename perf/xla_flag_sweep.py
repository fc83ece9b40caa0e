#!/usr/bin/env python
"""XLA/libtpu flag sweep over bench.py (cheap, data-driven).

Each candidate runs `python bench.py` in a subprocess with XLA_FLAGS (or
LIBTPU_INIT_ARGS) set, so every trial gets a fresh backend. Flags tried
are the documented/low-risk scheduling knobs; anything that fails to
parse or crashes the run is reported and skipped. One trial ~3-5 min on
a healthy relay (compile dominates).

Run: timeout 3600 python perf/xla_flag_sweep.py [--trials baseline vmem ...]

MEASURED OUTCOME (08-18, axon relay): every TPU-specific flag ABORTS in
the local client (`parse_flags_from_env.cc: Unknown flag in XLA_FLAGS`)
— the relay client links only the CPU XLA flag registry, and compilation
happens server-side where local XLA_FLAGS don't reach anyway.  Flag
tuning is unreachable through this dev relay; re-run the sweep on a
directly-attached TPU host where libtpu parses the flags.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRIALS = {
    "baseline": {},
    # bigger scoped-vmem budget: lets the scheduler keep larger fusion
    # operands resident (default 64-128 MiB region depending on version)
    "vmem_96m": {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=98304"},
    "vmem_128m": {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=131072"},
    # latency-hiding scheduler aggressiveness
    "async_all": {"XLA_FLAGS":
                  "--xla_tpu_enable_async_collective_fusion=true"},
    # retry the latency-hiding scheduler with a larger memory cushion
    "lhs_rerun": {"XLA_FLAGS": "--xla_latency_hiding_scheduler_rerun=2"},
}


def run_trial(name: str, env_extra: dict) -> dict:
    env = dict(os.environ)
    env.update(env_extra)
    try:
        out = subprocess.run(
            [sys.executable, "bench.py"], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=900)
    except subprocess.TimeoutExpired:
        return {"trial": name, "error": "timeout"}
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not line:
        return {"trial": name, "error": (out.stderr or out.stdout)[-300:]}
    rec = json.loads(line[-1])
    rec["trial"] = name
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", nargs="*", default=list(TRIALS))
    args = ap.parse_args()
    results = []
    for name in args.trials:
        rec = run_trial(name, TRIALS[name])
        results.append(rec)
        print(json.dumps(rec), flush=True)
    ok = [r for r in results if "value" in r]
    if ok:
        best = max(ok, key=lambda r: r["value"])
        print(f"# best: {best['trial']} {best['value']} clips/s", flush=True)


if __name__ == "__main__":
    main()
