#!/usr/bin/env python
"""Server-side XLA compiler-option sweep over the bench step.

``perf/xla_flag_sweep.py`` established that XLA_FLAGS / LIBTPU_INIT_ARGS
cannot reach the compiler through the axon relay: the env var is parsed by
the LOCAL client's flag registry (CPU-only) and compilation happens
server-side.  This sweep uses the other channel: ``jax.jit(...,
compiler_options=...)`` serializes the options into the compile request's
``env_option_overrides``, which the SERVER-side compiler parses — so
TPU-specific knobs become reachable without touching the relay host.

Each trial lowers+compiles the exact bench.py step (S3D MoCo fused step,
bs=128, visual_moco geometry) with one option set and times value-fetch
windows like bench.py.  Unknown/rejected options surface as a per-trial
compile error and are skipped.

Run (chip must be free): timeout 3000 python perf/compiler_options_sweep.py
            [--trials baseline vmem_96m ...] [--iters 20] [--windows 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRIALS = {
    "baseline": {},
    # scoped-vmem budget: lets fusions keep larger operands VMEM-resident
    # (v5e default is 64-128 MiB depending on toolchain)
    "vmem_48m": {"xla_tpu_scoped_vmem_limit_kib": "49152"},
    "vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "vmem_128m": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    # latency-hiding scheduler: extra rerun with a larger memory cushion /
    # disabled entirely (isolates whether LHS helps this conv-bound step)
    "lhs_rerun2": {"xla_latency_hiding_scheduler_rerun": "2"},
    "lhs_off": {"xla_tpu_enable_latency_hiding_scheduler": "False"},
    # more aggressive multi-output / nested-loop fusion
    "scavenge": {"xla_tpu_scavenge_vmem_for_fusions": "True"},
    "flm_cost": {"xla_tpu_use_experimental_fusion_cost_model": "True"},
    "licm2x": {"xla_tpu_licm_size_inflation_ratio": "2.0"},
    # combine the winners manually after a first pass, e.g.:
    "vmem96_rerun": {"xla_tpu_scoped_vmem_limit_kib": "98304",
                     "xla_latency_hiding_scheduler_rerun": "2"},
    # r4 combined trials (r3 best was scavenge, within relay noise alone)
    "scavenge_licm": {"xla_tpu_scavenge_vmem_for_fusions": "True",
                      "xla_tpu_licm_size_inflation_ratio": "2.0"},
    "scavenge_vmem96": {"xla_tpu_scavenge_vmem_for_fusions": "True",
                        "xla_tpu_scoped_vmem_limit_kib": "98304"},
    "scavenge_flm": {"xla_tpu_scavenge_vmem_for_fusions": "True",
                     "xla_tpu_use_experimental_fusion_cost_model": "True"},
}


def build_step_and_batch(cfg_overrides=()):
    import jax

    from video_graph_ssl_tpu.config import cfg as CFG
    from video_graph_ssl_tpu.engine import (
        create_pretrain_state,
        make_fused_pretrain_step,
    )
    from video_graph_ssl_tpu.models import create_visual_model
    from video_graph_ssl_tpu.parallel import (
        make_mesh,
        replicate_state,
        shard_batch,
    )

    cfg = CFG.clone()
    cfg.merge_from_file(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs/visual_moco.yaml"))
    cfg.DATASET.SOURCE = "synthetic"
    if cfg_overrides:
        cfg.merge_from_list(list(cfg_overrides))
    batch_size = int(os.environ.get("VGS_BENCH_BS", "128"))
    t = int(cfg.INPUT.VIDEO_LENGTH)
    canvas = (int(cfg.INPUT.SCALE_SIZE[0]), int(cfg.INPUT.SCALE_SIZE[1]))

    mesh = make_mesh((-1,), ("data",))
    model, _ = create_visual_model(cfg)
    example = np.zeros(
        (2, t, int(cfg.INPUT.BASE_SIZE[0]), int(cfg.INPUT.BASE_SIZE[1]), 3),
        np.float32)
    state, tx = create_pretrain_state(cfg, model, example, n_data=1000)
    state = replicate_state(state, mesh)

    step = make_fused_pretrain_step(cfg, model, tx, n_data=1000)

    g = np.random.default_rng(0)
    batch = {
        "clips": g.integers(0, 256, (batch_size, 2, t, *canvas, 3),
                            dtype=np.uint8),
        "label": np.zeros(batch_size, np.int32),
        "index": np.arange(batch_size, dtype=np.int32),
    }
    batch = shard_batch(batch, mesh)
    return step, state, batch, batch_size


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", nargs="*", default=list(TRIALS))
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--opts", nargs="*", default=[],
                    help="config overrides, e.g. --opts MODEL.AUG_FLAG True "
                         "(sweep the GCA headline step)")
    args = ap.parse_args()

    import jax

    step_fn, state0, batch, batch_size = build_step_and_batch(args.opts)
    results = []
    for name in args.trials:
        opts = TRIALS[name]
        rec = {"trial": name, "options": opts}
        try:
            t0 = time.perf_counter()
            step = jax.jit(step_fn, donate_argnums=0,
                           compiler_options=opts or None)
            # fresh (replicated, hence cheap) copy of the donated state tree
            state = jax.tree_util.tree_map(
                lambda x: jax.numpy.array(x), state0)
            for _ in range(3):
                state, metrics = step(state, batch, 0.06)
            float(metrics["loss"])
            rec["compile_s"] = round(time.perf_counter() - t0, 1)
            best = float("inf")
            for _ in range(args.windows):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    state, metrics = step(state, batch, 0.06)
                float(metrics["loss"])
                best = min(best, time.perf_counter() - t0)
            rec["clips_per_sec"] = round(batch_size * args.iters / best, 1)
            rec["ms_per_step"] = round(best / args.iters * 1e3, 2)
            del state
        except Exception as e:  # noqa: BLE001 — per-trial isolation
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
        results.append(rec)
        print(json.dumps(rec), flush=True)

    ok = [r for r in results if "clips_per_sec" in r]
    if ok:
        best = max(ok, key=lambda r: r["clips_per_sec"])
        # JSON record (not a comment) so the output stays valid JSON-lines
        print(json.dumps({"summary":
                          f"best: {best['trial']} "
                          f"{best['clips_per_sec']} clips/s",
                          "opts": args.opts}), flush=True)


if __name__ == "__main__":
    main()
