#!/usr/bin/env python
"""Throughput across training regimes on the chip (VERDICT r1 item 3).

Measures the fused pretrain step for:
  moco            — bench.py's headline config
  simsiam         — two encoder passes with grads
  bank            — memory-bank NCE regime
  moco+graph      — MODEL.AUG_FLAG=True, XLA graph path
  moco+graph-pal  — MODEL.AUG_FLAG=True, GRAPH.USE_PALLAS=True

Same honest timing as bench.py (value-fetch sync).  Prints one line per
regime; results are recorded in NOTES_NEXT_ROUND.md / README.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(overrides, batch_size=128, iters=20):
    import jax

    from video_graph_ssl_tpu.config import cfg as CFG
    from video_graph_ssl_tpu.engine import (create_pretrain_state,
                                            make_fused_pretrain_step)
    from video_graph_ssl_tpu.models import create_visual_model
    from video_graph_ssl_tpu.parallel import (make_mesh, replicate_state,
                                              shard_batch)

    cfg = CFG.clone()
    cfg.merge_from_file("configs/visual_moco.yaml")
    cfg.DATASET.SOURCE = "synthetic"
    if overrides:
        cfg.merge_from_list(overrides)

    t = int(cfg.INPUT.VIDEO_LENGTH)
    canvas = (int(cfg.INPUT.SCALE_SIZE[0]), int(cfg.INPUT.SCALE_SIZE[1]))
    mesh = make_mesh((-1,), ("data",))
    model, _ = create_visual_model(cfg)
    base = (int(cfg.INPUT.BASE_SIZE[0]), int(cfg.INPUT.BASE_SIZE[1]))
    # simsiam consumes both views inside the model: (B, V, T, H, W, C)
    eshape = ((2, 2, t, *base, 3) if cfg.CONTRAST.MEM_TYPE == "simsiam"
              else (2, t, *base, 3))
    example = np.zeros(eshape, np.float32)
    state, tx = create_pretrain_state(cfg, model, example, n_data=1000)
    state = replicate_state(state, mesh)
    step = jax.jit(make_fused_pretrain_step(cfg, model, tx, n_data=1000),
                   donate_argnums=0)

    g = np.random.default_rng(0)
    batch = {
        "clips": g.integers(0, 256, (batch_size, 2, t, *canvas, 3),
                            dtype=np.uint8),
        "label": np.zeros(batch_size, np.int32),
        "index": np.arange(batch_size, dtype=np.int32),
    }
    batch = shard_batch(batch, mesh)

    for _ in range(3):
        state, metrics = step(state, batch, 0.06)
    float(metrics["loss"])
    # best of 3 windows, like bench.py: relay stalls only ever subtract
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch, 0.06)
        float(metrics["loss"])
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    del state, step
    return dt, batch_size / dt


def measure_inference(kind: str, batch_size=128, iters=20):
    """Eval/retrieval throughput (clips/s): the jitted multi-crop eval
    logits path (tools/test_ds.py) or the encoder-feature path
    (tools/video_retrieval.py), with the device resize/center-crop chain
    fused in."""
    import jax

    from video_graph_ssl_tpu.config import cfg as CFG
    from video_graph_ssl_tpu.data.transforms_device import make_batch_augment_fn
    from video_graph_ssl_tpu.engine import create_downstream_state
    from video_graph_ssl_tpu.models import create_video_model
    from video_graph_ssl_tpu.parallel import make_mesh, replicate_state, shard_batch

    cfg = CFG.clone()
    cfg.merge_from_file("configs/visual_moco.yaml")
    cfg.DATASET.SOURCE = "synthetic"
    cfg.DATASET.NUM_CLASS = 101
    t = int(cfg.INPUT.VIDEO_LENGTH)
    canvas = (int(cfg.INPUT.SCALE_SIZE[0]), int(cfg.INPUT.SCALE_SIZE[1]))
    base = (int(cfg.INPUT.BASE_SIZE[0]), int(cfg.INPUT.BASE_SIZE[1]))
    mesh = make_mesh((-1,), ("data",))
    model, _ = create_video_model(cfg)
    state, _tx = create_downstream_state(
        cfg, model, np.zeros((2, t, *base, 3), np.float32))
    state = replicate_state(state, mesh)
    augment = make_batch_augment_fn(cfg, "eval")
    method = "encode" if kind == "features" else None

    @jax.jit
    def step(st, raw):
        clips = augment(raw)
        variables = {"params": st.params, "batch_stats": st.batch_stats}
        if method:
            return model.apply(variables, clips, train=False, method=method)
        return model.apply(variables, clips, train=False)

    g = np.random.default_rng(0)
    raw = g.integers(0, 256, (batch_size, t, *canvas, 3), dtype=np.uint8)
    raw = shard_batch({"clips": raw}, mesh)["clips"]
    out = step(state, raw)
    float(out.reshape(-1)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(state, raw)
        float(out.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    return dt, batch_size / dt


REGIMES = {
    "moco": [],
    "moco+s2d": ["TPU.STEM_S2D", "full"],     # space-to-depth stem (exact)
    "moco+s2d-sp": ["TPU.STEM_S2D", "spatial"],   # spatial conv only
    "moco+pack": ["TPU.PACK_POINTWISE", "True"],  # packed 1x1x1 branches
    "moco+remat": ["TPU.REMAT", "True"],      # recompute bwd (HBM relief)
    "moco+remat_convsaved": ["TPU.REMAT", "True",
                             "TPU.REMAT_POLICY", "conv_saved"],
    "moco+remat+pack": ["TPU.REMAT", "True", "TPU.PACK_POINTWISE", "True"],
    "moco+fusedsep": ["TPU.SEPCONV_FUSED", "True"],  # Pallas 3-sweep bwd
    "simsiam": ["CONTRAST.MEM_TYPE", "simsiam"],
    "bank": ["CONTRAST.MEM_TYPE", "bank"],
    # pin both GRAPH.USE_PALLAS values explicitly (default flipped to
    # False 08-18 after two full-step sweeps showed XLA a hair ahead)
    "moco+graph": ["MODEL.AUG_FLAG", "True", "GRAPH.USE_PALLAS", "False"],
    "moco+graph-pal": ["MODEL.AUG_FLAG", "True", "GRAPH.USE_PALLAS", "True"],
    # layout-native GCN propagation kernel (ops/pallas/gcn_propagate.py).
    # NOTE r5: the kernel is gated on C % 128 == 0 (Mosaic rejects other
    # widths — perf/CHIP_QUEUE_r05.jsonl), so in the S3D graph this row
    # exercises it at aug idx9 (c=512) only; idx5/idx14 fall back to XLA.
    "moco+graph-prop": ["MODEL.AUG_FLAG", "True",
                        "GRAPH.PROPAGATE_PALLAS", "True"],
    # paired PACK_POINTWISE re-judge on the GCA step (standing item:
    # fresh default sweeps each round)
    "moco+graph-nopack": ["MODEL.AUG_FLAG", "True",
                          "TPU.PACK_POINTWISE", "False"],
    # inference rows (VERDICT r3 item 8): eval logits / retrieval features
    "eval": "eval",
    "features": "features",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regimes", nargs="*", default=list(REGIMES))
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    for name in args.regimes:
        try:
            spec = REGIMES[name]
            if isinstance(spec, str):
                dt, cps = measure_inference(spec, args.batch, args.iters)
            else:
                dt, cps = measure(spec, args.batch, args.iters)
            print(f"{name:15s} {dt*1e3:7.2f} ms/step  {cps:8.1f} clips/s",
                  flush=True)
        except Exception as e:  # keep the sweep alive past one bad regime
            print(f"{name:15s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
