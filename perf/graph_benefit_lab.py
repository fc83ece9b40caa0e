#!/usr/bin/env python
"""Does the GCA graph module actually help? (VERDICT r3 item 2)

A/B: pretrain with MODEL.AUG_FLAG=True vs False on the temporal-motion
synthetic set (class signal lives in frame ORDER — see
data/synthetic.py:temporal_motion_clips), then compare nearest-neighbor
retrieval top-1 over encoder features.  This is the executable proxy for
the reference's paper claim (README.md:48-58: GCA-M beats MoCo-video by
~10 points on UCF101) in a dataset-free environment.

Run:  python perf/graph_benefit_lab.py --regimes moco simsiam --seeds 0 1 2
Pinned margins feed tests/test_graph_benefit.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_cfg(regime: str, aug: bool, t: int, hw: int, feat_dim: int = 32,
             graph_overrides=()):
    from video_graph_ssl_tpu.config import cfg as CFG

    c = CFG.clone()
    c.MODEL.BACKBONE = "tiny3d"
    c.MODEL.BACKBONE_TYPE = "3D"
    c.MODEL.AUG_FLAG = bool(aug)
    c.MODEL.DROPOUT = 0.0
    c.INPUT.BASE_SIZE = [hw, hw]
    c.INPUT.CROP_SIZE = [hw, hw]
    c.INPUT.SCALE_SIZE = [hw + 4, hw + 4]
    c.INPUT.VIDEO_LENGTH = t
    c.DATASET.NUM_CLASS = 4
    c.DATASET.SOURCE = "synthetic"
    c.CONTRAST.MEM_TYPE = regime
    c.CONTRAST.NCE_K = 16
    c.CROSS.FEAT_DIM = feat_dim
    c.TPU.COMPUTE_DTYPE = "float32"
    if graph_overrides:
        c.merge_from_list(list(graph_overrides))
    return c


def retrieval_top1(feats: np.ndarray, labels: np.ndarray) -> float:
    f = feats / np.maximum(np.linalg.norm(feats, axis=1, keepdims=True), 1e-9)
    sim = f @ f.T
    np.fill_diagonal(sim, -np.inf)
    return float((labels[sim.argmax(axis=1)] == labels).mean())


def run_one(regime: str, aug: bool, seed: int, epochs: int, t: int, hw: int,
            per_class: int, lr: float, batch_size: int = 16,
            graph_overrides=(), noise: float = 0.5, dataset: str = "shortcut"):
    import jax
    import jax.numpy as jnp

    from video_graph_ssl_tpu.data.synthetic import (temporal_motion_clips,
                                                    temporal_shortcut_clips)
    from video_graph_ssl_tpu.engine import (create_pretrain_state,
                                            make_pretrain_step)
    from video_graph_ssl_tpu.models import create_visual_model

    cfg = make_cfg(regime, aug, t, hw, graph_overrides=graph_overrides)
    cfg.MODEL.SEED = seed
    make_clips = {"motion": temporal_motion_clips,
                  "shortcut": temporal_shortcut_clips}[dataset]
    clips, labels = make_clips(per_class=per_class, t=t,
                               hw=(hw, hw), seed=seed, noise=noise)
    clips_j = jnp.asarray(clips)
    n = len(labels)

    model, _ = create_visual_model(cfg)
    example = clips_j[:2] if regime == "simsiam" else clips_j[:2, 0]
    state, tx = create_pretrain_state(cfg, model, example, n_data=n)
    encode = jax.jit(lambda s, x: model.apply(
        {"params": s.params, "batch_stats": s.batch_stats},
        x, train=False, method="encode"))

    before = retrieval_top1(np.asarray(encode(state, clips_j[:, 0])), labels)

    step = jax.jit(make_pretrain_step(cfg, model, tx, n_data=n),
                   donate_argnums=0)
    order_rng = np.random.default_rng(seed + 1)
    first = last = None
    for _epoch in range(epochs):
        order = order_rng.permutation(n)
        for s in range(0, n - batch_size + 1, batch_size):
            idx = order[s:s + batch_size]
            batch = {"clips": clips_j[idx],
                     "label": jnp.zeros(batch_size, jnp.int32),
                     "index": jnp.asarray(idx, jnp.int32)}
            state, metrics = step(state, batch, lr)
        last = float(metrics["loss"])
        if first is None:
            first = last

    after = retrieval_top1(np.asarray(encode(state, clips_j[:, 0])), labels)
    return dict(before=before, after=after, loss_first=first, loss_last=last)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regimes", nargs="*", default=["moco", "simsiam"])
    ap.add_argument("--seeds", nargs="*", type=int, default=[0, 1, 2])
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--t", type=int, default=8)
    ap.add_argument("--hw", type=int, default=16)
    ap.add_argument("--per_class", type=int, default=12)
    ap.add_argument("--lr", type=float, default=0.3)
    ap.add_argument("--noise", type=float, default=0.5)
    ap.add_argument("--dataset", choices=["shortcut", "motion"],
                    default="shortcut",
                    help="shortcut: order is an instance shortcut, content "
                         "is the class signal (the GCA-favoring regime); "
                         "motion: class signal IS the frame order (measured "
                         "GCA-ADVERSE — graph mixing destroys the signal; "
                         "kept as the negative control)")
    ap.add_argument("--graph_opts", nargs="*", default=[],
                    help="config overrides for the AUG_FLAG=True arm only, "
                         "e.g. --graph_opts GRAPH.SAMPLER gaussian")
    ap.add_argument("--jsonl", default="",
                    help="append one JSON record per regime/seed pair to "
                         "this path (the committed evidence artifact "
                         "tests/test_graph_benefit.py regresses against)")
    args = ap.parse_args()

    import jax

    records = []
    for regime in args.regimes:
        margins = []
        for seed in args.seeds:
            row = {}
            for aug in (True, False):
                t0 = time.perf_counter()
                r = run_one(regime, aug, seed, args.epochs, args.t, args.hw,
                            args.per_class, args.lr,
                            graph_overrides=args.graph_opts if aug else (),
                            noise=args.noise, dataset=args.dataset)
                r["sec"] = round(time.perf_counter() - t0, 1)
                row[aug] = r
            margin = row[True]["after"] - row[False]["after"]
            margins.append(margin)
            records.append({
                "regime": regime, "seed": seed, "dataset": args.dataset,
                "epochs": args.epochs, "backend": jax.default_backend(),
                "graph": row[True], "nograph": row[False],
                "margin": round(margin, 4),
            })
            print(f"{regime:8s} seed{seed} "
                  f"graph {row[True]['after']:.3f} "
                  f"(before {row[True]['before']:.3f}, "
                  f"loss {row[True]['loss_first']:.3f}->"
                  f"{row[True]['loss_last']:.3f}) | "
                  f"nograph {row[False]['after']:.3f} "
                  f"(before {row[False]['before']:.3f}, "
                  f"loss {row[False]['loss_first']:.3f}->"
                  f"{row[False]['loss_last']:.3f}) | "
                  f"margin {margin:+.3f} "
                  f"[{row[True]['sec']:.0f}s/{row[False]['sec']:.0f}s]",
                  flush=True)
        print(f"{regime:8s} mean margin {np.mean(margins):+.3f} "
              f"min {np.min(margins):+.3f}", flush=True)
    if args.jsonl:
        with open(args.jsonl, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
        print(f"appended {len(records)} records to {args.jsonl}", flush=True)


if __name__ == "__main__":
    main()
