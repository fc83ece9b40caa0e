#!/usr/bin/env python
"""GCA-step batch-size sweep (VERDICT r4 item 1, last clause).

The r4 96-192 batch sweep was run on the *moco* (graph-OFF) step; the GCA
step's memory shape differs (graph q/k embeds + adjacency + GCN activations
live alongside the encoder), so its HBM cliff may sit elsewhere.  This
sweeps the full fused GCA step (MODEL.AUG_FLAG=True) over batch sizes in ONE
process (paired trials — same binary, same relay session), printing one JSON
line per batch size and a final summary line.

Run on the chip: python perf/gca_bs_sweep.py [--bs 96 112 128 144 160]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py; reuses its _measure)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", nargs="*", type=int,
                    default=[96, 112, 128, 144, 160])
    args = ap.parse_args()

    import jax

    from video_graph_ssl_tpu.config import cfg as CFG

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = CFG.clone()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), os.pardir,
                                     "configs", "visual_moco.yaml"))
    cfg.DATASET.SOURCE = "synthetic"
    cfg.MODEL.AUG_FLAG = True
    if not on_tpu:
        cfg.MODEL.BACKBONE = "tiny3d"
        cfg.INPUT.BASE_SIZE = [32, 32]
        cfg.INPUT.SCALE_SIZE = [40, 40]
        cfg.INPUT.VIDEO_LENGTH = 4
        cfg.TPU.COMPUTE_DTYPE = "float32"

    results = {}
    for bs in args.bs:
        try:
            clips = bench._measure(cfg, bs if on_tpu else 8, on_tpu)
        except Exception as e:  # OOM at large bs is a result
            print(json.dumps({"bs": bs, "error": f"{type(e).__name__}: "
                              f"{str(e)[:200]}"}), flush=True)
            results[bs] = None
            continue
        print(json.dumps({"bs": bs, "clips_per_sec": round(clips, 1),
                          "ms_per_step": round(bs / clips * 1e3, 2)}),
              flush=True)
        results[bs] = round(clips, 1)
    print(json.dumps({"sweep": "gca_batch", "results": results}), flush=True)


if __name__ == "__main__":
    main()
