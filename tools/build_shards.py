#!/usr/bin/env python
"""Offline shard-store builder: JPEG frame folders → pre-resized binary shards.

One-time ingest so training never decodes JPEG in the hot path (the host
pipeline role of the reference's DataLoader workers, lib/data/build.py:40-54,
redesigned for a TPU feed — see video_graph_ssl_tpu/data/shards.py).

    python tools/build_shards.py --cfg configs/visual_moco.yaml \
        --out /data/k400_shards [opts ...]

Then point the config at the store:
    DATASET.VISUAL_ROOT_DIR /data/k400_shards  INPUT.PRE_LOAD shard
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--out", required=True, help="output store directory")
    ap.add_argument("--shard-mb", type=int, default=512)
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args(argv)

    from video_graph_ssl_tpu.config import cfg as CFG
    from video_graph_ssl_tpu.data.build import _canvas_hw, _img_tmpl
    from video_graph_ssl_tpu.data.shards import write_shard_store

    cfg = CFG.clone()
    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)

    list_files = [cfg.DATASET.TRAIN_SPLIT]
    if cfg.DATASET.VALIDATION_SPLIT:
        list_files.append(cfg.DATASET.VALIDATION_SPLIT)

    t0 = time.time()
    meta = write_shard_store(
        root_path=cfg.DATASET.VISUAL_ROOT_DIR,
        list_files=list_files,
        out_dir=args.out,
        canvas_hw=_canvas_hw(cfg),
        image_tmpl=_img_tmpl(cfg),
        modality=cfg.INPUT.MODALITY,
        pre_load=cfg.INPUT.PRE_LOAD,
        shard_bytes=args.shard_mb << 20,
    )
    n_vids = len(meta["videos"])
    n_frames = sum(v[2] for v in meta["videos"].values())
    print(f"wrote {n_vids} videos / {n_frames} frames "
          f"in {meta['num_shards']} shard(s) to {args.out} "
          f"({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    sys.exit(main())
