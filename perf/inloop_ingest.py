#!/usr/bin/env python
"""In-the-loop host ingest proof: the real pretrain tool on a real
JPEG frame-folder dataset (and the shard store), on the TPU.

Closes the gap left by perf/host_ingest_bench.py (which timed the
datasets standalone): here `tools/train_video_contrast_dis.py` itself
runs for ~50 steps at bench geometry (S3D MoCo, 2x16x112^2, batch 128)
with the loader attached, and we parse the tool's own meter lines for
steady-state step time and data-wait time.  Target: data_time ~ 0 and
clips/s within ~10% of the synthetic-batch bench (bench.py).

The dataset is synthetic-but-real-bytes: ONE encoded 256^2 JPEG hard-
linked into `frames` frame files per video (decode cost is identical to
distinct files; the page cache holds it like any hot shard), plus a
pre-resized shard store built from the same split.

Run: python perf/inloop_ingest.py [--steps 50] [--videos 256]
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_dataset(root, videos, frames, canvas):
    import cv2

    from video_graph_ssl_tpu.data.shards import write_shard_store

    jdir = os.path.join(root, "jpeg")
    split = os.path.join(root, "split.txt")
    store = os.path.join(root, "store")
    stamp = f"{videos}x{frames}x{canvas}"
    done = os.path.join(root, ".done")
    if os.path.exists(done) and open(done).read() == stamp:
        return jdir, store, split

    os.makedirs(jdir, exist_ok=True)
    with open(split, "w") as f:
        for v in range(videos):
            f.write(f"v{v:04d} {frames} {v % 10}\n")

    rng = np.random.default_rng(0)
    big = rng.integers(0, 256, (canvas[0] * 2, canvas[1] * 2, 3), np.uint8)
    big = cv2.GaussianBlur(big, (9, 9), 3)  # compressible content
    proto = os.path.join(root, "proto.jpg")
    cv2.imwrite(proto, big, [cv2.IMWRITE_JPEG_QUALITY, 85])
    t0 = time.perf_counter()
    for v in range(videos):
        vdir = os.path.join(jdir, f"v{v:04d}")
        os.makedirs(vdir, exist_ok=True)
        for i in range(1, frames + 1):
            dst = os.path.join(vdir, f"frame{i}.jpg")
            if not os.path.exists(dst):
                os.link(proto, dst)
    print(f"jpeg tree: {videos * frames} links in "
          f"{time.perf_counter() - t0:.1f}s")

    frame = cv2.resize(big, (canvas[1], canvas[0]))
    t0 = time.perf_counter()
    write_shard_store("", [split], store, canvas,
                      frame_source=lambda d, i: frame)
    print(f"shard store in {time.perf_counter() - t0:.1f}s")
    open(done, "w").write(stamp)
    return jdir, store, split


def run_variant(name, root_dir, split, pre_load, steps, batch, workers,
                cache_dir):
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    cmd = [
        sys.executable, "tools/train_video_contrast_dis.py",
        "--config_file", "configs/visual_moco.yaml",
        "--max_steps", str(steps),
        "DATASET.SOURCE", "frames",
        "DATASET.VISUAL_ROOT_DIR", root_dir,
        "DATASET.TRAIN_SPLIT", split,
        "DATALOADER.BATCH_SIZE", str(batch),
        "DATALOADER.NUM_WORKERS", str(workers),
        "INPUT.PRE_LOAD", pre_load,
        "CHECKPOINT.PRINT_FREQ", "1",
        "CHECKPOINT.CHECKPOINT_INTERVAL", "1000",
        "CHECKPOINT.CHECKNAME", f"inloop_{name}",
        "SOLVER.MAX_EPOCHS", "10000",
    ]
    t0 = time.perf_counter()
    out = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                         text=True, timeout=3000)
    wall = time.perf_counter() - t0
    if out.returncode != 0:
        print(out.stdout[-2000:])
        print(out.stderr[-4000:])
        raise RuntimeError(f"{name} failed rc={out.returncode}")
    times, datas = [], []
    for m in re.finditer(r"Time (\d+\.\d+) \(.*?Data (\d+\.\d+) \(",
                         out.stdout):
        times.append(float(m.group(1)))
        datas.append(float(m.group(2)))
    if len(times) < 4:
        print(out.stdout[-1500:])
        raise RuntimeError(f"{name}: only {len(times)} meter lines parsed")
    # steady state: drop compile/warmup outliers (the first step carries the
    # full XLA compile; per-epoch first steps carry prefetch spin-up)
    t_all = np.asarray(times)
    med = float(np.median(t_all))
    keep = t_all < 3.0 * med
    ss_t, ss_d = t_all[keep], np.asarray(datas)[keep]
    cps = batch / ss_t.mean()
    print(f"{name:8s} steps={len(times)} wall={wall:.0f}s  "
          f"steady step={ss_t.mean() * 1e3:.1f}ms (p50 "
          f"{np.median(ss_t) * 1e3:.1f})  data={ss_d.mean() * 1e3:.1f}ms  "
          f"clips/s={cps:,.0f}")
    return cps, float(ss_d.mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--videos", type=int, default=512)
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--root", default="/tmp/inloop_data")
    ap.add_argument("--variants", nargs="*", default=["native", "shard"])
    args = ap.parse_args()

    canvas = (128, 128)
    os.makedirs(args.root, exist_ok=True)
    jdir, store, split = build_dataset(args.root, args.videos, args.frames,
                                       canvas)
    cache = os.path.join(args.root, "jaxcache")
    os.makedirs(cache, exist_ok=True)

    for variant in args.variants:
        root = store if variant == "shard" else jdir
        run_variant(variant, root, split, variant, args.steps, args.batch,
                    args.workers, cache)


if __name__ == "__main__":
    main()
