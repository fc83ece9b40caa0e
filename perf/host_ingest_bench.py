#!/usr/bin/env python
"""Host ingest throughput: shard store vs online JPEG decode.

Proves the one-core host can assemble SSL batches faster than the chip
consumes them (bench.py target ≥1,250 clips/s).  A clip here is the full
pretrain item: TWO 16-frame views at the 128x128 canvas, uint8.

Uses a synthetic frame source so the store builds in seconds; at read
time the bytes are indistinguishable from real pre-resized video.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_graph_ssl_tpu.data.datasets import ContrastiveDataset
from video_graph_ssl_tpu.data.shards import write_shard_store


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--videos", type=int, default=64)
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--canvas", type=int, nargs=2, default=(128, 128))
    ap.add_argument("--clips", type=int, default=2000)
    ap.add_argument("--jpeg", action="store_true",
                    help="also time the online cv2-JPEG path for contrast")
    args = ap.parse_args()
    canvas = tuple(args.canvas)

    tmp = tempfile.mkdtemp(prefix="ingest_bench_")
    try:
        split = os.path.join(tmp, "split.txt")
        with open(split, "w") as f:
            for v in range(args.videos):
                f.write(f"v{v:04d} {args.frames} {v % 10}\n")

        rng = np.random.default_rng(0)
        frame = rng.integers(0, 256, (*canvas, 3), np.uint8)

        store_dir = os.path.join(tmp, "store")
        t0 = time.perf_counter()
        write_shard_store("", [split], store_dir, canvas,
                          frame_source=lambda d, i: frame)
        build_s = time.perf_counter() - t0
        total_mb = args.videos * args.frames * canvas[0] * canvas[1] * 3 / 1e6
        print(f"store build: {total_mb:.0f} MB in {build_s:.1f}s")

        ds = ContrastiveDataset(
            root_path=store_dir, list_file=split, video_length=16,
            frame_interval=4, sample_type="dense", pre_load="shard",
            canvas_hw=canvas)
        g = np.random.default_rng(1)

        # warm the page cache, then measure
        for i in range(min(64, len(ds))):
            ds.__getitem__(i % len(ds), rng=g)
        t0 = time.perf_counter()
        for i in range(args.clips):
            item = ds.__getitem__(i % len(ds), rng=g)
        dt = time.perf_counter() - t0
        assert item["clips"].shape == (2, 16, *canvas, 3)
        cps = args.clips / dt
        print(f"shard ingest: {cps:,.0f} clips/s "
              f"({cps * item['clips'].nbytes / 1e9:.2f} GB/s) "
              f"-> {'PASS' if cps >= 1250 else 'FAIL'} (target 1250)")

        if args.jpeg:
            import cv2
            # realistic source frames: stored larger than the canvas (the
            # Kinetics frame dumps are ~256x340 for a 128x171 canvas), so
            # decode cost includes the downscale both paths must do
            big = rng.integers(0, 256,
                               (canvas[0] * 2, canvas[1] * 2, 3), np.uint8)
            big = cv2.GaussianBlur(big, (9, 9), 3)  # compressible content
            jdir = os.path.join(tmp, "jpeg", "v0")
            os.makedirs(jdir)
            for i in range(1, args.frames + 1):
                cv2.imwrite(os.path.join(jdir, f"img_{i:05d}.jpg"), big)
            jsplit = os.path.join(tmp, "jsplit.txt")
            with open(jsplit, "w") as f:
                f.write(f"v0 {args.frames} 0\n")
            dsj = ContrastiveDataset(
                root_path=os.path.join(tmp, "jpeg"), list_file=jsplit,
                video_length=16, frame_interval=4, sample_type="dense",
                pre_load="cv2", canvas_hw=canvas)
            n = 50
            t0 = time.perf_counter()
            for i in range(n):
                dsj.__getitem__(0, rng=g)
            cps_j = n / (time.perf_counter() - t0)
            print(f"jpeg ingest:  {cps_j:,.0f} clips/s "
                  f"(speedup {cps / cps_j:.0f}x)")

            from video_graph_ssl_tpu.data.native import native_jpeg_available
            if native_jpeg_available():
                dsn = ContrastiveDataset(
                    root_path=os.path.join(tmp, "jpeg"), list_file=jsplit,
                    video_length=16, frame_interval=4, sample_type="dense",
                    pre_load="native", canvas_hw=canvas)
                dsn.__getitem__(0, rng=g)  # warm pool + page cache
                t0 = time.perf_counter()
                for i in range(n):
                    dsn.__getitem__(0, rng=g)
                cps_n = n / (time.perf_counter() - t0)
                print(f"jpeg native:  {cps_n:,.0f} clips/s "
                      f"(C++ pool, {cps_n / cps_j:.2f}x cv2 path)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
