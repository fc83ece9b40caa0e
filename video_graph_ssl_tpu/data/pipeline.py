"""Host data loader: shuffling, batching, threaded prefetch.

Replaces torch ``DataLoader`` + ``DistributedSampler``
(lib/data/build.py:35-54) with a single-controller loader: ONE global batch
per step (the mesh shards it), a thread pool for the IO/decode-bound item
fetch, and a bounded prefetch queue that overlaps host decode with device
compute.  On multi-host slices, ``batch_slice=(lo, hi)`` (from
``parallel.process_batch_slice``) restricts each process to its own rows of
every global batch — the ``DistributedSampler`` role — while the epoch
shuffle and per-item rngs stay keyed on GLOBAL indices, so the union of all
processes' rows is bit-identical to the single-host batch stream.

Determinism: per-epoch, per-item numpy Generators seeded as
``(seed, epoch, index)`` — the reference relies on global numpy/random
state and is not reproducible across worker layouts.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np


def _stack_batch(items) -> Dict[str, np.ndarray]:
    out = {}
    for k in items[0]:
        out[k] = np.stack([it[k] for it in items], axis=0)
    return out


class Loader:
    """Epoch-based batch loader over a map-style dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        prefetch: int = 2,
        batch_slice=None,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(int(num_workers), 1)
        self.seed = int(seed)
        self.prefetch = max(int(prefetch), 1)
        if batch_slice is not None:
            lo, hi = int(batch_slice[0]), int(batch_slice[1])
            if not (0 <= lo < hi <= self.batch_size):
                raise ValueError(
                    f"batch_slice {batch_slice} outside batch {batch_size}")
            if not self.drop_last:
                # a ragged tail batch has no well-defined per-process rows;
                # multi-host eval uses the full-batch shard_batch path instead
                raise ValueError("batch_slice requires drop_last=True")
            batch_slice = (lo, hi)
        self.batch_slice = batch_slice

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def n_data(self) -> int:
        return len(self.dataset)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            # DistributedSampler.set_epoch equivalent: epoch-dependent
            # deterministic shuffle (reference: sampler.set_epoch,
            # train_video_contrast_dis.py:588).
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        return order

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        order = self._epoch_order(epoch)
        nb = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def fetch_item(global_idx: int):
            rng = np.random.default_rng((self.seed, epoch, int(global_idx)))
            return self.dataset.__getitem__(int(global_idx), rng=rng)

        def put(item) -> bool:
            """Bounded put that aborts when the consumer is gone (otherwise a
            blocked put keeps the executor's non-daemon workers alive and the
            process never exits)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(nb):
                        if stop.is_set():
                            break
                        idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
                        if self.batch_slice is not None:
                            idxs = idxs[self.batch_slice[0]:self.batch_slice[1]]
                        items = list(pool.map(fetch_item, idxs))
                        if not put(_stack_batch(items)):
                            break
                put(None)
            except Exception as e:  # surface worker errors to the consumer
                put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
