"""Training telemetry: TensorBoard scalars + JSONL fallback.

Counterpart of lib/utils/summaries.py:5-11 (tensorboardX writer factory).
Always also writes ``metrics.jsonl`` so runs are machine-readable without
TensorBoard.
"""

from __future__ import annotations

import json
import os
import time
try:
    from tensorboardX import SummaryWriter
    _HAS_TB = True
except Exception:  # pragma: no cover
    SummaryWriter = None
    _HAS_TB = False


class TensorboardSummary:
    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self.writer = SummaryWriter(logdir=directory) if _HAS_TB else None
        self._jsonl = open(os.path.join(directory, "metrics.jsonl"), "a")

    def add_scalar(self, tag: str, value, step: int):
        if self.writer is not None:
            self.writer.add_scalar(tag, float(value), int(step))
        self._jsonl.write(json.dumps(
            {"t": time.time(), "tag": tag, "value": float(value),
             "step": int(step)}) + "\n")
        self._jsonl.flush()

    def close(self):
        if self.writer is not None:
            self.writer.close()
        self._jsonl.close()


def creat_saver(cfg, base_dir: str = "run"):
    """Saver + writer bundle (reference: lib/utils/build.py:4-10; the
    reference name 'creat_saver' is kept for interface parity)."""
    from .saver import Saver

    saver = Saver(cfg, base_dir=base_dir)
    saver.save_experiment_config()
    writer = TensorboardSummary(saver.experiment_dir)
    return saver, writer
