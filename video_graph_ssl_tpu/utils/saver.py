"""Experiment directory management + best-model promotion.

Counterpart of lib/utils/saver.py:7-58: runs live in
``run/<dataset>/<checkname>/experiment_N``; ``save_checkpoint`` writes the
state and promotes ``model_best`` by comparing ``best_pred.txt`` across
sibling experiments; ``save_experiment_config`` dumps ``parameters.txt``.
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import Any, Dict, Optional


class Saver:
    def __init__(self, cfg, base_dir: str = "run"):
        self.cfg = cfg
        self.directory = os.path.join(base_dir, cfg.DATASET.NAME,
                                      cfg.CHECKPOINT.CHECKNAME)
        runs = sorted(glob.glob(os.path.join(self.directory, "experiment_*")),
                      key=lambda p: int(p.split("_")[-1]))
        run_id = int(runs[-1].split("_")[-1]) + 1 if runs else 0
        self.experiment_dir = os.path.join(self.directory,
                                           f"experiment_{run_id:02d}")
        os.makedirs(self.experiment_dir, exist_ok=True)

    def checkpoint_path(self, filename: str) -> str:
        return os.path.join(self.experiment_dir, filename)

    def save_checkpoint(self, state, epoch: int, best_pred: float = 0.0,
                        is_best: bool = False,
                        filename: str = "checkpoint.msgpack",
                        extra: Optional[Dict[str, Any]] = None) -> str:
        """Write checkpoint; on ``is_best`` record best_pred and promote to
        model_best when it beats every sibling experiment
        (reference: saver.py:20-43).

        TPU.CKPT_BACKEND selects msgpack (single file) or orbax (sharded
        per-host tensorstore dir, optionally async via TPU.ASYNC_CKPT)."""
        from .checkpoint import save_checkpoint_orbax, save_checkpoint_state

        backend = str(getattr(self.cfg.TPU, "CKPT_BACKEND", "msgpack"))
        if backend == "orbax":
            filename = filename.replace(".msgpack", ".orbax")
            path = self.checkpoint_path(filename)
            save_checkpoint_orbax(
                path, state, epoch, best_pred, extra,
                async_save=bool(getattr(self.cfg.TPU, "ASYNC_CKPT", False)))
        else:
            path = self.checkpoint_path(filename)
            save_checkpoint_state(path, state, epoch, best_pred, extra)
        if is_best:
            with open(self.checkpoint_path("best_pred.txt"), "w") as f:
                f.write(str(best_pred))
            previous = []
            for run_dir in glob.glob(os.path.join(self.directory,
                                                  "experiment_*")):
                bp = os.path.join(run_dir, "best_pred.txt")
                if os.path.exists(bp) and run_dir != self.experiment_dir:
                    with open(bp) as f:
                        try:
                            previous.append(float(f.readline()))
                        except ValueError:
                            pass
            if not previous or best_pred > max(previous):
                if os.path.isdir(path):  # orbax checkpoints are directories
                    dst = os.path.join(self.directory, "model_best.orbax")
                    from .checkpoint import wait_for_async_checkpoints
                    wait_for_async_checkpoints()
                    if os.path.isdir(dst):
                        shutil.rmtree(dst)
                    shutil.copytree(path, dst)
                    shutil.copyfile(path + ".meta.json", dst + ".meta.json")
                else:
                    shutil.copyfile(
                        path,
                        os.path.join(self.directory, "model_best.msgpack"))
        return path

    def save_experiment_config(self) -> None:
        """Dump the full config (reference writes parameters.txt,
        saver.py:45-58)."""
        with open(self.checkpoint_path("parameters.txt"), "w") as f:
            f.write(self.cfg.dump())
