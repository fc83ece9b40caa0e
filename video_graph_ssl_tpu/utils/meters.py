"""Metrics: AverageMeter, top-k accuracy, mAP.

Counterpart of lib/evaluation/metric.py (AverageMeter :9-24, accuracy
:44-67, map/MAPMetric :26-42,69-93).  numpy-based host-side versions; the
jitted on-device top-k lives in engine.pretrain.topk_accuracy.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


class AverageMeter:
    """Running value/average/sum/count (reference: metric.py:9-24)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def accuracy(output: np.ndarray, target: np.ndarray,
             topk: Sequence[int] = (1,)) -> Tuple[float, ...]:
    """Top-k accuracy in percent (reference: metric.py:44-67)."""
    output = np.asarray(output)
    target = np.asarray(target)
    maxk = max(topk)
    pred = np.argsort(-output, axis=1)[:, :maxk]
    correct = pred == target[:, None]
    res = []
    for k in topk:
        res.append(float(correct[:, :k].any(axis=1).mean() * 100.0))
    return tuple(res)


def average_precision(output: np.ndarray, target: np.ndarray) -> float:
    """AP for one class: mean precision at each positive hit
    (reference: map, metric.py:26-42)."""
    order = np.argsort(-output)
    target = target[order]
    hits = np.cumsum(target)
    ranks = np.arange(1, len(target) + 1)
    prec = hits / ranks
    pos = target > 0
    if pos.sum() == 0:
        return 0.0
    return float((prec * pos).sum() / pos.sum())


def mean_average_precision(output: np.ndarray, target: np.ndarray) -> float:
    """mAP over classes; target is one-hot / multi-label (N, C)
    (reference: MAPMetric, metric.py:69-93)."""
    aps = [average_precision(output[:, c], target[:, c])
           for c in range(output.shape[1])]
    return float(np.mean(aps))
