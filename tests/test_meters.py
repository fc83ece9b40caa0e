"""Golden tests for utils.meters.accuracy vs the reference torch loop.

Reference: /root/reference/lib/evaluation/metric.py:44-67 — single-label
top-k, multi-label hit counting, and the (N, T, C) max-pool path.
"""

import numpy as np
import pytest
import torch

from video_graph_ssl_tpu.utils import AverageMeter, accuracy


def _ref_accuracy(output, target, topk=(1,)):
    """Faithful replica of the reference accuracy semantics
    (metric.py:44-67) for golden comparison."""
    output = torch.as_tensor(output)
    target = torch.as_tensor(target)
    if target.dim() == 3:
        target = target.max(dim=1)[0]
    maxk = max(topk)
    batch_size = target.size(0)
    _, pred = output.topk(maxk, 1, True, True)
    pred = pred.t()
    if len(target.shape) == 1:
        correct = pred.eq(target.view(1, -1).expand_as(pred))
    else:
        correct = torch.zeros(*pred.shape)
        for i in range(correct.shape[0]):
            for j in range(correct.shape[1]):
                correct[i, j] = target[j, pred[i, j]] > 0.5
    res = []
    for k in topk:
        correct_k = correct[:k].reshape(-1).float().sum(0, keepdim=True)
        res.append(float(correct_k * (100.0 / batch_size)))
    return res


@pytest.mark.parametrize("topk", [(1,), (1, 5)])
def test_single_label_matches_reference(topk):
    g = np.random.default_rng(0)
    out = g.normal(size=(32, 11)).astype(np.float32)
    tgt = g.integers(0, 11, size=32).astype(np.int64)
    ours = accuracy(out, tgt, topk)
    ref = _ref_accuracy(out, tgt, topk)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


@pytest.mark.parametrize("topk", [(1,), (1, 3), (1, 5)])
def test_multi_label_matches_reference(topk):
    g = np.random.default_rng(1)
    out = g.normal(size=(24, 13)).astype(np.float32)
    tgt = (g.random(size=(24, 13)) < 0.3).astype(np.float32)
    ours = accuracy(out, tgt, topk)
    ref = _ref_accuracy(out, tgt, topk)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_three_dim_target_maxpools_middle_axis():
    g = np.random.default_rng(2)
    out = g.normal(size=(8, 7)).astype(np.float32)
    tgt = (g.random(size=(8, 4, 7)) < 0.2).astype(np.float32)
    ours = accuracy(out, tgt, (1, 3))
    ref = _ref_accuracy(out, tgt, (1, 3))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_average_meter_matches_reference_arithmetic():
    m = AverageMeter()
    for v, n in [(2.0, 1), (4.0, 3), (1.0, 2)]:
        m.update(v, n)
    assert m.val == 1.0
    assert m.sum == 2.0 + 12.0 + 2.0
    assert m.count == 6
    assert m.avg == pytest.approx(16.0 / 6)


def test_engine_topk_matches_argsort_semantics():
    """engine.pretrain.topk_accuracy (rank-counting, sort-free) must equal
    the stable argsort formulation it replaced — including exact-tie
    placement (stable sort of -logits orders equal values by index)."""
    from video_graph_ssl_tpu.engine.pretrain import topk_accuracy

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((16, 37)).astype(np.float32)
    # force ties: duplicate the positive value at earlier + later columns
    logits[3, 10] = logits[3, 20]
    logits[5, 0] = logits[5, 30]
    labels = rng.integers(0, 37, 16).astype(np.int32)
    labels[3], labels[5] = 20, 0

    ranks = np.argsort(-logits, axis=-1, kind="stable")
    for k in (1, 5):
        ref = np.mean(np.any(ranks[:, :k] == labels[:, None], -1)) * 100.0
        got = float(topk_accuracy(logits, labels, ks=(k,))[f"top{k}"])
        np.testing.assert_allclose(got, ref, rtol=1e-6)
