"""Partial-BN semantics, flow inflation, iteration LR, adversarial sampling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_graph_ssl_tpu.config import cfg as CFG
from video_graph_ssl_tpu.models.tiny import Tiny3D
from video_graph_ssl_tpu.solver import make_iter_lr_scheduler
from video_graph_ssl_tpu.utils import inflate_first_conv


def _stats_delta(a, b):
    return {k: float(jnp.abs(x - y).max())
            for (k, x), (_, y) in zip(
                jax.tree_util.tree_leaves_with_path(a),
                jax.tree_util.tree_leaves_with_path(b))}


def test_partial_bn_freezes_later_stages():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 4, 16, 16, 3)),
                    jnp.float32)
    m = Tiny3D(partial_bn=True, dtype=jnp.float32)
    v = jax.jit(lambda x: m.init({"params": jax.random.key(0)}, x,
                                 train=True))(x)
    _, muts = jax.jit(lambda v, x: m.apply(
        v, x, train=True, mutable=["batch_stats"]))(v, x)
    new_stats = muts["batch_stats"]
    old_stats = v["batch_stats"]
    # stage0 (first conv) stats updated; stage1/stage2 untouched
    assert not np.allclose(
        np.asarray(new_stats["stage0"]["block"]["bn"]["mean"]),
        np.asarray(old_stats["stage0"]["block"]["bn"]["mean"]))
    for frozen in ("stage1", "stage2"):
        np.testing.assert_array_equal(
            np.asarray(new_stats[frozen]["block"]["bn"]["mean"]),
            np.asarray(old_stats[frozen]["block"]["bn"]["mean"]))


def test_partial_bn_off_updates_all():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 4, 16, 16, 3)),
                    jnp.float32)
    m = Tiny3D(partial_bn=False, dtype=jnp.float32)
    v = jax.jit(lambda x: m.init({"params": jax.random.key(0)}, x,
                                 train=True))(x)
    _, muts = jax.jit(lambda v, x: m.apply(
        v, x, train=True, mutable=["batch_stats"]))(v, x)
    for stage in ("stage0", "stage1", "stage2"):
        assert not np.allclose(
            np.asarray(muts["batch_stats"][stage]["block"]["bn"]["mean"]),
            np.asarray(v["batch_stats"][stage]["block"]["bn"]["mean"]))


def test_inflate_first_conv():
    params = {
        "stem": {"conv": {"kernel": jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 7, 7, 3, 64)),
            jnp.float32)}},
        "later": {"conv": {"kernel": jnp.zeros((3, 3, 3, 64, 64))}},
    }
    out = inflate_first_conv(params, new_in_channels=10)
    k = out["stem"]["conv"]["kernel"]
    assert k.shape == (1, 7, 7, 10, 64)
    # every new channel equals the mean of the original RGB channels
    mean = np.asarray(params["stem"]["conv"]["kernel"]).mean(axis=3)
    for c in range(10):
        np.testing.assert_allclose(np.asarray(k[..., c, :]), mean, rtol=1e-6)
    # later convs untouched
    assert out["later"]["conv"]["kernel"].shape == (3, 3, 3, 64, 64)


def test_iter_lr_scheduler():
    c = CFG.clone()
    c.SOLVER.BASE_LR = 0.1
    c.SOLVER.MAX_EPOCHS = 10
    c.SOLVER.WARMUP_ITERS = 2
    c.SOLVER.LR_SCHEDULER = "cos"
    lr = make_iter_lr_scheduler(c, iters_per_epoch=100)
    # warmup covers 2 epochs' worth of iters
    assert lr(0) == pytest.approx(0.1 / 200)
    assert lr(199) == pytest.approx(0.1)
    assert lr(500) == pytest.approx(0.05 * (1 + np.cos(np.pi * 0.5)), abs=1e-3)
    assert lr(999) < lr(500)


def test_adver_dataset_shape():
    from video_graph_ssl_tpu.data.synthetic import SyntheticFrameDataset
    from video_graph_ssl_tpu.data.datasets import FrameDataset
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        # minimal frame-folder fixture: 1 video, 30 frames
        vid = os.path.join(d, "v0")
        os.makedirs(vid)
        import cv2
        for i in range(1, 31):
            cv2.imwrite(os.path.join(vid, f"img_{i:05d}.jpg"),
                        np.full((32, 32, 3), i, np.uint8))
        split = os.path.join(d, "split.txt")
        with open(split, "w") as f:
            f.write("v0 30 0\n")
        ds = FrameDataset(root_path=d, list_file=split, video_length=4,
                          canvas_hw=(16, 16), use_adver=True, nsamples=3)
        item = ds.__getitem__(0, np.random.default_rng(0))
        assert item["clips"].shape == (3, 4, 16, 16, 3)


@pytest.mark.parametrize("build_kw", [
    ("bninception", dict(size=64)),
    ("inception_v3", dict(size=96)),
], ids=["bninception", "inception_v3"])
def test_partial_bn_2d_inception_freezes_later_stages(build_kw):
    """Partial-BN parity for the 2D inception nets: with partial_bn=True a
    training step must not move any BN running statistic except the first
    conv stage's (reference model_wrappers.py:130-146)."""
    name, kw = build_kw
    from video_graph_ssl_tpu.models.bninception import bninception
    from video_graph_ssl_tpu.models.inceptionv3 import inception_v3
    build = {"bninception": bninception, "inception_v3": inception_v3}[name]
    first = {"bninception": "conv1", "inception_v3": "conv1a"}[name]
    s = kw["size"]
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, s, s, 3)),
                    jnp.float32)
    m = build(partial_bn=True, dtype=jnp.float32)
    v = jax.jit(lambda x: m.init({"params": jax.random.key(0)}, x,
                                 train=True))(x)
    _, muts = jax.jit(lambda v, x: m.apply(
        v, x, train=True, mutable=["batch_stats"]))(v, x)

    def flatten(tree, prefix=()):
        for k, sub in tree.items():
            if isinstance(sub, dict):
                yield from flatten(sub, prefix + (k,))
            else:
                yield prefix + (k,), sub

    new = dict(flatten(muts["batch_stats"]))
    old = dict(flatten(v["batch_stats"]))
    moved = {k for k in new
             if not np.allclose(np.asarray(new[k]), np.asarray(old[k]))}
    # only the first conv stage's BN stats may move
    assert moved, "first-stage BN stats should update"
    for k in moved:
        assert k[0] == first, f"frozen BN moved: {'/'.join(k)}"
