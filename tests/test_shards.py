"""Shard-store ingest: bit-parity with the online JPEG decode path.

Shards must reproduce decode.load_clip exactly (data/shards.py mirrors
dataset.py:178-191 index semantics), so ``pre_load='shard'`` is a pure
throughput change.
"""

import os

import numpy as np
import pytest

from video_graph_ssl_tpu.data import decode
from video_graph_ssl_tpu.data.datasets import ContrastiveDataset, FrameDataset
from video_graph_ssl_tpu.data.shards import ShardStore, write_shard_store

cv2 = pytest.importorskip("cv2")

CANVAS = (18, 24)


def _make_frames(root, name, n, seed):
    d = os.path.join(root, name)
    os.makedirs(d)
    g = np.random.default_rng(seed)
    for i in range(1, n + 1):
        img = g.integers(0, 256, (20, 28, 3), np.uint8)
        cv2.imwrite(os.path.join(d, f"img_{i:05d}.jpg"), img)
        for ax in ("x", "y"):
            gr = g.integers(0, 256, (20, 28), np.uint8)
            cv2.imwrite(os.path.join(d, f"flow_{ax}_{i:05d}.jpg"), gr)
    return n


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    lens = {"vid_a": 7, "vid_b": 5, "vid_c": 9}
    for i, (name, n) in enumerate(lens.items()):
        _make_frames(root, name, n, seed=i)
    split = os.path.join(root, "split.txt")
    with open(split, "w") as f:
        for i, (name, n) in enumerate(lens.items()):
            f.write(f"{name} {n} {i}\n")
    return root, split, lens


@pytest.fixture(scope="module")
def rgb_store(corpus, tmp_path_factory):
    root, split, _ = corpus
    out = str(tmp_path_factory.mktemp("store_rgb"))
    write_shard_store(root, [split], out, CANVAS)
    return out


def test_shard_clip_matches_decode(corpus, rgb_store):
    root, _, lens = corpus
    store = ShardStore(rgb_store)
    for name, n in lens.items():
        for nl in (1, 3):
            idx = [1, max(1, n - 1), n]  # includes the saturating tail
            want = decode.load_clip(os.path.join(root, name),
                                    "img_{:05d}.jpg", idx, "cv2", CANVAS,
                                    new_length=nl, num_frames=n)
            got = store.load_clip(name, idx, new_length=nl, num_frames=n)
            np.testing.assert_array_equal(got, want)


def test_shard_flow_matches_decode(corpus, tmp_path_factory):
    root, split, lens = corpus
    out = str(tmp_path_factory.mktemp("store_flow"))
    write_shard_store(root, [split], out, CANVAS,
                      image_tmpl="flow_{}_{:05d}.jpg", modality="Flow")
    store = ShardStore(out)
    name, n = next(iter(lens.items()))
    want = decode.load_clip(os.path.join(root, name), "flow_{}_{:05d}.jpg",
                            [2, n], "cv2", CANVAS, modality="Flow",
                            new_length=2, num_frames=n)
    got = store.load_clip(name, [2, n], new_length=2, num_frames=n)
    assert got.shape[-1] == 4  # 2 steps x (x, y)
    np.testing.assert_array_equal(got, want)


def test_multi_shard_rollover(corpus, tmp_path_factory):
    root, split, lens = corpus
    out = str(tmp_path_factory.mktemp("store_small"))
    frame_bytes = CANVAS[0] * CANVAS[1] * 3
    # cap ≈ one video per shard → forces rollover
    meta = write_shard_store(root, [split], out, CANVAS,
                             shard_bytes=8 * frame_bytes)
    assert meta["num_shards"] > 1
    store = ShardStore(out)
    for name, n in lens.items():
        want = decode.load_clip(os.path.join(root, name), "img_{:05d}.jpg",
                                list(range(1, n + 1)), "cv2", CANVAS,
                                num_frames=n)
        np.testing.assert_array_equal(
            store.load_clip(name, list(range(1, n + 1)), num_frames=n), want)


def test_datasets_shard_equals_cv2(corpus, rgb_store):
    root, split, _ = corpus
    common = dict(list_file=split, video_length=4, canvas_hw=CANVAS)
    for cls, kw in ((FrameDataset, dict(sample_type="uniform")),
                    (ContrastiveDataset, dict(sample_type="dense",
                                              frame_interval=2))):
        ds_jpg = cls(root_path=root, pre_load="cv2", **common, **kw)
        ds_shd = cls(root_path=rgb_store, pre_load="shard", **common, **kw)
        for i in range(len(ds_jpg)):
            a = ds_jpg.__getitem__(i, rng=np.random.default_rng(42))
            b = ds_shd.__getitem__(i, rng=np.random.default_rng(42))
            np.testing.assert_array_equal(a["clips"], b["clips"])
            assert a["label"] == b["label"]
