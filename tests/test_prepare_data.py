"""End-to-end dataset preparation: videos -> frames -> splits -> dataset.

The reference documents the on-disk format (1-based ``img_{:05d}.jpg``
frame folders + ``<path> <num_frames> <label>`` split lines,
lib/data/datasets/dataset.py:52-69) but ships no producing code;
``tools/prepare_data.py`` is that tool.  The last test proves the
artifacts feed the real ``FrameDataset`` loader unchanged.
"""

import os

import numpy as np
import pytest

from video_graph_ssl_tpu.data import video_io
from tools.prepare_data import (_tmpl_regex, count_frames, main,
                                scan_frame_root)


def _clip(seed: int, n=6, h=48, w=64) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        r = (128 + 100 * np.sin(xx / 9.0 + t / 2.0 + seed)).astype(np.uint8)
        g = (128 + 100 * np.cos(yy / 7.0 - t / 3.0)).astype(np.uint8)
        b = np.full((h, w), (40 * t + 13 * seed) % 255, np.uint8)
        frames.append(np.stack([r, g, b], axis=-1))
    return np.stack(frames, axis=0)


def test_tmpl_regex():
    rx = _tmpl_regex("img_{:05d}.jpg")
    assert rx.fullmatch("img_00001.jpg")
    assert rx.fullmatch("img_123456.jpg")  # counts past 5 digits still match
    assert not rx.fullmatch("img_00001.png")
    assert not rx.fullmatch("flow_x_00001.jpg")
    with pytest.raises(ValueError):
        _tmpl_regex("no_field.jpg")


@pytest.fixture(scope="module")
def video_tree(tmp_path_factory):
    if not video_io._HAS_CV2:
        pytest.skip("needs cv2")
    root = tmp_path_factory.mktemp("videos")
    layout = {"classA": ["vid_a1", "vid_a2"], "classB": ["vid_b1", "vid_b2"]}
    seed = 0
    for cls, vids in layout.items():
        for v in vids:
            os.makedirs(root / cls, exist_ok=True)
            video_io.write_video(_clip(seed), str(root / cls / f"{v}.avi"),
                                 fps=10.0)
            seed += 1
    return root


def test_extract_and_split_end_to_end(video_tree, tmp_path):
    frames = tmp_path / "frames"
    lists = tmp_path / "lists"

    assert main(["extract", "--video_root", str(video_tree),
                 "--out_root", str(frames), "--short_side", "32",
                 "--workers", "2"]) == 0
    # 1-based frames, resized so min side == 32
    first = frames / "classA" / "vid_a1" / "img_00001.jpg"
    assert first.exists()
    assert not (frames / "classA" / "vid_a1" / "img_00000.jpg").exists()
    from video_graph_ssl_tpu.data.decode import load_image

    img = load_image(str(first))
    assert min(img.shape[:2]) == 32
    assert count_frames(str(frames / "classA" / "vid_a1"),
                        "img_{:05d}.jpg") == 6

    # re-run with --skip_existing: nothing re-extracted, still rc 0
    assert main(["extract", "--video_root", str(video_tree),
                 "--out_root", str(frames), "--skip_existing"]) == 0

    assert main(["split", "--frame_root", str(frames),
                 "--out_dir", str(lists), "--val_frac", "0.5"]) == 0
    classes, rows = scan_frame_root(str(frames), "img_{:05d}.jpg")
    assert classes == ["classA", "classB"]
    assert [(r[1], r[2]) for r in rows] == [(6, 0), (6, 0), (6, 1), (6, 1)]

    cind = (lists / "class_ind.txt").read_text().splitlines()
    assert cind == ["0 classA", "1 classB"]
    train = [l.split() for l in (lists / "train.txt").read_text().splitlines()]
    val = [l.split() for l in (lists / "val.txt").read_text().splitlines()]
    assert len(train) == 2 and len(val) == 2  # 50% per class
    got = sorted(r[0] for r in train + val)
    assert got == sorted(r[0] for r in
                         [("classA/vid_a1",), ("classA/vid_a2",),
                          ("classB/vid_b1",), ("classB/vid_b2",)])

    # official-list conversion keeps scanned labels, ignores missing rows
    official = tmp_path / "trainlist01.txt"
    official.write_text("classB/vid_b1.avi 2\nclassA/vid_a2.avi 1\n"
                        "classA/missing.avi 1\n")
    assert main(["split", "--frame_root", str(frames),
                 "--out_dir", str(lists),
                 "--official_list", str(official)]) == 0
    conv = [l.split() for l in
            (lists / "trainlist01_frames.txt").read_text().splitlines()]
    assert conv == [["classB/vid_b1", "6", "1"], ["classA/vid_a2", "6", "0"]]

    # the artifacts feed the real dataset loader unchanged
    from video_graph_ssl_tpu.data.datasets import FrameDataset

    ds = FrameDataset(
        root_path=str(frames), list_file=str(lists / "train.txt"),
        video_length=4, sample_type="uniform", sample_rate=1,
        modality="RGB", image_tmpl="img_{:05d}.jpg", pre_load="cv2",
        canvas_hw=(32, 40), random_shift=True, test_mode=False,
        new_length=1)
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert item["clips"].shape == (4, 32, 40, 3)
    assert item["clips"].dtype == np.uint8
    assert int(item["label"]) in (0, 1)
