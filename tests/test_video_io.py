"""Whole-video IO + cache decorator (reference utils.py:16-88,141-156)."""

import numpy as np
import pytest

from video_graph_ssl_tpu.data import video_io


def _synthetic_video(n=8, h=48, w=64):
    g = np.random.default_rng(0)
    # Smooth content survives lossy encode better than noise.
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for t in range(n):
        r = (128 + 100 * np.sin(xx / 9.0 + t / 2.0)).astype(np.uint8)
        gch = (128 + 100 * np.cos(yy / 7.0 - t / 3.0)).astype(np.uint8)
        b = np.full((h, w), 30 * t % 255, np.uint8)
        frames.append(np.stack([r, gch, b], axis=-1))
    del g
    return np.stack(frames, axis=0)


@pytest.mark.skipif(not video_io._HAS_CV2, reason="needs cv2")
def test_write_read_roundtrip(tmp_path):
    vid = _synthetic_video()
    path = str(tmp_path / "clip.avi")
    video_io.write_video(vid, path, fps=10.0)

    back, fps = video_io.load_video(path)
    assert back is not None
    assert back.shape == vid.shape
    assert back.dtype == np.uint8
    assert fps == pytest.approx(10.0, abs=0.5)
    # Lossy codec: content should still be close.
    err = np.abs(back.astype(np.float32) - vid.astype(np.float32)).mean()
    assert err < 16.0, err

    info = video_io.video_info(path)
    assert (info["width"], info["height"]) == (vid.shape[2], vid.shape[1])
    assert info["num_frames"] == vid.shape[0]


@pytest.mark.skipif(not video_io._HAS_CV2, reason="needs cv2")
def test_write_video_accepts_float01(tmp_path):
    vid = _synthetic_video(n=4)
    path = str(tmp_path / "f.avi")
    # parity: ffmpeg_video_writer rescales float tensors by 255
    video_io.write_video(vid.astype(np.float32) / 255.0, path, fps=5.0)
    back, _ = video_io.load_video(path)
    assert back is not None and back.shape == vid.shape


def test_load_video_missing_returns_none(tmp_path, capsys):
    # parity: ffmpeg_video_loader prints and returns (None, None)
    out, fps = video_io.load_video(str(tmp_path / "nope.mp4"))
    assert out is None and fps is None
    assert "failed to load video" in capsys.readouterr().out


def test_cache_decorator(tmp_path):
    cache_file = str(tmp_path / "idx.pkl")
    calls = []

    @video_io.cache(cache_file)
    def build(a, b=2):
        calls.append((a, b))
        return {"val": a + b}

    assert build(1, b=3) == {"val": 4}
    assert build(1, b=3) == {"val": 4}   # served from pickle
    assert calls == [(1, 3)]
    # NOTE (deviation from reference): the cache key is the file, not the
    # args — same as the reference's semantics (utils.py:144-154).
    assert build(9) == {"val": 4}
    assert calls == [(1, 3)]
