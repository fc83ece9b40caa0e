"""Native C++ JPEG decode pool (data/native): availability-gated tests.

The pool replaces per-frame cv2.imread+resize with one GIL-free batched
call (DCT-domain prescale + bilinear).  Skipped when g++/libjpeg are
absent — the loader falls back to cv2 in that case by design.
"""

import os

import numpy as np
import pytest

from video_graph_ssl_tpu.data.native import native_jpeg_available


pytestmark = pytest.mark.skipif(not native_jpeg_available(),
                                reason="g++/libjpeg unavailable")


def _write_frames(tmp_path, n=6, hw=(240, 320)):
    cv2 = pytest.importorskip("cv2")
    # smooth gradient frames: DCT-friendly, so prescale+bilinear stays
    # close to cv2's full-res resize
    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w]
    paths = []
    for i in range(n):
        img = np.stack([(yy * 255 / h), (xx * 255 / w),
                        np.full_like(yy, 30 * i % 255)], -1).astype(np.uint8)
        p = str(tmp_path / f"img_{i + 1:05d}.jpg")
        cv2.imwrite(p, img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(p)
    return paths


def test_decode_batch_matches_cv2(tmp_path):
    import cv2

    from video_graph_ssl_tpu.data.native import NativeJpegPool

    paths = _write_frames(tmp_path)
    pool = NativeJpegPool(2)
    out = pool.decode_batch(paths, 128, 171)
    assert out.shape == (len(paths), 128, 171, 3) and out.dtype == np.uint8
    ref = np.stack([
        cv2.resize(cv2.imread(p)[:, :, ::-1], (171, 128),
                   interpolation=cv2.INTER_LINEAR) for p in paths])
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.mean() < 3.0, diff.mean()
    pool.close()


def test_load_clip_native_parity(tmp_path):
    from video_graph_ssl_tpu.data.decode import load_clip

    _write_frames(tmp_path)
    kw = dict(directory=str(tmp_path), image_tmpl="img_{:05d}.jpg",
              indices=[1, 3], canvas_hw=(64, 86), num_frames=6)
    a = load_clip(pre_load="native", **kw)
    b = load_clip(pre_load="cv2", **kw)
    assert a.shape == b.shape == (2, 64, 86, 3)
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 3.0


def test_load_clip_native_new_length_stacking(tmp_path):
    from video_graph_ssl_tpu.data.decode import load_clip

    _write_frames(tmp_path)
    kw = dict(directory=str(tmp_path), image_tmpl="img_{:05d}.jpg",
              indices=[1, 5], canvas_hw=(64, 86), num_frames=6,
              new_length=3)
    a = load_clip(pre_load="native", **kw)
    b = load_clip(pre_load="cv2", **kw)
    assert a.shape == b.shape == (2, 64, 86, 9)
    # frame saturation at num_frames must match the reference arithmetic
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 3.0


def test_missing_file_raises(tmp_path):
    from video_graph_ssl_tpu.data.native import NativeJpegPool

    pool = NativeJpegPool(1)
    with pytest.raises(IOError):
        pool.decode_batch([str(tmp_path / "nope.jpg")], 32, 32)
    pool.close()
