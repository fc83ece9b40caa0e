"""Whole-video host IO + result caching.

Counterpart of lib/data/datasets/utils.py:16-88 (opencv/ffmpeg video
load/write) and :141-156 (pickle ``cache`` decorator).  The reference binds
to the ``ffmpeg-python`` package; this environment ships neither that
package nor the ffmpeg binary, so cv2 (always present) is the primary
codec path and ffmpeg is an optional subprocess fallback, auto-detected.

Everything here is host-side uint8 numpy — decoded video feeds the same
on-device augmentation chain as frame folders (transforms_device.py).
"""

from __future__ import annotations

import functools
import json
import os
import pickle
import shutil
import subprocess
from typing import Optional, Tuple

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

_FFMPEG = shutil.which("ffmpeg")
_FFPROBE = shutil.which("ffprobe")


def video_info(path: str) -> dict:
    """Container metadata: width/height/fps/num_frames.

    Reference ``ffmpeg_video_info`` (utils.py:30-35) returns the ffprobe
    video-stream dict; we normalize to a plain dict so callers don't parse
    ``avg_frame_rate`` fractions themselves.
    """
    if _FFPROBE is not None:  # pragma: no cover - binary absent in CI image
        out = subprocess.run(
            [_FFPROBE, "-v", "quiet", "-print_format", "json",
             "-show_streams", "-select_streams", "v:0", path],
            capture_output=True, check=True).stdout
        stream = json.loads(out)["streams"][0]
        num, den = (stream.get("avg_frame_rate") or "0/1").split("/")
        fps = float(num) / float(den) if float(den) else 0.0
        return {
            "width": int(stream["width"]),
            "height": int(stream["height"]),
            "fps": fps,
            "num_frames": int(stream.get("nb_frames", 0) or 0),
        }
    if not _HAS_CV2:
        raise RuntimeError("video_info needs cv2 or ffprobe")
    cap = cv2.VideoCapture(path)
    try:
        if not cap.isOpened():
            raise IOError(f"failed to open video {path}")
        return {
            "width": int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            "height": int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            "fps": float(cap.get(cv2.CAP_PROP_FPS)),
            "num_frames": int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
        }
    finally:
        cap.release()


def load_video(path: str) -> Tuple[Optional[np.ndarray], Optional[float]]:
    """Decode a whole video file → ((N, H, W, 3) RGB uint8, fps).

    Merges the reference's two loaders (utils.py:16-27 opencv,
    utils.py:38-61 ffmpeg) behind one signature — the ffmpeg variant's
    ``(video, fps)`` return and None-on-failure contract.  The reference's
    opencv loop asserts mid-stream and crashes at EOF (utils.py:21-22,
    latent bug); intended behavior is to stop at end of stream.
    """
    try:
        if not _HAS_CV2:
            raise RuntimeError("cv2 unavailable")
        cap = cv2.VideoCapture(path)
        try:
            if not cap.isOpened():
                raise IOError(f"failed to open video {path}")
            fps = float(cap.get(cv2.CAP_PROP_FPS))
            frames = []
            while True:
                ret, frame = cap.read()
                if not ret or frame is None:
                    break
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            if not frames:
                raise IOError(f"no frames decoded from {path}")
            return np.stack(frames, axis=0), fps
        finally:
            cap.release()
    except Exception as e:  # parity: ffmpeg_video_loader returns (None, None)
        print(f"failed to load video {path}")
        print(e)
        return None, None


def _as_uint8_video(video) -> np.ndarray:
    """Accept uint8 [0,255] or float [0,1] (N,H,W,3); jax/torch arrays ok."""
    video = np.asarray(video)
    if video.dtype != np.uint8:
        video = np.clip(video * 255.0, 0, 255).astype(np.uint8)
    assert video.ndim == 4 and video.shape[-1] == 3, video.shape
    return video


def write_video(video, path: str, fps: float = 25.0) -> None:
    """Encode (N, H, W, 3) RGB to a video file.

    Counterpart of ``ffmpeg_video_writer`` (utils.py:64-88), including its
    float→uint8 rescale of tensor input.  Prefers the ffmpeg binary (same
    yuv420p/5000k settings) when present; otherwise cv2 VideoWriter with a
    container-appropriate fourcc.
    """
    video = _as_uint8_video(video)
    n, h, w, _ = video.shape
    if _FFMPEG is not None:  # pragma: no cover - binary absent in CI image
        proc = subprocess.Popen(
            [_FFMPEG, "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
             "-s", f"{w}x{h}", "-r", str(fps), "-i", "pipe:",
             "-pix_fmt", "yuv420p", "-b:v", "5000k", path],
            stdin=subprocess.PIPE, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
        proc.stdin.write(video.tobytes())
        proc.stdin.close()
        proc.wait()
    else:
        if not _HAS_CV2:
            raise RuntimeError("write_video needs cv2 or ffmpeg")
        ext = os.path.splitext(path)[1].lower()
        fourcc = cv2.VideoWriter_fourcc(
            *("MJPG" if ext == ".avi" else "mp4v"))
        out = cv2.VideoWriter(path, fourcc, fps, (w, h))
        try:
            assert out.isOpened(), f"failed to open writer for {path}"
            for frame in video:
                out.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        finally:
            out.release()
    print("saved video to " + path)


def cache(cache_file: str):
    """Decorator caching a function's result to ``cache_file`` via pickle.

    Reference: utils.py:141-156.  Used for expensive dataset index builds;
    first call computes and saves, later calls load the pickle.
    """
    def cache_decorator(fn):
        @functools.wraps(fn)
        def newf(*args, **kwargs):
            if os.path.exists(cache_file):
                print(f"Loading cached result from '{cache_file}'")
                with open(cache_file, "rb") as f:
                    return pickle.load(f)
            res = fn(*args, **kwargs)
            print(f"Saving result to cache '{cache_file}'")
            with open(cache_file, "wb") as f:
                pickle.dump(res, f)
            return res
        return newf
    return cache_decorator
