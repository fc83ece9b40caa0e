"""Host-side frame decoding.

Counterpart of lib/data/datasets/utils.py:91-138 (cv2/PIL loaders).  Decode
happens on the host; everything after (resize/crop/jitter/normalize) runs
as vectorized jitted ops on the TPU (see transforms_device.py), so the host
does as little as possible: JPEG → RGB uint8 → resize to a fixed canvas.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

try:
    from PIL import Image
    _HAS_PIL = True
except Exception:  # pragma: no cover
    Image = None
    _HAS_PIL = False


def opencv_loader(path: str) -> np.ndarray:
    """JPEG → RGB uint8 HWC (reference: utils.py:123-129)."""
    img = cv2.imread(path)
    assert img is not None, f"failed to read {path}"
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def pil_loader(path: str) -> np.ndarray:
    """PIL fallback (reference: utils.py:91-112)."""
    with open(path, "rb") as f:
        img = Image.open(f)
        return np.asarray(img.convert("RGB"))


_NATIVE_POOL = None


def _native_pool():
    """Lazy per-process singleton of the C++ decode pool."""
    global _NATIVE_POOL
    if _NATIVE_POOL is None:
        from .native import NativeJpegPool

        _NATIVE_POOL = NativeJpegPool()
    return _NATIVE_POOL


def load_image(path: str, pre_load: str = "cv2") -> np.ndarray:
    if pre_load == "native":
        pre_load = "cv2"  # no canvas: batched native path not applicable
    if pre_load == "cv2" and _HAS_CV2:
        return opencv_loader(path)
    if _HAS_PIL:
        return pil_loader(path)
    raise RuntimeError("Neither cv2 nor PIL is available for decoding")


def load_flow_pair(directory: str, tmpl: str, idx: int,
                   pre_load: str = "cv2") -> List[np.ndarray]:
    """Flow modality: x/y channel images (reference: dataset.py:58-66)."""
    x_img = load_image(os.path.join(directory, tmpl.format("x", idx)), pre_load)
    y_img = load_image(os.path.join(directory, tmpl.format("y", idx)), pre_load)
    if x_img.ndim == 3:
        x_img = x_img[..., 0]
    if y_img.ndim == 3:
        y_img = y_img[..., 0]
    return [x_img, y_img]


def resize_frame(img: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize to (H, W) on host (canvas normalization only — the
    augmentation resizes happen on device)."""
    h, w = size_hw
    if img.shape[0] == h and img.shape[1] == w:
        return img
    if _HAS_CV2:
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    pil = Image.fromarray(img)
    return np.asarray(pil.resize((w, h), Image.BILINEAR))


def load_clip(
    directory: str,
    image_tmpl: str,
    indices: Sequence[int],
    pre_load: str = "cv2",
    canvas_hw: Optional[Tuple[int, int]] = None,
    modality: str = "RGB",
    new_length: int = 1,
    num_frames: Optional[int] = None,
) -> np.ndarray:
    """Decode the frames at 1-based ``indices`` → (T, H, W, C·new_length) uint8.

    For each sampled index, ``new_length`` *consecutive* frames are loaded
    and stacked along the channel axis, saturating at ``num_frames``
    (reference: dataset.py:178-191 — ``if p < record.num_frames: p += 1``).
    Flow stacks ``2·new_length`` channels (x/y per step, the TSN layout the
    flow conv1 inflation expects, model_wrappers.py:218-235); RGB/RGBDiff
    stack ``3·new_length`` (RGBDiff's +1 frame is added by the dataset;
    differencing happens on device, models/wrappers.py).
    """
    L = max(1, int(new_length))
    if pre_load == "native" and modality in ("RGB", "RGBDiff") \
            and canvas_hw is not None:
        # Batched native path: every frame of the clip decodes (+ DCT
        # prescale + bilinear resize to the canvas) in ONE ctypes call on
        # the C++ thread pool, GIL released (data/native/jpeg_pool.cpp).
        paths = []
        for idx in indices:
            p = int(idx)
            for _ in range(L):
                paths.append(os.path.join(directory, image_tmpl.format(p)))
                if num_frames is None or p < int(num_frames):
                    p += 1
        arr = _native_pool().decode_batch(paths, *canvas_hw)
        t = len(indices)
        if L == 1:
            return arr
        arr = arr.reshape(t, L, *arr.shape[1:])        # (T, L, H, W, 3)
        return np.ascontiguousarray(
            arr.transpose(0, 2, 3, 1, 4)).reshape(
                t, arr.shape[2], arr.shape[3], L * 3)

    frames = []
    for idx in indices:
        p = int(idx)
        steps = []
        for _ in range(L):
            if modality == "Flow":
                xy = load_flow_pair(directory, image_tmpl, p, pre_load)
                img = np.stack(xy, axis=-1)
            else:
                img = load_image(
                    os.path.join(directory, image_tmpl.format(p)), pre_load)
            if canvas_hw is not None:
                img = resize_frame(img, canvas_hw)
            if img.ndim == 2:
                img = img[..., None]
            steps.append(img)
            if num_frames is None or p < int(num_frames):
                p += 1
        frames.append(steps[0] if len(steps) == 1
                      else np.concatenate(steps, axis=-1))
    return np.stack(frames, axis=0)
