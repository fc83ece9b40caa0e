"""On-device, clip-consistent video augmentations (jitted, vmapped).

TPU-native replacement for the reference's host-side cv2/albumentations
per-frame Python loops (lib/data/transform/consistency_transforms.py).  The
host only decodes JPEGs to a fixed canvas; every geometric and photometric
op below runs as one fused XLA program over the whole (B, V, T, H, W, C)
batch (the BASELINE.json north star's "fused on-device preprocessing").

Clip-consistency contract (the reference's defining property): each clip
draws ONE set of augmentation parameters shared by all of its T frames;
batching is vmap over clips with split keys.

Implemented ops and their reference counterparts:
  random_resized_crop      VideoRandomResizedCrop        (:81-145)
  color_jitter             VideoRandomColorJitter        (:275-339)
  random_grayscale         VideoRandomGrayScale          (:263-273)
  gaussian_blur            VideoGaussianBlur             (:226-261)
  random_horizontal_flip   VideoRandomHorizontalFlip     (:351-364)
  normalize                VideoNormalize                (:45-68)
  multi_scale_crop         VideoMultiScaleCrop           (:366-468)
  center_crop / resize     VideoCenterCrop/VideoResize
  ssl_augment              build_video_contrast_transform_cv2
                           (lib/data/transform/build.py:45-62)

Geometric ops use ``jax.image.scale_and_translate`` so a crop window with
*traced* (data-dependent) position/size resizes to a *static* output shape —
no dynamic shapes ever reach XLA.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------- #
# color helpers
# --------------------------------------------------------------------------- #
def rgb_to_grayscale(clip: jnp.ndarray, keep_channels: bool = True) -> jnp.ndarray:
    """ITU-R 601 luma, matching cv2.cvtColor(RGB2GRAY)."""
    gray = (0.299 * clip[..., 0] + 0.587 * clip[..., 1] + 0.114 * clip[..., 2])
    gray = gray[..., None]
    if keep_channels:
        gray = jnp.repeat(gray, 3, axis=-1)
    return gray


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,1] -> HSV [0,1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe_delta = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    # Elementwise selects only — jnp.choose lowers to a dynamic gather that
    # is catastrophically slow on TPU (measured ~400x this version).
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    def sel(c0, c1, c2, c3, c4, c5):
        return jnp.where(
            i == 0, c0, jnp.where(
                i == 1, c1, jnp.where(
                    i == 2, c2, jnp.where(
                        i == 3, c3, jnp.where(i == 4, c4, c5)))))

    r = sel(v, q, p, p, t, v)
    g = sel(t, v, v, q, p, p)
    b = sel(p, p, t, v, v, q)
    return jnp.stack([r, g, b], axis=-1)


# --------------------------------------------------------------------------- #
# photometric ops (clip in [0, 255] float32)
# --------------------------------------------------------------------------- #
def adjust_brightness(clip, factor):
    return jnp.clip(clip * factor, 0.0, 255.0).astype(clip.dtype)


def adjust_contrast(clip, factor):
    # torchvision semantics: blend with the mean of the grayscale image
    # (per frame), out = f*img + (1-f)*mean.
    gray = rgb_to_grayscale(clip, keep_channels=False)
    mean = jnp.mean(gray, axis=(-3, -2, -1), keepdims=True)
    return jnp.clip(clip * factor + mean * (1.0 - factor),
                    0.0, 255.0).astype(clip.dtype)


def adjust_saturation(clip, factor):
    gray = rgb_to_grayscale(clip, keep_channels=True)
    return jnp.clip(clip * factor + gray * (1.0 - factor),
                    0.0, 255.0).astype(clip.dtype)


def adjust_hue(clip, shift):
    # HSV roundtrip in float32 (hue wraps need the precision), result cast
    # back to the pipeline compute dtype.
    hsv = rgb_to_hsv(clip.astype(jnp.float32) / 255.0)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + shift) % 1.0)
    return jnp.clip(hsv_to_rgb(hsv) * 255.0, 0.0, 255.0).astype(clip.dtype)


def color_jitter(key: jax.Array, clip: jnp.ndarray,
                 brightness=0.4, contrast=0.4, saturation=0.4,
                 hue=0.1, order: jnp.ndarray = None) -> jnp.ndarray:
    """Clip-consistent ColorJitter with shuffled op order
    (reference: VideoRandomColorJitter, consistency_transforms.py:275-339).

    ``order``: optional (4,) permutation.  When this function is vmapped
    over clips, a per-clip order forces lax.switch to evaluate EVERY branch
    at every position (16 full-image passes, measured 3x slower); passing a
    shared unbatched ``order`` keeps the switch scalar (4 passes).  The SSL
    pipeline samples one order per step, shared across the batch — factors
    stay per-clip (documented deviation; the reference shuffles per clip).
    """
    k_perm, kb, kc, ks, kh = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness),
                            maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast),
                            maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation),
                            maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)

    ops = [
        lambda c: adjust_brightness(c, fb),
        lambda c: adjust_contrast(c, fc),
        lambda c: adjust_saturation(c, fs),
        lambda c: adjust_hue(c, fh),
    ]
    if order is None:
        order = jax.random.permutation(k_perm, 4)

    def body(i, c):
        return jax.lax.switch(order[i], ops, c)

    return jax.lax.fori_loop(0, 4, body, clip)


def random_grayscale(key, clip, p=0.2):
    do = jax.random.uniform(key) < p
    return jnp.where(do, rgb_to_grayscale(clip, keep_channels=True),
                     clip).astype(clip.dtype)


def gaussian_blur(key, clip, sigma_limit=(0.1, 2.0), kernel_size=13):
    """Separable per-clip Gaussian blur with sampled sigma
    (reference: VideoGaussianBlur, consistency_transforms.py:226-261)."""
    sigma = jax.random.uniform(key, (), minval=sigma_limit[0],
                               maxval=sigma_limit[1])
    r = kernel_size // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g = (g / jnp.sum(g)).astype(clip.dtype)

    t, h, w, c = clip.shape
    img = clip.reshape(t, h, w, c)
    kern_h = jnp.tile(g.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
    kern_w = jnp.tile(g.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(img.shape, kern_h.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    img = jax.lax.conv_general_dilated(img, kern_h, (1, 1), "SAME",
                                       dimension_numbers=dn,
                                       feature_group_count=c)
    img = jax.lax.conv_general_dilated(img, kern_w, (1, 1), "SAME",
                                       dimension_numbers=dn,
                                       feature_group_count=c)
    return img


def gaussian_noise(key, clip, var_limit=(10.0, 50.0), p=0.5):
    """Additive Gaussian noise with per-clip sampled variance
    (reference: VideoGaussianNoise, consistency_transforms.py:194-224)."""
    k_do, k_var, k_noise = jax.random.split(key, 3)
    var = jax.random.uniform(k_var, (), minval=var_limit[0],
                             maxval=var_limit[1])
    noise = jax.random.normal(k_noise, clip.shape, jnp.float32) * jnp.sqrt(var)
    noisy = jnp.clip(clip + noise.astype(clip.dtype), 0.0, 255.0)
    do = jax.random.uniform(k_do) < p
    return jnp.where(do, noisy, clip).astype(clip.dtype)


def random_rotate90(key, clip, p=0.5):
    """Rotate the whole clip by 90 degrees with probability p
    (reference: VideoRandomRotate(90)); requires H == W."""
    do = jax.random.uniform(key) < p
    rotated = jnp.rot90(clip, k=1, axes=(1, 2))
    return jnp.where(do, rotated, clip)


def random_crop(key, clip, crop_hw):
    """Uniform random crop at full resolution
    (reference: VideoRandomCrop)."""
    t, h, w, c = clip.shape
    ch, cw = crop_hw
    ky, kx = jax.random.split(key)
    y = jax.random.randint(ky, (), 0, h - ch + 1)
    x = jax.random.randint(kx, (), 0, w - cw + 1)
    return jax.lax.dynamic_slice(clip, (0, y, x, 0), (t, ch, cw, c))


def random_horizontal_flip(key, clip, p=0.5, is_flow=False):
    do = jax.random.uniform(key) < p
    flipped = clip[:, :, ::-1, :]
    if is_flow:
        # Flipping reverses horizontal motion: invert the x-flow channels
        # (even indices of the x/y interleave) in pixel space
        # (reference video_transforms.py:54-56, ImageOps.invert).
        flipped = flipped.at[..., 0::2].set(255.0 - flipped[..., 0::2])
    return jnp.where(do, flipped, clip)


def expand_stats(vals: Sequence[float], n_channels: int) -> Tuple[float, ...]:
    """Adapt per-channel stats to a channel-stacked clip (new_length > 1).

    TSN semantics for stacked inputs: RGB-group stacks tile the 3-channel
    stats across groups; Flow (2·new_length channels, not divisible by 3)
    uses the mean of the stats for every channel.  The reference never
    fixes this itself (VideoNormalize would broadcast-fail on Flow —
    latent bug); this is the intended behavior per the TSN lineage."""
    vals = tuple(float(v) for v in vals)
    if n_channels == len(vals):
        return vals
    if n_channels % len(vals) == 0:
        return vals * (n_channels // len(vals))
    m = sum(vals) / len(vals)
    return (m,) * n_channels


def normalize(clip, mean: Sequence[float], std: Sequence[float]):
    """(x/255 - mean)/std — VideoNormalize multiplies mean/std by 255 and
    works in pixel space (consistency_transforms.py:45-68); identical result."""
    c = clip.shape[-1]
    mean = jnp.asarray(expand_stats(mean, c), jnp.float32) * 255.0
    std = jnp.asarray(expand_stats(std, c), jnp.float32) * 255.0
    return ((clip - mean) / std).astype(clip.dtype)


# --------------------------------------------------------------------------- #
# geometric ops
# --------------------------------------------------------------------------- #
def crop_and_resize(clip: jnp.ndarray, y, x, h, w,
                    out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Resize the (traced) window [y:y+h, x:x+w] to the static ``out_hw``.

    Bilinear, no antialias (cv2.INTER_LINEAR semantics).  Works with traced
    y/x/h/w because scale_and_translate takes continuous parameters.
    """
    t, H, W, c = clip.shape
    oh, ow = out_hw
    sy = oh / h.astype(jnp.float32)
    sx = ow / w.astype(jnp.float32)
    scale = jnp.stack([sy, sx])
    translation = jnp.stack([-y.astype(jnp.float32) * sy,
                             -x.astype(jnp.float32) * sx])
    return jax.image.scale_and_translate(
        clip, (t, oh, ow, c), spatial_dims=(1, 2),
        scale=scale, translation=translation,
        method="linear", antialias=False,
    )


def resize_clip(clip: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    t, H, W, c = clip.shape
    return jax.image.resize(clip, (t, out_hw[0], out_hw[1], c), method="linear")


def center_crop(clip: jnp.ndarray, crop_hw: Tuple[int, int]) -> jnp.ndarray:
    t, H, W, c = clip.shape
    ch, cw = crop_hw
    y = (H - ch) // 2
    x = (W - cw) // 2
    return clip[:, y:y + ch, x:x + cw, :]


def random_resized_crop(
    key: jax.Array, clip: jnp.ndarray, out_hw: Tuple[int, int],
    scale=(0.2, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0), attempts: int = 10,
) -> jnp.ndarray:
    """torchvision RandomResizedCrop parameterization, vectorized over the
    10 attempts (reference: VideoRandomResizedCrop,
    consistency_transforms.py:81-145)."""
    t, H, W, c = clip.shape
    area = float(H * W)
    k_area, k_ratio, k_i, k_j = jax.random.split(key, 4)

    target_area = jax.random.uniform(
        k_area, (attempts,), minval=scale[0], maxval=scale[1]) * area
    log_ratio = jax.random.uniform(
        k_ratio, (attempts,), minval=math.log(ratio[0]),
        maxval=math.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    ws = jnp.round(jnp.sqrt(target_area * aspect)).astype(jnp.int32)
    hs = jnp.round(jnp.sqrt(target_area / aspect)).astype(jnp.int32)
    valid = (ws > 0) & (ws <= W) & (hs > 0) & (hs <= H)
    # first valid attempt (argmax returns first True), else fallback
    first = jnp.argmax(valid)
    any_valid = jnp.any(valid)

    w_sel = ws[first]
    h_sel = hs[first]
    u_i = jax.random.uniform(k_i, (attempts,))
    u_j = jax.random.uniform(k_j, (attempts,))
    i_sel = jnp.floor(u_i[first] * (H - h_sel + 1).astype(jnp.float32)).astype(jnp.int32)
    j_sel = jnp.floor(u_j[first] * (W - w_sel + 1).astype(jnp.float32)).astype(jnp.int32)

    # fallback: clamp to valid aspect, centered (torchvision fallback path)
    in_ratio = float(W) / float(H)
    if in_ratio < ratio[0]:
        fw, fh = W, int(round(W / ratio[0]))
    elif in_ratio > ratio[1]:
        fh, fw = H, int(round(H * ratio[1]))
    else:
        fw, fh = W, H
    fi, fj = (H - fh) // 2, (W - fw) // 2

    h_f = jnp.where(any_valid, h_sel, fh)
    w_f = jnp.where(any_valid, w_sel, fw)
    i_f = jnp.where(any_valid, i_sel, fi)
    j_f = jnp.where(any_valid, j_sel, fj)
    return crop_and_resize(clip, i_f, j_f, h_f, w_f, out_hw)


def _fix_offsets_13(image_w, image_h, crop_w, crop_h):
    """The TSN 13-position fixed-offset grid
    (reference: fill_fix_offset, consistency_transforms.py:447-468).
    Returns (13, 2) [w_offset, h_offset]; works on traced crop sizes."""
    w4 = (image_w - crop_w) / 4.0
    h4 = (image_h - crop_h) / 4.0
    grid = jnp.asarray([
        (0, 0), (4, 0), (0, 4), (4, 4), (2, 2),
        (0, 2), (4, 2), (2, 4), (2, 0),
        (1, 1), (3, 1), (1, 3), (3, 3),
    ], jnp.float32)
    return jnp.stack([grid[:, 0] * w4, grid[:, 1] * h4], axis=1)


def msc_crop_pairs(H, W, input_size, scales=(1.0, 0.875, 0.75, 0.66),
                   max_distort=1):
    """The MultiScaleCrop (w, h) candidate grid — shared by the cv2 and
    PIL/Group reference families (consistency_transforms.py:395-414 ==
    video_transforms.py:199-216): scale the short side, snap sizes within
    3px of the target to it, keep pairs with |i-j| <= max_distort."""
    base = min(H, W)
    crop_sizes = [int(base * s) for s in scales]
    crop_h_opts = [input_size[0] if abs(x - input_size[0]) < 3 else x
                   for x in crop_sizes]
    crop_w_opts = [input_size[1] if abs(x - input_size[1]) < 3 else x
                   for x in crop_sizes]
    return [(w, h)
            for i, h in enumerate(crop_h_opts)
            for j, w in enumerate(crop_w_opts)
            if abs(i - j) <= max_distort]


def multi_scale_crop(
    key: jax.Array, clip: jnp.ndarray, input_size: Tuple[int, int],
    scales=(1.0, 0.875, 0.75, 0.66), max_distort: int = 1,
    more_fix_crop: bool = True,
) -> jnp.ndarray:
    """TSN-style MultiScaleCrop (reference: VideoMultiScaleCrop,
    consistency_transforms.py:366-468): random (w, h) pair from the scale
    grid (|i-j| <= max_distort), random one of the 13 fixed offsets, crop,
    resize to ``input_size``."""
    t, H, W, c = clip.shape
    pairs = msc_crop_pairs(H, W, input_size, scales, max_distort)
    pairs_arr = jnp.asarray(pairs, jnp.int32)        # (P, 2) [w, h]

    k_pair, k_off = jax.random.split(key)
    pidx = jax.random.randint(k_pair, (), 0, len(pairs))
    crop_w = pairs_arr[pidx, 0]
    crop_h = pairs_arr[pidx, 1]

    offsets = _fix_offsets_13(W, H, crop_w.astype(jnp.float32),
                              crop_h.astype(jnp.float32))
    n_off = 13 if more_fix_crop else 5
    oidx = jax.random.randint(k_off, (), 0, n_off)
    off_w = offsets[oidx, 0].astype(jnp.int32)
    off_h = offsets[oidx, 1].astype(jnp.int32)
    return crop_and_resize(clip, off_h, off_w, crop_h, crop_w, input_size)


# --------------------------------------------------------------------------- #
# pipelines
# --------------------------------------------------------------------------- #
def ssl_augment(
    key: jax.Array, clip: jnp.ndarray, out_hw: Tuple[int, int],
    mean, std,
    rrc_scale=(0.2, 1.0), jitter_p=0.8, gray_p=0.2, blur_p=0.5, flip_p=0.5,
    jitter_order: jnp.ndarray = None, compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """The SSL augmentation chain
    (reference: build_video_contrast_transform_cv2, transform/build.py:45-62):
    RRC(0.2-1.0) → ColorJitter(.4,.4,.4,.1)@p.8 → Gray@p.2 →
    GaussianBlur(σ∈[.1,2])@p.5 → HFlip@p.5 → Normalize.

    ``compute_dtype=bfloat16`` halves the bandwidth of the elementwise
    chain (pixel-value precision ~0.5% — irrelevant for augmentation)."""
    keys = jax.random.split(key, 7)
    clip = clip.astype(compute_dtype)
    t, c = clip.shape[0], clip.shape[-1]
    # Fold stacked RGB groups into frames for the color ops (see
    # ssl_augment_cf); Flow stacks skip the color ops entirely.
    groups = c // 3 if (c != 3 and c % 3 == 0) else 1
    if groups > 1:
        clip = jnp.moveaxis(clip.reshape(*clip.shape[:-1], groups, 3), -2, 1)
        clip = clip.reshape(t * groups, *clip.shape[2:])
    clip = random_resized_crop(keys[0], clip, out_hw, scale=rrc_scale)
    if clip.shape[-1] == 3:
        jittered = color_jitter(keys[1], clip, order=jitter_order)
        clip = jnp.where(jax.random.uniform(keys[2]) < jitter_p, jittered,
                         clip)
        clip = random_grayscale(keys[3], clip, p=gray_p)
    blurred = gaussian_blur(keys[4], clip)
    clip = jnp.where(jax.random.uniform(keys[5]) < blur_p, blurred, clip)
    clip = random_horizontal_flip(keys[6], clip, p=flip_p)
    if groups > 1:
        h2, w2 = clip.shape[1], clip.shape[2]
        clip = clip.reshape(t, groups, h2, w2, 3)
        clip = jnp.moveaxis(clip, 1, -2).reshape(t, h2, w2, c)
    return normalize(clip, mean, std)


def train_augment(
    key: jax.Array, clip: jnp.ndarray, out_hw: Tuple[int, int], mean, std,
    scales=(1.0, 0.875, 0.75, 0.66), flip_p=0.5, is_flow=False,
) -> jnp.ndarray:
    """Downstream train chain (reference: build_transform_cv2 train,
    transform/build.py:27-37): MultiScaleCrop → HFlip → Normalize."""
    k1, k2 = jax.random.split(key)
    clip = clip.astype(jnp.float32)
    clip = multi_scale_crop(k1, clip, out_hw, scales=scales)
    clip = random_horizontal_flip(k2, clip, p=flip_p, is_flow=is_flow)
    return normalize(clip, mean, std)


def temporal_shuffle(key: jax.Array, clip: jnp.ndarray) -> jnp.ndarray:
    """Randomly permute the frame (T) axis of a (T, H, W, C) clip.

    Reference: VideoTemporalShuffle (consistency_transforms.py:553-558),
    which is latently broken — it permutes axis 0 of the POST-ToTensor
    (T*C, H, W) array for 2D models, interleaving channels across frames.
    Fixed to intended behavior here (frames move as wholes; SURVEY.md §4
    convention), channels-last layout.  Unused by the shipped pipelines,
    exactly like the reference; available for temporal-order pretext
    tasks (jigsaw-style)."""
    perm = jax.random.permutation(key, clip.shape[0])
    return clip[perm]


def eval_transform(clip: jnp.ndarray, scale_hw, crop_hw, mean, std) -> jnp.ndarray:
    """Eval chain (reference: build_transform_cv2 val): Resize → CenterCrop
    → Normalize.  Fully static — no rng."""
    clip = clip.astype(jnp.float32)
    clip = resize_clip(clip, tuple(scale_hw))
    clip = center_crop(clip, tuple(crop_hw))
    return normalize(clip, mean, std)


def multi_crop_eval(
    clip: jnp.ndarray, scale_hw, crop_hw, n_crops: int, mean, std,
) -> jnp.ndarray:
    """Deterministic multi-crop test-time augmentation.

    (T, H, W, C) -> (n_crops, T, ch, cw, C).  Crop grids follow the
    reference: 1 = center (VideoCenterCrop); 3 = left/center/right full-res
    (VideoFullResSample, :509-551); 5 = 4 corners + center
    (VideoOverSampleCrop, :470-507); 6 / 10 = the 3- / 5-crop sets plus
    their horizontal flips.
    """
    clip = resize_clip(clip.astype(jnp.float32), tuple(scale_hw))
    H, W = scale_hw
    ch, cw = crop_hw
    flip = n_crops in (6, 10)
    base = {1: 1, 3: 3, 5: 5, 6: 3, 10: 5}[n_crops]

    if base == 1:
        offsets = [((H - ch) // 2, (W - cw) // 2)]
    elif base == 3:
        w4, h4 = (W - cw) // 4, (H - ch) // 4
        offsets = [(2 * h4, 0), (2 * h4, 4 * w4), (2 * h4, 2 * w4)]
    else:
        w4, h4 = (W - cw) // 4, (H - ch) // 4
        offsets = [(0, 0), (0, 4 * w4), (4 * h4, 0), (4 * h4, 4 * w4),
                   (2 * h4, 2 * w4)]

    crops = []
    for (oy, ox) in offsets:
        c = clip[:, oy:oy + ch, ox:ox + cw, :]
        crops.append(c)
    if flip:
        crops.extend([c[:, :, ::-1, :] for c in crops])
    out = jnp.stack(crops, axis=0)
    return normalize(out, mean, std)


# --------------------------------------------------------------------------- #
# channel-first hot path
#
# TPU tiles the two minor dims of an array; with channels-last clips the
# minor (lane) dim is C=3, padded to 128 lanes -> ~40x wasted bandwidth on
# every elementwise pass (measured: a bare hflip of (256,16,112,112,3)
# cost 14.5 ms vs ~0.4 ms of actual bytes).  The SSL chain therefore runs
# internally on (T, C, H, W) — lane dim W — and transposes back to the
# conv-friendly channels-last at the end.
# --------------------------------------------------------------------------- #
_LUMA = (0.299, 0.587, 0.114)


def _gray_cf(clip, keep_channels=True):
    g = (_LUMA[0] * clip[:, 0] + _LUMA[1] * clip[:, 1]
         + _LUMA[2] * clip[:, 2])[:, None]
    if keep_channels:
        g = jnp.broadcast_to(g, clip.shape)
    return g.astype(clip.dtype)


def _brightness_cf(clip, f):
    return jnp.clip(clip * f, 0.0, 255.0).astype(clip.dtype)


def _contrast_cf(clip, f):
    mean = jnp.mean(_gray_cf(clip, False).astype(jnp.float32),
                    axis=(-3, -2, -1), keepdims=True)
    return jnp.clip(clip * f + (mean * (1.0 - f)).astype(clip.dtype),
                    0.0, 255.0).astype(clip.dtype)


def _saturation_cf(clip, f):
    return jnp.clip(clip * f + _gray_cf(clip) * (1.0 - f),
                    0.0, 255.0).astype(clip.dtype)


def _hue_cf(clip, shift, internal=jnp.float32):
    """HSV hue shift on (T, C, H, W) pixels in [0, 255].

    Works in ``u = 6*h`` units so the whole round-trip needs ONE reciprocal
    and no div/mod: p/q/t come from ``maxc - delta*{1, f, 1-f}`` and the
    wrap of ``u + 6*shift`` is two selects (|shift| <= 0.5).  ``internal``
    is the arithmetic dtype — the SSL chain passes its compute dtype
    (bfloat16: ~1.4 degrees hue resolution, immaterial for a random
    augmentation and ~2x faster; golden parity vs torchvision is tested at
    float32).
    """
    x = clip.astype(internal)
    r, g, b = x[:, 0], x[:, 1], x[:, 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    inv = 1.0 / jnp.maximum(d, jnp.asarray(1e-6, internal))
    u = jnp.where(r == mx, (g - b) * inv,
                  jnp.where(g == mx, 2.0 + (b - r) * inv,
                            4.0 + (r - g) * inv))
    u = u + 6.0 * shift
    u = jnp.where(u < 0.0, u + 6.0, u)
    u = jnp.where(u >= 6.0, u - 6.0, u)
    i = jnp.floor(u)
    f = u - i
    p = mx - d
    q = mx - d * f
    t = mx - d * (1.0 - f)
    i = i.astype(jnp.int32)

    def sel(c0, c1, c2, c3, c4, c5):
        return jnp.where(i == 0, c0, jnp.where(i == 1, c1, jnp.where(
            i == 2, c2, jnp.where(i == 3, c3, jnp.where(i == 4, c4, c5)))))

    rgb = jnp.stack([sel(mx, q, p, p, t, mx), sel(t, mx, mx, q, p, p),
                     sel(p, p, t, mx, mx, q)], axis=1)
    return rgb.astype(clip.dtype)


# The 24 possible ColorJitter op orders.  Dispatching ONCE on the whole
# permutation (scalar lax.switch over 24 statically-ordered chains) instead
# of per-op (fori_loop of switches) lets XLA fuse the entire
# brightness/contrast/saturation chain into ~2 HBM passes per branch —
# measured 19.9 ms -> 7.5 ms on (256,16,3,112,112) bf16.
_JITTER_PERMS: Tuple[Tuple[int, ...], ...] = tuple(
    (a, b, c, d)
    for a in range(4) for b in range(4) for c in range(4) for d in range(4)
    if len({a, b, c, d}) == 4)


def _jitter_chain_cf(perm, clip, fb, fc, fs, fh, internal=jnp.float32):
    """Apply the four jitter ops in the STATIC order ``perm``."""
    ops = {
        0: lambda c: _brightness_cf(c, fb),
        1: lambda c: _contrast_cf(c, fc),
        2: lambda c: _saturation_cf(c, fs),
        3: lambda c: _hue_cf(c, fh, internal=internal),
    }
    for o in perm:
        clip = ops[o](clip)
    return clip


def _color_jitter_cf(key, clip, perm_id, brightness=0.4, contrast=0.4,
                     saturation=0.4, hue=0.1, internal=jnp.float32):
    """Clip-consistent ColorJitter on (T, C, H, W).

    ``perm_id``: scalar index into ``_JITTER_PERMS`` selecting the op
    order (reference: random.shuffle per clip,
    consistency_transforms.py:318-332).  Must be unbatched at trace time —
    a vmapped per-clip index would execute all 24 branches; the SSL
    pipeline shards the batch into order-groups instead
    (``make_batch_augment_fn``).
    """
    kb, kc, ks, kh = jax.random.split(key, 4)
    fb = jax.random.uniform(kb, (), minval=1 - brightness, maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=1 - saturation, maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    branches = [partial(_jitter_chain_cf, p, internal=internal)
                for p in _JITTER_PERMS]
    return jax.lax.switch(perm_id, branches, clip, fb, fc, fs, fh)


def _blur_matrix(size: int, sigma, kernel_size: int = 13):
    """Banded (size, size) blur matrix == zero-padded SAME gaussian conv."""
    r = kernel_size // 2
    d = (jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
         - jax.lax.broadcasted_iota(jnp.int32, (size, size), 1))
    w = jnp.exp(-(d.astype(jnp.float32) ** 2) / (2.0 * sigma ** 2))
    w = jnp.where(jnp.abs(d) <= r, w, 0.0)
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    norm = jnp.sum(jnp.exp(-(x ** 2) / (2.0 * sigma ** 2)))
    return w / norm


def _blur_cf(key, clip, sigma_limit=(0.1, 2.0)):
    """Separable gaussian blur as two MXU matmuls over H and W."""
    t, c, h, w = clip.shape
    sigma = jax.random.uniform(key, (), minval=sigma_limit[0],
                               maxval=sigma_limit[1])
    bw = _blur_matrix(w, sigma).astype(clip.dtype)
    bh = _blur_matrix(h, sigma).astype(clip.dtype)
    x = jnp.einsum("tchw,wk->tchk", clip, bw,
                   preferred_element_type=jnp.float32).astype(clip.dtype)
    x = jnp.einsum("tchw,hk->tckw", x, bh,
                   preferred_element_type=jnp.float32).astype(clip.dtype)
    return x


def _rrc_cf(key, clip, out_hw, scale=(0.2, 1.0),
            ratio=(3.0 / 4.0, 4.0 / 3.0), attempts: int = 10):
    """RandomResizedCrop on (T, C, H, W) — same parameterization as
    random_resized_crop, spatial dims (2, 3)."""
    t, c, H, W = clip.shape
    area = float(H * W)
    k_area, k_ratio, k_i, k_j = jax.random.split(key, 4)
    target_area = jax.random.uniform(k_area, (attempts,), minval=scale[0],
                                     maxval=scale[1]) * area
    aspect = jnp.exp(jax.random.uniform(
        k_ratio, (attempts,), minval=math.log(ratio[0]),
        maxval=math.log(ratio[1])))
    ws = jnp.round(jnp.sqrt(target_area * aspect)).astype(jnp.int32)
    hs = jnp.round(jnp.sqrt(target_area / aspect)).astype(jnp.int32)
    valid = (ws > 0) & (ws <= W) & (hs > 0) & (hs <= H)
    first = jnp.argmax(valid)
    any_valid = jnp.any(valid)
    w_sel, h_sel = ws[first], hs[first]
    u_i = jax.random.uniform(k_i, (attempts,))[first]
    u_j = jax.random.uniform(k_j, (attempts,))[first]
    i_sel = jnp.floor(u_i * (H - h_sel + 1).astype(jnp.float32)).astype(jnp.int32)
    j_sel = jnp.floor(u_j * (W - w_sel + 1).astype(jnp.float32)).astype(jnp.int32)
    in_ratio = float(W) / float(H)
    if in_ratio < ratio[0]:
        fw, fh = W, int(round(W / ratio[0]))
    elif in_ratio > ratio[1]:
        fh, fw = H, int(round(H * ratio[1]))
    else:
        fw, fh = W, H
    fi, fj = (H - fh) // 2, (W - fw) // 2
    h_f = jnp.where(any_valid, h_sel, fh)
    w_f = jnp.where(any_valid, w_sel, fw)
    i_f = jnp.where(any_valid, i_sel, fi)
    j_f = jnp.where(any_valid, j_sel, fj)

    oh, ow = out_hw
    sy = oh / h_f.astype(jnp.float32)
    sx = ow / w_f.astype(jnp.float32)
    return jax.image.scale_and_translate(
        clip, (t, c, oh, ow), spatial_dims=(2, 3),
        scale=jnp.stack([sy, sx]),
        translation=jnp.stack([-i_f.astype(jnp.float32) * sy,
                               -j_f.astype(jnp.float32) * sx]),
        method="linear", antialias=False)


def ssl_augment_cf(
    key: jax.Array, clip: jnp.ndarray, out_hw: Tuple[int, int],
    mean, std,
    rrc_scale=(0.2, 1.0), jitter_p=0.8, gray_p=0.2, blur_p=0.5, flip_p=0.5,
    jitter_perm_id=None, compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Channel-first implementation of ``ssl_augment`` (same math, TPU
    lane-efficient); input/output stay channels-last (T, H, W, C).

    ``jitter_perm_id``: scalar index into ``_JITTER_PERMS`` (must be
    unbatched at trace time — see ``_color_jitter_cf``); None samples one
    from the key."""
    keys = jax.random.split(key, 7)
    if jitter_perm_id is None:
        jitter_perm_id = jax.random.randint(
            jax.random.fold_in(keys[1], 1), (), 0, len(_JITTER_PERMS))
    x = jnp.transpose(clip, (0, 3, 1, 2)).astype(compute_dtype)  # (T,C,H,W)
    t, c = x.shape[0], x.shape[1]
    # new_length>1 stacks groups along C.  RGB-group stacks (C=3g) fold the
    # groups into the frame axis so the color ops see plain 3-channel frames
    # with identical factors across the stack; Flow (C=2·nl) has no color
    # semantics — jitter/grayscale become identity (the reference never
    # SSL-pretrains Flow; its PIL jitter would crash on it).
    groups = c // 3 if (c != 3 and c % 3 == 0) else 1
    if groups > 1:
        x = x.reshape(t * groups, 3, *x.shape[2:])
    x = _rrc_cf(keys[0], x, out_hw, scale=rrc_scale)
    if x.shape[1] == 3:
        jittered = _color_jitter_cf(keys[1], x, jitter_perm_id,
                                    internal=compute_dtype)
        x = jnp.where(jax.random.uniform(keys[2]) < jitter_p, jittered, x)
        x = jnp.where(jax.random.uniform(keys[3]) < gray_p, _gray_cf(x), x)
    blurred = _blur_cf(keys[4], x)
    x = jnp.where(jax.random.uniform(keys[5]) < blur_p, blurred, x)
    x = jnp.where(jax.random.uniform(keys[6]) < flip_p, x[..., ::-1], x)
    if groups > 1:
        x = x.reshape(t, c, *x.shape[2:])
    m = jnp.asarray(expand_stats(mean, c), jnp.float32).reshape(1, c, 1, 1) * 255.0
    s = jnp.asarray(expand_stats(std, c), jnp.float32).reshape(1, c, 1, 1) * 255.0
    x = ((x - m) / s).astype(compute_dtype)
    return jnp.transpose(x, (0, 2, 3, 1))


def make_batch_augment_fn(cfg, kind: str):
    """Build the batch-level augmentation as a plain traceable function
    (compose into a larger jitted step — e.g. fused into the train step —
    or jit directly via ``make_batch_augment``).

    kind='ssl':   (key, clips (B,V,T,H,W,C) uint8) -> float32 normalized
    kind='train': (key, clips (B,T,H,W,C) uint8)   -> float32 normalized
    kind='eval':  (clips (B,T,H,W,C) uint8)        -> float32 normalized
    """
    mean = tuple(cfg.INPUT.MEAN)
    std = tuple(cfg.INPUT.STD)
    out_hw = (int(cfg.INPUT.BASE_SIZE[0]), int(cfg.INPUT.BASE_SIZE[1]))
    crop_hw = (int(cfg.INPUT.CROP_SIZE[0]), int(cfg.INPUT.CROP_SIZE[1]))
    scale_hw = (int(cfg.INPUT.SCALE_SIZE[0]), int(cfg.INPUT.SCALE_SIZE[1]))
    flip_p = 0.5 if cfg.INPUT.FLIP else 0.0

    if kind == "ssl":
        compute_dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)

        def fn(key, clips):
            # Order-groups: the jitter op order must be a scalar at trace
            # time (see _color_jitter_cf), so the flattened (B*V) clip-views
            # are split into G groups, each drawing an independent random
            # order per step (lax.map keeps the per-group switch index
            # scalar).  With the shuffled sampler randomizing clip->group
            # assignment every epoch this is distributionally ~the
            # reference's per-clip shuffle; factors stay per-clip.
            b, v = clips.shape[0], clips.shape[1]
            n = b * v
            n_groups = next(g for g in (8, 4, 2, 1) if n % g == 0)
            k_perm, key = jax.random.split(key)
            perm_ids = jax.random.randint(k_perm, (n_groups,), 0,
                                          len(_JITTER_PERMS))
            keys = jax.random.split(key, n)
            flat = clips.reshape(n_groups, n // n_groups, *clips.shape[2:])
            keys = keys.reshape(n_groups, n // n_groups)

            def group(args):
                xg, kg, pid = args
                per_clip = partial(ssl_augment_cf, out_hw=out_hw, mean=mean,
                                   std=std, flip_p=flip_p,
                                   jitter_perm_id=pid,
                                   compute_dtype=compute_dtype)
                return jax.vmap(per_clip)(kg, xg)

            if os.environ.get("VGS_AUG_UNROLL") == "1":
                # Measurement gate: inline the G group programs instead of
                # the sequential lax.map while-loop, letting XLA overlap
                # groups.  MEASURED DEAD END (08-18, v5e full step:
                # 1359 -> 1316 clips/s, perf/CHIP_QUEUE_r03c.jsonl
                # `aug_unroll`): the while body already saturates the VPU
                # at group size 32, and inlining 8x the program only adds
                # scheduling/compile cost.  Kept as the measured witness.
                outs = [group((flat[i], keys[i], perm_ids[i]))
                        for i in range(n_groups)]
                out = jnp.stack(outs)
            else:
                out = jax.lax.map(group, (flat, keys, perm_ids))
            return out.reshape(b, v, *out.shape[2:])

        return fn

    if kind == "train":
        per_clip = partial(train_augment, out_hw=out_hw, mean=mean, std=std,
                           flip_p=flip_p,
                           is_flow=(cfg.INPUT.MODALITY == "Flow"))

        def fn(key, clips):
            keys = jax.random.split(key, clips.shape[0])
            return jax.vmap(per_clip)(keys, clips)

        return fn

    if kind == "eval":
        per_clip = partial(eval_transform, scale_hw=scale_hw, crop_hw=crop_hw,
                           mean=mean, std=std)

        def fn(clips):
            return jax.vmap(per_clip)(clips)

        return fn

    raise ValueError(f"unknown augment kind: {kind}")


def make_batch_augment(cfg, kind: str):
    """Jitted version of ``make_batch_augment_fn``."""
    return jax.jit(make_batch_augment_fn(cfg, kind))
