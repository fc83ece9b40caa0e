"""On-device transforms: shapes, golden normalization, clip consistency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_graph_ssl_tpu.data.transforms_device import (
    adjust_brightness,
    center_crop,
    color_jitter,
    crop_and_resize,
    gaussian_blur,
    multi_crop_eval,
    multi_scale_crop,
    normalize,
    random_horizontal_flip,
    random_resized_crop,
    rgb_to_grayscale,
    rgb_to_hsv,
    hsv_to_rgb,
)

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def _clip(t=3, h=24, w=32):
    return jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (t, h, w, 3)),
        jnp.float32)


def test_normalize_golden():
    clip = jnp.full((1, 2, 2, 3), 255.0)
    out = normalize(clip, MEAN, STD)
    expect = (1.0 - np.asarray(MEAN)) / np.asarray(STD)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expect, rtol=1e-5)


def test_center_crop_golden():
    clip = _clip(2, 10, 12)
    out = center_crop(clip, (4, 6))
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(clip[:, 3:7, 3:9, :]))


def test_crop_and_resize_identity():
    clip = _clip(2, 8, 8)
    out = jax.jit(lambda c: crop_and_resize(
        c, jnp.int32(0), jnp.int32(0), jnp.int32(8), jnp.int32(8), (8, 8)))(clip)
    np.testing.assert_allclose(np.asarray(out), np.asarray(clip),
                               rtol=1e-4, atol=1e-2)


def test_crop_and_resize_matches_cv2():
    """Bit-parity with cv2.INTER_LINEAR — the reference's resize
    (consistency_transforms.py uses cv2 resizes throughout)."""
    cv2 = pytest.importorskip("cv2")
    clip = np.asarray(_clip(2, 16, 16))
    out = jax.jit(lambda c: crop_and_resize(
        c, jnp.int32(4), jnp.int32(2), jnp.int32(8), jnp.int32(8), (4, 4)))(
        jnp.asarray(clip))
    ref = np.stack([cv2.resize(clip[i, 4:12, 2:10, :], (4, 4),
                               interpolation=cv2.INTER_LINEAR)
                    for i in range(2)])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=0.01)


def test_rrc_shape_and_determinism():
    clip = _clip()
    f = jax.jit(lambda k, c: random_resized_crop(k, c, (16, 16)))
    o1 = f(jax.random.key(0), clip)
    o2 = f(jax.random.key(0), clip)
    assert o1.shape == (3, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = f(jax.random.key(1), clip)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))


def test_hsv_roundtrip():
    rgb = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (5, 5, 3)),
                      jnp.float32)
    back = hsv_to_rgb(rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb),
                               rtol=1e-4, atol=1e-4)


def test_grayscale_luma():
    clip = jnp.asarray([[[[100.0, 50.0, 200.0]]]])
    g = rgb_to_grayscale(clip)
    expect = 0.299 * 100 + 0.587 * 50 + 0.114 * 200
    np.testing.assert_allclose(np.asarray(g[0, 0, 0]), expect, rtol=1e-5)
    assert g.shape == clip.shape


def test_brightness():
    clip = jnp.full((1, 2, 2, 3), 100.0)
    np.testing.assert_allclose(np.asarray(adjust_brightness(clip, 1.5)), 150.0)
    np.testing.assert_allclose(np.asarray(adjust_brightness(clip, 3.0)), 255.0)


def test_color_jitter_clip_consistent():
    """All frames of one clip must receive identical parameters."""
    frame = np.random.default_rng(2).integers(0, 256, (8, 8, 3))
    clip = jnp.asarray(np.stack([frame, frame]), jnp.float32)
    out = jax.jit(lambda k, c: color_jitter(k, c))(jax.random.key(0), clip)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]),
                               rtol=1e-5)


def test_gaussian_blur_preserves_mean():
    clip = _clip(2, 16, 16)
    out = jax.jit(lambda k, c: gaussian_blur(k, c))(jax.random.key(0), clip)
    assert out.shape == clip.shape
    # interior mean approximately preserved (SAME padding edge effects)
    assert abs(float(out[:, 4:-4, 4:-4].mean())
               - float(clip[:, 4:-4, 4:-4].mean())) < 8.0


def test_hflip():
    clip = _clip()
    flipped = jax.jit(lambda k, c: random_horizontal_flip(k, c, p=1.0))(
        jax.random.key(0), clip)
    np.testing.assert_array_equal(np.asarray(flipped),
                                  np.asarray(clip)[:, :, ::-1, :])
    same = jax.jit(lambda k, c: random_horizontal_flip(k, c, p=0.0))(
        jax.random.key(0), clip)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(clip))


def test_multi_scale_crop_shape():
    clip = _clip(2, 40, 40)
    out = jax.jit(lambda k, c: multi_scale_crop(k, c, (32, 32)))(
        jax.random.key(0), clip)
    assert out.shape == (2, 32, 32, 3)


@pytest.mark.parametrize("n,expected", [(1, 1), (3, 3), (5, 5), (6, 6), (10, 10)])
def test_multi_crop_eval_counts(n, expected):
    clip = _clip(2, 40, 40)
    out = multi_crop_eval(clip, (40, 40), (32, 32), n, MEAN, STD)
    assert out.shape == (expected, 2, 32, 32, 3)


def test_multi_crop_flip_pairs():
    clip = _clip(2, 40, 40)
    out = multi_crop_eval(clip, (40, 40), (32, 32), 10, MEAN, STD)
    # crops 5..9 are horizontal flips of crops 0..4
    np.testing.assert_allclose(np.asarray(out[5]),
                               np.asarray(out[0])[:, :, ::-1, :], rtol=1e-5)


def test_gaussian_noise():
    from video_graph_ssl_tpu.data.transforms_device import gaussian_noise

    clip = jnp.full((2, 8, 8, 3), 128.0)
    noisy = jax.jit(lambda k, c: gaussian_noise(k, c, p=1.0))(
        jax.random.key(0), clip)
    assert not np.allclose(np.asarray(noisy), 128.0)
    assert float(noisy.min()) >= 0.0 and float(noisy.max()) <= 255.0
    same = jax.jit(lambda k, c: gaussian_noise(k, c, p=0.0))(
        jax.random.key(0), clip)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(clip))


def test_random_rotate90():
    from video_graph_ssl_tpu.data.transforms_device import random_rotate90

    clip = _clip(2, 16, 16)
    rot = jax.jit(lambda k, c: random_rotate90(k, c, p=1.0))(
        jax.random.key(0), clip)
    np.testing.assert_array_equal(np.asarray(rot),
                                  np.rot90(np.asarray(clip), 1, (1, 2)))


def test_random_crop():
    from video_graph_ssl_tpu.data.transforms_device import random_crop

    clip = _clip(2, 20, 24)
    out = jax.jit(lambda k, c: random_crop(k, c, (8, 10)))(
        jax.random.key(0), clip)
    assert out.shape == (2, 8, 10, 3)
    # crop content must be a contiguous window of the source
    src = np.asarray(clip)
    got = np.asarray(out)
    found = any(
        np.array_equal(src[:, y:y + 8, x:x + 10, :], got)
        for y in range(13) for x in range(15))
    assert found


def test_temporal_shuffle():
    """Frames permute as wholes (reference VideoTemporalShuffle is broken:
    it permutes the (T*C, H, W) post-ToTensor axis, interleaving channels
    — fixed to intended semantics, consistency_transforms.py:553-558)."""
    import jax
    from video_graph_ssl_tpu.data.transforms_device import temporal_shuffle

    clip = jnp.arange(6 * 2 * 2 * 3, dtype=jnp.float32).reshape(6, 2, 2, 3)
    out = jax.jit(temporal_shuffle)(jax.random.key(3), clip)
    assert out.shape == clip.shape
    # each output frame is exactly one input frame (no channel mixing)
    inset = {tuple(np.asarray(f).ravel()) for f in clip}
    outset = {tuple(np.asarray(f).ravel()) for f in out}
    assert inset == outset
    # and some key actually permutes (6! orders; key 3 must not be identity
    # AND shuffle must be deterministic under jit)
    out2 = jax.jit(temporal_shuffle)(jax.random.key(3), clip)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
