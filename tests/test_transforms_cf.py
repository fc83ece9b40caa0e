"""Channel-first (TPU lane-efficient) augment ops match the channels-last
reference implementations."""

import numpy as np
import jax
import jax.numpy as jnp

from video_graph_ssl_tpu.data import transforms_device as T

MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def _clip_hw_c(t=2, h=16, w=16):
    return jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (t, h, w, 3)), jnp.float32)


def _to_cf(x):
    return jnp.transpose(x, (0, 3, 1, 2))


def _from_cf(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def test_gray_cf_matches():
    x = _clip_hw_c()
    np.testing.assert_allclose(
        np.asarray(_from_cf(T._gray_cf(_to_cf(x)))),
        np.asarray(T.rgb_to_grayscale(x)), rtol=1e-5)


def test_photometric_cf_matches():
    x = _clip_hw_c()
    for cf_op, cl_op, arg in [
        (T._brightness_cf, T.adjust_brightness, 1.3),
        (T._contrast_cf, T.adjust_contrast, 0.7),
        (T._saturation_cf, T.adjust_saturation, 1.2),
        (T._hue_cf, T.adjust_hue, 0.07),
    ]:
        got = np.asarray(_from_cf(cf_op(_to_cf(x), arg)))
        want = np.asarray(cl_op(x, arg))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-2,
                                   err_msg=str(cf_op))


def test_blur_cf_matches_conv():
    x = _clip_hw_c()
    key = jax.random.key(3)
    got = np.asarray(_from_cf(jax.jit(T._blur_cf)(key, _to_cf(x))))
    want = np.asarray(jax.jit(T.gaussian_blur)(key, x))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=0.25)


def test_rrc_cf_same_key_same_crop():
    """Same PRNG sub-split order => identical crop geometry."""
    x = _clip_hw_c(2, 32, 32)
    key = jax.random.key(5)
    got = np.asarray(_from_cf(jax.jit(
        lambda k, c: T._rrc_cf(k, c, (16, 16)))(key, _to_cf(x))))
    want = np.asarray(jax.jit(
        lambda k, c: T.random_resized_crop(k, c, (16, 16)))(key, x))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=0.5)


def test_ssl_augment_cf_stats():
    """Full cf pipeline: normalized output statistics in a sane range and
    deterministic for a fixed key."""
    x = jnp.asarray(np.random.default_rng(1).integers(
        0, 256, (4, 16, 16, 3)), jnp.float32)
    f = jax.jit(lambda k, c: T.ssl_augment_cf(k, c, (12, 12), MEAN, STD))
    o1 = f(jax.random.key(0), x)
    o2 = f(jax.random.key(0), x)
    assert o1.shape == (4, 12, 12, 3)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    m = float(o1.astype(jnp.float32).mean())
    s = float(o1.astype(jnp.float32).std())
    assert -2.5 < m < 2.5 and 0.05 < s < 3.0
