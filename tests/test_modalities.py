"""new_length consecutive-frame loading, Flow stacking, RGBDiff differencing.

Reference semantics: dataset.py:178-191 (per-index consecutive loading with
``p += 1`` saturating at num_frames), model_wrappers.py:41-45 (by-modality
new_length defaults), video_transforms.py:54-56 (flow flip inversion),
GroupNormalize (stat tiling across stacked groups).
"""

import os

import numpy as np
import pytest

from video_graph_ssl_tpu.data import decode
from video_graph_ssl_tpu.data.datasets import ContrastiveDataset, FrameDataset
from video_graph_ssl_tpu.data import transforms_device as T
from video_graph_ssl_tpu.models.wrappers import rgb_diff

cv2 = pytest.importorskip("cv2")


N_FRAMES = 6
HW = (16, 16)


@pytest.fixture(scope="module")
def frame_dir(tmp_path_factory):
    """A frame folder with RGB frames img_{i:05d}.jpg and flow pairs
    flow_{x,y}_{i:05d}.jpg, each frame a distinct solid value."""
    d = tmp_path_factory.mktemp("vid") / "clip0"
    d.mkdir()
    for i in range(1, N_FRAMES + 1):
        img = np.full((HW[0], HW[1], 3), i * 30, np.uint8)
        cv2.imwrite(str(d / f"img_{i:05d}.jpg"), img)
        for ax in ("x", "y"):
            g = np.full(HW, i * 20 + (5 if ax == "y" else 0), np.uint8)
            cv2.imwrite(str(d / f"flow_{ax}_{i:05d}.jpg"), g)
    return str(d)


def _single(frame_dir, idx):
    return decode.load_clip(frame_dir, "img_{:05d}.jpg", [idx])[0]


def test_new_length_stacks_consecutive(frame_dir):
    clip = decode.load_clip(frame_dir, "img_{:05d}.jpg", [1, 3],
                            new_length=3, num_frames=N_FRAMES)
    assert clip.shape == (2, HW[0], HW[1], 9)
    for t, start in enumerate([1, 3]):
        for j in range(3):
            np.testing.assert_array_equal(
                clip[t, ..., 3 * j:3 * j + 3], _single(frame_dir, start + j))


def test_new_length_saturates_at_num_frames(frame_dir):
    # reference dataset.py:188 — p only advances while p < num_frames
    clip = decode.load_clip(frame_dir, "img_{:05d}.jpg", [N_FRAMES - 1],
                            new_length=4, num_frames=N_FRAMES)
    assert clip.shape[-1] == 12
    last = _single(frame_dir, N_FRAMES)
    np.testing.assert_array_equal(clip[0, ..., 3:6], last)
    np.testing.assert_array_equal(clip[0, ..., 6:9], last)   # saturated
    np.testing.assert_array_equal(clip[0, ..., 9:12], last)  # saturated


def test_flow_stacks_xy_interleaved(frame_dir):
    clip = decode.load_clip(frame_dir, "flow_{}_{:05d}.jpg", [2],
                            modality="Flow", new_length=3,
                            num_frames=N_FRAMES)
    assert clip.shape == (1, HW[0], HW[1], 6)
    for j in range(3):
        x, y = decode.load_flow_pair(frame_dir, "flow_{}_{:05d}.jpg", 2 + j)
        np.testing.assert_array_equal(clip[0, ..., 2 * j], x)
        np.testing.assert_array_equal(clip[0, ..., 2 * j + 1], y)


def test_frame_dataset_rgbdiff_adds_one(frame_dir, tmp_path):
    root, name = os.path.split(frame_dir)
    lst = tmp_path / "split.txt"
    lst.write_text(f"{name} {N_FRAMES} 0\n")
    ds = FrameDataset(root_path=root, list_file=str(lst), video_length=2,
                      modality="RGBDiff", new_length=2, random_shift=False,
                      canvas_hw=HW)
    out = ds.__getitem__(0, np.random.default_rng(0))
    # (new_length+1) * 3 channels loaded; differencing happens on device
    assert out["clips"].shape[-1] == 9


def test_contrastive_dataset_flow_channels(frame_dir, tmp_path):
    root, name = os.path.split(frame_dir)
    lst = tmp_path / "split.txt"
    lst.write_text(f"{name} {N_FRAMES} 0\n")
    ds = ContrastiveDataset(root_path=root, list_file=str(lst),
                            video_length=2, modality="Flow",
                            image_tmpl="flow_{}_{:05d}.jpg", new_length=2,
                            canvas_hw=HW)
    out = ds.__getitem__(0, np.random.default_rng(0))
    assert out["clips"].shape == (2, 2, HW[0], HW[1], 4)


def test_rgb_diff_values():
    import jax.numpy as jnp
    x = jnp.arange(2 * 1 * 1 * 9, dtype=jnp.float32).reshape(2, 1, 1, 9)
    d = rgb_diff(x)
    assert d.shape == (2, 1, 1, 6)
    np.testing.assert_allclose(np.asarray(d), 3.0)  # groups differ by 3


def test_expand_stats():
    assert T.expand_stats([0.5, 0.4, 0.3], 3) == (0.5, 0.4, 0.3)
    assert T.expand_stats([0.5, 0.4, 0.3], 6) == (0.5, 0.4, 0.3) * 2
    m = T.expand_stats([0.3, 0.6, 0.6], 10)
    assert m == (0.5,) * 10  # Flow (2·nl not divisible by 3): mean-of-stats


def test_normalize_stacked_channels():
    import jax.numpy as jnp
    clip = jnp.full((1, 2, 2, 6), 255.0)
    out = T.normalize(clip, [1.0, 1.0, 1.0], [1.0, 1.0, 1.0])
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)


@pytest.mark.parametrize("c", [6, 10])
def test_ssl_augment_cf_multichannel(c):
    import jax
    import jax.numpy as jnp
    clip = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (4, 20, 20, c), np.uint8))
    fn = jax.jit(lambda k, x: T.ssl_augment_cf(
        k, x, (16, 16), [0.45, 0.45, 0.45], [0.225, 0.225, 0.225]))
    out = fn(jax.random.PRNGKey(0), clip)
    assert out.shape == (4, 16, 16, c)
    assert np.isfinite(np.asarray(out)).all()


def test_flow_flip_inverts_x_channels():
    import jax
    import jax.numpy as jnp
    clip = jnp.stack([jnp.full((1, 2, 2), 100.0),
                      jnp.full((1, 2, 2), 60.0)], axis=-1)  # (1,2,2,2) x,y
    out = T.random_horizontal_flip(jax.random.PRNGKey(0), clip, p=1.0,
                                   is_flow=True)
    np.testing.assert_allclose(np.asarray(out[..., 0]), 155.0)  # 255-100
    np.testing.assert_allclose(np.asarray(out[..., 1]), 60.0)


def test_encoder_forward_flow_and_rgbdiff(tiny_cfg):
    """End-to-end: cfg modality plumbs to the encoder and the channel
    arithmetic works through the backbone."""
    import jax
    import jax.numpy as jnp
    from video_graph_ssl_tpu.models.build import encoder_cfg_from
    from video_graph_ssl_tpu.models.wrappers import VisualEncoder

    for modality, nl, c_in in [("Flow", 2, 4), ("RGBDiff", 2, 9)]:
        c = tiny_cfg.clone()
        c.defrost()
        c.INPUT.MODALITY = modality
        c.INPUT.NEW_LENGTH = nl
        c.freeze()
        enc_kwargs, feat_dim = encoder_cfg_from(c, aug_flag=False)
        enc = VisualEncoder(**enc_kwargs)
        x = jnp.zeros((2, 4, 16, 16, c_in), jnp.float32)
        variables = jax.jit(enc.init, static_argnames="train")(
            jax.random.PRNGKey(0), x, train=False)
        y = jax.jit(enc.apply, static_argnames="train")(
            variables, x, train=False)
        assert y.shape == (2, feat_dim)
