"""PIL/Group legacy transform family: offset-math golden tests.

The reference ships TWO transform families: the cv2 family
(consistency_transforms.py — the one this framework's device ops mirror,
bit-parity tested in test_transforms.py) and the PIL/Group legacy family
(video_transforms.py:1-379).  These tests EXECUTE the reference Group code
itself (torchvision stubbed — only imported at module top, never used by
the functions under test) and prove the device ops reproduce its crop
geometry:

* GroupMultiScaleCrop.fill_fix_offset (video_transforms.py:227-257): the
  13-offset grid.  NOTE the families genuinely differ on ragged sizes —
  Group uses integer steps ``(W-cw)//4`` while the cv2 family uses float
  ``/4`` (consistency_transforms.py:446-448); our random-training path
  follows the cv2 family, our deterministic eval grid uses the integer
  steps, and both coincide whenever (W-cw) % 4 == 0 (every standard
  geometry: 256/224, 171/112...).
* GroupOverSample 5/10-crop and GroupFullResSample 3/6-crop pixel windows
  (video_transforms.py:95-131, 133-177) vs multi_crop_eval — exact pixel
  equality, up to documented crop ORDER (the reference interleaves
  [crop, flip] per offset; we emit [crops..., flips...]; downstream score
  averaging is order-invariant, tools/test_ds.py).
* GroupMultiScaleCrop._sample_crop_size's candidate pair grid
  (video_transforms.py:199-216) vs msc_crop_pairs.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

from video_graph_ssl_tpu.data.transforms_device import (
    _fix_offsets_13,
    msc_crop_pairs,
    multi_crop_eval,
)

REF = "/root/reference/lib/data/transform/video_transforms.py"


@pytest.fixture(scope="module")
def ref_mod():
    pytest.importorskip("PIL")
    # video_transforms.py imports torchvision at module scope but the
    # classes under test never touch it — stub it out.
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.SimpleNamespace(CenterCrop=None, Resize=None)
        sys.modules["torchvision"] = tv
    spec = importlib.util.spec_from_file_location("ref_video_transforms", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_fill_fix_offset_13_grid(ref_mod):
    for (W, H, cw, ch) in [(256, 256, 224, 224), (171, 128, 112, 112),
                           (340, 256, 224, 224), (160, 120, 112, 96)]:
        ref = ref_mod.GroupMultiScaleCrop.fill_fix_offset(True, W, H, cw, ch)
        ours = np.asarray(_fix_offsets_13(W, H, float(cw), float(ch)))
        assert len(ref) == 13 == ours.shape[0]
        if (W - cw) % 4 == 0 and (H - ch) % 4 == 0:
            # families agree exactly on 4-divisible margins
            np.testing.assert_array_equal(
                ours, np.asarray(ref, np.float32))
        else:
            # documented divergence: Group floors the step (//4,
            # video_transforms.py:228-229); the cv2 family — and our
            # training path — keeps it fractional (/4,
            # consistency_transforms.py:447-448).  Same 13 multipliers.
            grid = [(0, 0), (4, 0), (0, 4), (4, 4), (2, 2),
                    (0, 2), (4, 2), (2, 4), (2, 0),
                    (1, 1), (3, 1), (1, 3), (3, 3)]
            w4i, h4i = (W - cw) // 4, (H - ch) // 4
            assert ref == [(gx * w4i, gy * h4i) for gx, gy in grid]
            expect_ours = np.asarray(
                [(gx * (W - cw) / 4.0, gy * (H - ch) / 4.0)
                 for gx, gy in grid], np.float32)
            np.testing.assert_allclose(ours, expect_ours, atol=1e-4)


def test_oversample_10_crop_pixels_match(ref_mod):
    from PIL import Image

    H = W = 40
    ch = cw = 24
    g = np.random.default_rng(0)
    frame = g.integers(0, 255, (H, W, 3), dtype=np.uint8)
    ref_crops = ref_mod.GroupOverSample((cw, ch), scale_size=None, flip=True)(
        [Image.fromarray(frame)])
    ref_arr = np.stack([np.asarray(c) for c in ref_crops])  # (10,ch,cw,3)

    clip = frame[None].astype(np.float32)                   # (T=1,H,W,3)
    ours = np.asarray(multi_crop_eval(
        clip, (H, W), (ch, cw), 10, mean=(0, 0, 0), std=(1 / 255.0,) * 3))
    ours = ours[:, 0]                                       # (10,ch,cw,3)

    # reference order: [o1, o1flip, o2, o2flip, ...]; ours: [o1..o5,
    # o1flip..o5flip] — reorder before comparing
    reorder = [2 * i for i in range(5)] + [2 * i + 1 for i in range(5)]
    np.testing.assert_allclose(ours, ref_arr[reorder], atol=1e-3)


def test_fullres_6_crop_pixels_match(ref_mod):
    from PIL import Image

    H = W = 48
    ch = cw = 32
    g = np.random.default_rng(1)
    frame = g.integers(0, 255, (H, W, 3), dtype=np.uint8)
    ref_crops = ref_mod.GroupFullResSample((cw, ch), scale_size=None,
                                           flip=True)([Image.fromarray(frame)])
    ref_arr = np.stack([np.asarray(c) for c in ref_crops])  # (6,ch,cw,3)

    clip = frame[None].astype(np.float32)
    ours = np.asarray(multi_crop_eval(
        clip, (H, W), (ch, cw), 6, mean=(0, 0, 0), std=(1 / 255.0,) * 3))[:, 0]

    reorder = [2 * i for i in range(3)] + [2 * i + 1 for i in range(3)]
    np.testing.assert_allclose(ours, ref_arr[reorder], atol=1e-3)


def test_fullres_3_and_oversample_5_no_flip(ref_mod):
    from PIL import Image

    H, W = 36, 44
    ch, cw = 24, 28
    g = np.random.default_rng(2)
    frame = g.integers(0, 255, (H, W, 3), dtype=np.uint8)
    for n, cls in ((3, ref_mod.GroupFullResSample),
                   (5, ref_mod.GroupOverSample)):
        ref_crops = cls((cw, ch), scale_size=None, flip=False)(
            [Image.fromarray(frame)])
        ref_arr = np.stack([np.asarray(c) for c in ref_crops])
        ours = np.asarray(multi_crop_eval(
            frame[None].astype(np.float32), (H, W), (ch, cw), n,
            mean=(0, 0, 0), std=(1 / 255.0,) * 3))[:, 0]
        np.testing.assert_allclose(ours, ref_arr, atol=1e-3)


def test_multiscale_pair_grid_matches(ref_mod):
    for (W, H, inp) in [(171, 128, 112), (256, 256, 224), (120, 90, 84)]:
        ref = ref_mod.GroupMultiScaleCrop(inp)
        crop_w, crop_h, _, _ = 0, 0, 0, 0
        # reproduce _sample_crop_size's pair enumeration
        base = min(W, H)
        crop_sizes = [int(base * s) for s in ref.scales]
        ch_opts = [inp if abs(x - inp) < 3 else x for x in crop_sizes]
        cw_opts = [inp if abs(x - inp) < 3 else x for x in crop_sizes]
        ref_pairs = [(w, h) for i, h in enumerate(ch_opts)
                     for j, w in enumerate(cw_opts)
                     if abs(i - j) <= ref.max_distort]
        assert msc_crop_pairs(H, W, (inp, inp)) == ref_pairs
        # sanity vs the reference's own sampler output domain
        import random
        random.seed(0)
        for _ in range(20):
            cw_s, ch_s, _, _ = ref._sample_crop_size((W, H))
            assert (cw_s, ch_s) in ref_pairs
