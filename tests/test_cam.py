"""Grad-CAM tool (tools/cam.py) — unit coverage.

The reference demonstrates CAM heatmaps as a headline figure
(README.md:66-70, fig/cam_1.png) but ships no producing code; tools/cam.py
is that capability.  These tests pin the mechanics on the tiny backbone:
the captured-activation head recompute matches the model's own forward
(the tool's built-in drift guard), the CAM has the input geometry and
[0, 1] range, and class selection changes the map.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


@pytest.fixture(scope="module")
def cam_setup(request):
    tiny_cfg = request.getfixturevalue("tiny_cfg")
    import jax
    import numpy as np

    from cam import _HEADS, build_cam_fn
    from video_graph_ssl_tpu.engine import create_downstream_state
    from video_graph_ssl_tpu.models import create_video_model

    c = tiny_cfg.clone()
    c.MODEL.AUG_FLAG = False
    model, _ = create_video_model(c)
    t = int(c.INPUT.VIDEO_LENGTH)
    base = (int(c.INPUT.CROP_SIZE[0]), int(c.INPUT.CROP_SIZE[1]))
    example = np.zeros((2, t, *base, 3), np.float32)
    state, _tx = create_downstream_state(c, model, example)
    layer = _HEADS[c.MODEL.BACKBONE][1]
    cam_fn = build_cam_fn(c, model, c.MODEL.BACKBONE, layer, (t, *base))
    canvas = (int(c.INPUT.SCALE_SIZE[0]), int(c.INPUT.SCALE_SIZE[1]))
    raw = np.random.default_rng(0).integers(
        0, 256, (3, t, *canvas, 3), dtype=np.uint8)
    return cam_fn, state, raw, (t, *base)


def test_cam_shape_range_and_head_selfcheck(cam_setup):
    cam_fn, state, raw, thw = cam_setup
    cam, logits, head_err = cam_fn(state, raw, -1)
    assert float(head_err) < 1e-4, "head recompute drifted from model fwd"
    assert cam.shape == (3, *thw)
    assert logits.shape[0] == 3
    c = np.asarray(cam)
    assert np.all(c >= 0.0) and np.all(c <= 1.0 + 1e-6)
    assert np.isclose(c.reshape(3, -1).max(axis=1), 1.0, atol=1e-5).all()


def test_cam_class_selection_changes_map(cam_setup):
    cam_fn, state, raw, _ = cam_setup
    cam0 = np.asarray(cam_fn(state, raw, 0)[0])
    cam5 = np.asarray(cam_fn(state, raw, 5)[0])
    assert not np.allclose(cam0, cam5)
