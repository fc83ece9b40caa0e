"""AOT export tool (tools/export_model.py): serving artifact round trip.

Beyond the reference (which ships only research eval scripts): the whole
inference function — uint8 canvas -> center crop/normalize -> encoder —
is serialized via jax.export and must reproduce the live model exactly
when deserialized with no model code.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def ssl_ckpt(tmp_path_factory):
    import numpy as np
    from video_graph_ssl_tpu.config import cfg as CFG
    from video_graph_ssl_tpu.engine import create_pretrain_state
    from video_graph_ssl_tpu.models import create_visual_model
    from video_graph_ssl_tpu.utils.checkpoint import save_checkpoint_state

    c = CFG.clone()
    c.MODEL.BACKBONE = "tiny3d"
    c.MODEL.BACKBONE_TYPE = "3D"
    c.INPUT.BASE_SIZE = [16, 16]
    c.INPUT.CROP_SIZE = [16, 16]
    c.INPUT.SCALE_SIZE = [20, 20]
    c.INPUT.VIDEO_LENGTH = 4
    c.CONTRAST.MEM_TYPE = "simsiam"
    c.CROSS.FEAT_DIM = 32
    c.DATASET.SOURCE = "synthetic"
    c.TPU.COMPUTE_DTYPE = "float32"
    model, _ = create_visual_model(c)
    example = np.zeros((2, 2, 4, 16, 16, 3), np.float32)
    state, _ = create_pretrain_state(c, model, example, n_data=8)
    path = str(tmp_path_factory.mktemp("ckpt") / "checkpoint_1.msgpack")
    save_checkpoint_state(path, state, epoch=1)
    return c, path


def test_export_encoder_roundtrip(ssl_ckpt, tmp_path):
    import jax

    from tools.export_model import main

    c, path = ssl_ckpt
    out = str(tmp_path / "export")
    # main() revalidates: it asserts live-vs-artifact max error < 1e-4
    rc = main([
        "--checkpoint", path, "--what", "encoder", "--output", out,
        "--batch", "2", "--platforms=" + jax.default_backend(),
        "MODEL.BACKBONE", "tiny3d", "MODEL.BACKBONE_TYPE", "3D",
        "INPUT.BASE_SIZE", "[16, 16]", "INPUT.CROP_SIZE", "[16, 16]",
        "INPUT.SCALE_SIZE", "[20, 20]", "INPUT.VIDEO_LENGTH", "4",
        "CONTRAST.MEM_TYPE", "simsiam", "CROSS.FEAT_DIM", "32",
        "TPU.COMPUTE_DTYPE", "float32",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "encoder.stablehlo"))
    assert os.path.exists(os.path.join(out, "encoder.manifest.json"))

    # consume the artifact with NO framework code, as a server would
    import json

    import jax.export

    with open(os.path.join(out, "encoder.stablehlo"), "rb") as f:
        exp = jax.export.deserialize(bytearray(f.read()))
    man = json.load(open(os.path.join(out, "encoder.manifest.json")))
    raw = np.random.default_rng(0).integers(
        0, 256, tuple(man["input"]["shape"]), dtype=np.uint8)
    feats = np.asarray(exp.call(raw))
    assert feats.shape == (2, man["output"]["dim"])
    assert np.isfinite(feats).all()
