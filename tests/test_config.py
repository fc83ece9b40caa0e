"""Config system: yacs-compatible semantics + reference YAML schema."""

import os

import pytest

from video_graph_ssl_tpu.config import cfg, CfgNode

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


def test_defaults_sections():
    for section in ("MODEL", "INPUT", "DATASET", "DATALOADER", "SOLVER",
                    "APEX", "TEST", "CHECKPOINT", "CONTRAST", "CROSS",
                    "GRAPH", "TPU"):
        assert section in cfg, section


def test_clone_independent():
    c = cfg.clone()
    c.MODEL.BACKBONE = "S3D"
    assert cfg.MODEL.BACKBONE != "S3D" or c is not cfg
    c2 = c.clone()
    c2.MODEL.BACKBONE = "resnet3d_18"
    assert c.MODEL.BACKBONE == "S3D"


def test_merge_from_list_types():
    c = cfg.clone()
    c.merge_from_list(["SOLVER.BASE_LR", "0.5", "MODEL.AUG_FLAG", "True",
                       "SOLVER.STEPS", "[10, 20]"])
    assert c.SOLVER.BASE_LR == 0.5
    assert c.MODEL.AUG_FLAG is True
    assert tuple(c.SOLVER.STEPS) == (10, 20)


def test_merge_from_list_rejects_unknown():
    c = cfg.clone()
    with pytest.raises(AssertionError):
        c.merge_from_list(["SOLVER.NOT_A_KEY", "1"])


def test_freeze_blocks_writes():
    c = cfg.clone()
    c.freeze()
    with pytest.raises(AttributeError):
        c.MODEL.BACKBONE = "X"
    c.defrost()
    c.MODEL.BACKBONE = "X"
    assert c.MODEL.BACKBONE == "X"


@pytest.mark.parametrize("name", [
    "visual_moco.yaml", "visual_simsiam.yaml",
    "action_fine_tune.yaml", "action_linear_probe.yaml",
    "smoke_simsiam.yaml", "smoke_ds.yaml",
])
def test_shipped_configs_load(name):
    c = cfg.clone()
    c.merge_from_file(os.path.join(CONFIG_DIR, name))
    assert c.MODEL.BACKBONE_TYPE in ("2D", "3D")


def test_dump_roundtrip(tmp_path):
    c = cfg.clone()
    c.SOLVER.BASE_LR = 0.123
    p = tmp_path / "c.yaml"
    p.write_text(c.dump())
    c2 = cfg.clone()
    c2.merge_from_file(str(p))
    assert c2.SOLVER.BASE_LR == 0.123
