"""Shared test fixtures.

Tests run on whatever backend JAX resolves (the real TPU chip when
available, else CPU).  Multi-device mesh tests spawn a subprocess with a
fake 8-device CPU platform (see test_sharding.py) because the interpreter's
backend is already initialized by the time pytest imports.

Everything that touches a model keeps shapes micro (tiny3d backbone,
<=8x16x16 clips) and jits every traced computation — eager per-op dispatch
on remote TPU backends is orders of magnitude slower than compiled code.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def tiny_cfg():
    from video_graph_ssl_tpu.config import cfg

    c = cfg.clone()
    c.MODEL.BACKBONE = "tiny3d"
    c.MODEL.BACKBONE_TYPE = "3D"
    c.MODEL.AUG_FLAG = True
    c.MODEL.DROPOUT = 0.0
    c.INPUT.BASE_SIZE = [16, 16]
    c.INPUT.CROP_SIZE = [16, 16]
    c.INPUT.SCALE_SIZE = [20, 20]
    c.INPUT.VIDEO_LENGTH = 4
    c.DATASET.NUM_CLASS = 8
    c.DATASET.SOURCE = "synthetic"
    c.DATALOADER.BATCH_SIZE = 4
    c.TEST.BATCH_SIZE = 4
    c.DATALOADER.NUM_WORKERS = 2
    c.CONTRAST.NCE_K = 16
    c.CROSS.FEAT_DIM = 32
    c.TPU.COMPUTE_DTYPE = "float32"
    return c


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
