"""Multi-chip sharding on a fake 8-device CPU mesh.

Runs in a subprocess because this interpreter's JAX backend is already
initialized (axon sitecustomize); the subprocess clears PYTHONPATH and
forces an 8-device CPU platform — JAX's standard fake-multichip harness
(SURVEY.md §4).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import numpy as np, jax, jax.numpy as jnp
assert len(jax.devices()) == 8, jax.devices()
import sys; sys.path.insert(0, %(repo)r)
from video_graph_ssl_tpu.config import cfg as CFG
from video_graph_ssl_tpu.models import create_visual_model
from video_graph_ssl_tpu.engine import create_pretrain_state, make_pretrain_step
from video_graph_ssl_tpu.parallel import make_mesh, shard_batch, replicate_state

cfg = CFG.clone()
cfg.MODEL.BACKBONE = 'tiny3d'; cfg.MODEL.BACKBONE_TYPE = '3D'
cfg.MODEL.AUG_FLAG = True; cfg.MODEL.DROPOUT = 0.0
cfg.CONTRAST.MEM_TYPE = 'moco'; cfg.CONTRAST.NCE_K = 32
cfg.CROSS.FEAT_DIM = 16; cfg.TPU.COMPUTE_DTYPE = 'float32'

mesh = make_mesh((-1,), ('data',))
assert mesh.shape['data'] == 8

model, _ = create_visual_model(cfg)
B, T, H, W = 16, 4, 16, 16
example = jnp.zeros((2, T, H, W, 3), jnp.float32)
state, tx = create_pretrain_state(cfg, model, example, n_data=64)
state = replicate_state(state, mesh)
step = jax.jit(make_pretrain_step(cfg, model, tx), donate_argnums=0)

batch = {'clips': np.random.default_rng(0).normal(size=(B, 2, T, H, W, 3)).astype(np.float32),
         'label': np.zeros(B, np.int32), 'index': np.arange(B, dtype=np.int32)}
batch = shard_batch(batch, mesh)
# batch really is sharded over 8 devices
assert len(batch['clips'].sharding.device_set) == 8

state, metrics = step(state, batch, 0.1)
state, metrics = step(state, batch, 0.1)
loss = float(metrics['loss'])
assert np.isfinite(loss)
# queue update saw the GLOBAL batch: 16 rows written after 1 step
assert int(state.contrast.ptr) == (2 * B) %% 32
# state stays replicated across all devices
assert len(jax.tree_util.tree_leaves(state.params)[0].sharding.device_set) == 8
print('SHARDING_OK', loss)
"""


EQUIV_SCRIPT = r"""
import numpy as np, jax, jax.numpy as jnp
assert len(jax.devices()) == 8, jax.devices()
import sys; sys.path.insert(0, %(repo)r)
from video_graph_ssl_tpu.config import cfg as CFG
from video_graph_ssl_tpu.models import create_visual_model
from video_graph_ssl_tpu.engine import create_pretrain_state, make_fused_pretrain_step
from video_graph_ssl_tpu.parallel import make_mesh, shard_batch, replicate_state

# The REAL flagship backbone (S3D + graph aug) at its minimum legal shape
# (T=8, 32x32): 1-device vs 8-device execution of the SAME global batch.
# Global-batch BN (the reference-ShuffleBN replacement) plus batch-position
# -derived augmentation keys make the two runs semantically identical; the
# only difference is XLA's cross-device reduction order (float addition
# reassociation), bounded by a tight tolerance below.
cfg = CFG.clone()
cfg.MODEL.BACKBONE = 'S3D'; cfg.MODEL.BACKBONE_TYPE = '3D'
cfg.MODEL.AUG_FLAG = True; cfg.MODEL.DROPOUT = 0.0
cfg.CONTRAST.MEM_TYPE = 'moco'; cfg.CONTRAST.NCE_K = 32
cfg.CROSS.FEAT_DIM = 32; cfg.TPU.COMPUTE_DTYPE = 'float32'
cfg.INPUT.BASE_SIZE = [32, 32]; cfg.INPUT.SCALE_SIZE = [36, 36]
cfg.INPUT.VIDEO_LENGTH = 8

B, T = 8, 8
g = np.random.default_rng(0)
raw = {'clips': g.integers(0, 256, (B, 2, T, 36, 36, 3), dtype=np.uint8),
       'label': np.zeros(B, np.int32), 'index': np.arange(B, dtype=np.int32)}

losses, leaves = [], []
for ndev in (1, 8):
    mesh = make_mesh((ndev,), ('data',), devices=jax.devices()[:ndev])
    model, _ = create_visual_model(cfg)
    example = jnp.zeros((2, T, 32, 32, 3), jnp.float32)
    state, tx = create_pretrain_state(cfg, model, example, n_data=64)
    state = replicate_state(state, mesh)
    step = jax.jit(make_fused_pretrain_step(cfg, model, tx, n_data=64,
                                            mesh=mesh), donate_argnums=0)
    batch = shard_batch(dict(raw), mesh)
    state, metrics = step(state, batch, 0.1)
    losses.append(float(metrics['loss']))
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    leaves.append(np.asarray(leaf, np.float64))
    print('ndev', ndev, 'loss', losses[-1])

assert np.isfinite(losses[0])
assert abs(losses[0] - losses[1]) <= 1e-4 * max(1.0, abs(losses[0])), losses
np.testing.assert_allclose(leaves[0], leaves[1], rtol=2e-4, atol=1e-6)
print('EQUIV_OK', losses[0], losses[1])
"""


@pytest.mark.slow
def test_s3d_1_vs_8_device_equivalence():
    """Same global batch, same math: the S3D flagship step on a 1-device
    mesh equals the 8-device run (reference counterpart: DDP must match
    single-GPU training, tools/train_video_contrast_dis.py:42-76)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # bypass axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "8"
    script = EQUIV_SCRIPT % {"repo": REPO}
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=1800)
    assert "EQUIV_OK" in out.stdout, out.stdout + "\n" + out.stderr


@pytest.mark.slow
def test_moco_step_on_8_device_mesh():
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # bypass axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "8"
    script = SCRIPT % {"repo": REPO}
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=1200)
    assert "SHARDING_OK" in out.stdout, out.stdout + "\n" + out.stderr


CMC_SCRIPT = r"""
import numpy as np, jax, jax.numpy as jnp
assert len(jax.devices()) == 8, jax.devices()
import sys; sys.path.insert(0, %(repo)r)
from video_graph_ssl_tpu.config import cfg as CFG
from video_graph_ssl_tpu.models import create_visual_model
from video_graph_ssl_tpu.engine import create_pretrain_state, make_pretrain_step
from video_graph_ssl_tpu.parallel import make_mesh, shard_batch, replicate_state

cfg = CFG.clone()
cfg.MODEL.BACKBONE = 'tiny3d'; cfg.MODEL.BACKBONE_TYPE = '3D'
cfg.MODEL.DROPOUT = 0.0
cfg.CONTRAST.MEM_TYPE = 'moco'; cfg.CONTRAST.NCE_K = 32
cfg.CROSS.FEAT_DIM = 16; cfg.CROSS.MODALITY = 'cross'
cfg.TPU.COMPUTE_DTYPE = 'float32'

mesh = make_mesh((-1,), ('data',))
model, _ = create_visual_model(cfg)
B, T, H, W = 16, 4, 16, 16
example = jnp.zeros((2, T, H, W, 3), jnp.float32)
state, tx = create_pretrain_state(cfg, model, example, n_data=64)
state = replicate_state(state, mesh)
step = jax.jit(make_pretrain_step(cfg, model, tx), donate_argnums=0)

batch = {'clips': np.random.default_rng(0).normal(size=(B, 2, T, H, W, 3)).astype(np.float32),
         'label': np.zeros(B, np.int32), 'index': np.arange(B, dtype=np.int32)}
batch = shard_batch(batch, mesh)
state, metrics = step(state, batch, 0.1)
loss = float(metrics['loss'])
assert np.isfinite(loss)
# both CMC queues saw the GLOBAL key batch
assert int(state.contrast.ptr) == B
assert len(jax.tree_util.tree_leaves(state.params)[0].sharding.device_set) == 8
print('CMC_SHARDING_OK', loss)
"""


@pytest.mark.slow
def test_cmc_moco_step_on_8_device_mesh():
    """CMC (two-modality) step under the data mesh: dual queues enqueue
    the global key batch, state stays replicated."""
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # bypass axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "8"
    script = CMC_SCRIPT % {"repo": REPO}
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=1200)
    assert "CMC_SHARDING_OK" in out.stdout, out.stdout + "\n" + out.stderr


def test_pad_batch_to_multiple():
    import numpy as np
    from video_graph_ssl_tpu.parallel import pad_batch_to_multiple

    batch = {"clips": np.arange(10 * 2).reshape(10, 2),
             "label": np.arange(10)}
    padded, n = pad_batch_to_multiple(batch, 8)
    assert n == 10
    assert padded["clips"].shape == (16, 2)
    np.testing.assert_array_equal(
        padded["clips"][10:], np.repeat(batch["clips"][-1:], 6, axis=0))
    same, n2 = pad_batch_to_multiple(batch, 5)
    assert n2 == 10 and same["clips"].shape == (10, 2)
