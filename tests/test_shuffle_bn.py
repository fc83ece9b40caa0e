"""ShuffleBN (per-device BN + global shuffle) on the fake 8-device mesh.

Subprocess-based like test_sharding.py (the interpreter's backend is
already fixed).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import numpy as np, jax, jax.numpy as jnp
assert len(jax.devices()) == 8
import sys; sys.path.insert(0, %(repo)r)
from video_graph_ssl_tpu.config import cfg as CFG
from video_graph_ssl_tpu.models import create_visual_model
from video_graph_ssl_tpu.engine import create_pretrain_state, make_pretrain_step
from video_graph_ssl_tpu.parallel import make_mesh, shard_batch, replicate_state
from video_graph_ssl_tpu.parallel.shuffle_bn import shuffle_bn_apply

cfg = CFG.clone()
cfg.MODEL.BACKBONE = 'tiny3d'; cfg.MODEL.BACKBONE_TYPE = '3D'
cfg.MODEL.DROPOUT = 0.0
cfg.CONTRAST.MEM_TYPE = 'moco'; cfg.CONTRAST.NCE_K = 32
cfg.CROSS.FEAT_DIM = 16; cfg.TPU.COMPUTE_DTYPE = 'float32'
cfg.TPU.SHUFFLE_BN = True

mesh = make_mesh((-1,), ('data',))
model, _ = create_visual_model(cfg)
B, T, H, W = 16, 4, 16, 16
state, tx = create_pretrain_state(cfg, model, jnp.zeros((2, T, H, W, 3)), n_data=64)
state = replicate_state(state, mesh)

# 1) direct: shuffle-unshuffle preserves sample->feature mapping.
#    Features differ from the global-BN path only through BN statistics;
#    with identical per-sample content the permutation must be invertible.
x = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, H, W, 3)), np.float32)
x = jax.device_put(x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec('data')))
f = jax.jit(lambda p, s, x, k: shuffle_bn_apply(model, p, s, x, k, mesh))
feat1, stats1 = f(state.ema_params, state.ema_batch_stats, x, jax.random.key(0))
feat2, stats2 = f(state.ema_params, state.ema_batch_stats, x, jax.random.key(1))
assert feat1.shape == (B, 16)
assert np.all(np.isfinite(np.asarray(feat1)))
# different shuffles -> different local-BN stats mixes -> different features
assert not np.allclose(np.asarray(feat1), np.asarray(feat2))
# stats returned replicated and finite
for leaf in jax.tree_util.tree_leaves(stats1):
    assert np.all(np.isfinite(np.asarray(leaf)))

# 2) full moco step with SHUFFLE_BN
step = jax.jit(make_pretrain_step(cfg, model, tx, mesh=mesh), donate_argnums=0)
batch = shard_batch({'clips': np.random.default_rng(0).normal(size=(B,2,T,H,W,3)).astype(np.float32),
                     'label': np.zeros(B,np.int32), 'index': np.arange(B,dtype=np.int32)}, mesh)
state, metrics = step(state, batch, 0.1)
loss = float(metrics['loss'])
assert np.isfinite(loss)
print('SHUFFLEBN_OK', loss)
"""


@pytest.mark.slow
def test_shuffle_bn_on_8_device_mesh():
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "8"
    out = subprocess.run([sys.executable, "-c", SCRIPT % {"repo": REPO}],
                         env=env, capture_output=True, text=True,
                         timeout=1200)
    assert "SHUFFLEBN_OK" in out.stdout, out.stdout + "\n" + out.stderr
