"""Sequence parallelism: the temporal-graph block with the FRAME axis
sharded over a mesh axis, exchanged via ppermute rings.

The reference never shards T (clips are 8-32 frames; its graph module is
the long-range mechanism — lib/ops/module_wrappers/temporal_graph.py:
150-239); SURVEY.md SS5 names ring T-sharding of the graph/GCN as the
TPU-native long-clip extension.  These tests pin the extension against the
single-device module on a fake 8-device CPU mesh (subprocess, like
test_sharding.py, because this interpreter's backend is already up).
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
from video_graph_ssl_tpu.ops.temporal_graph import TemporalGraphAug
from video_graph_ssl_tpu.parallel import make_mesh
from video_graph_ssl_tpu.parallel.sequence import graph_aug_sequence_parallel

B, T, H, W, C = 2, 16, 8, 8, 12
g = np.random.default_rng(7)
x = jnp.asarray(g.normal(size=(B, T, H, W, C)).astype(np.float32))

mod = TemporalGraphAug(num_gcn_layers=2, dtype=jnp.float32)
variables = mod.init(jax.random.PRNGKey(0), x, train=False)

# --- eval equality: module (unsharded) == ring path on an 8-way seq mesh
want = jax.jit(lambda v, x: mod.apply(v, x, train=False))(variables, x)
mesh8 = make_mesh((8,), ('seq',))
got = graph_aug_sequence_parallel(
    variables, x, mesh8, seq_axis='seq',
    sampler='none', dtype=jnp.float32)
np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                           rtol=2e-5, atol=2e-5)
print('EVAL_EQ_OK', float(jnp.abs(got - want).max()))

# --- sharding invariance of the stochastic path: the rowfold-keyed
# relaxed-Bernoulli draw must give the SAME augmented output on a 1-way
# and an 8-way seq mesh (only fp reassociation of the ring accumulation
# differs).
rng = jax.random.PRNGKey(123)
outs = []
for ndev in (1, 8):
    mesh = make_mesh((ndev,), ('seq',), devices=jax.devices()[:ndev])
    o = graph_aug_sequence_parallel(
        variables, x, mesh, seq_axis='seq',
        sampler='relaxed_bernoulli', rng=rng, dtype=jnp.float32)
    outs.append(np.asarray(o))
np.testing.assert_allclose(outs[0], outs[1], rtol=2e-5, atol=2e-5)
# and it actually augmented (differs from the eval output)
assert float(np.abs(outs[0] - np.asarray(want)).max()) > 1e-3
print('SAMPLE_INV_OK')

# --- gradients flow through the rings (shard_map + ppermute + fori_loop)
def loss_fn(xin):
    o = graph_aug_sequence_parallel(
        variables, xin, mesh8, seq_axis='seq',
        sampler='none', dtype=jnp.float32)
    return jnp.sum(o * o)
gx = jax.grad(loss_fn)(x)
assert np.isfinite(np.asarray(gx)).all()
assert float(jnp.abs(gx).max()) > 0
print('GRAD_OK')
"""


@pytest.mark.slow
def test_sequence_parallel_graph_aug():
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # bypass axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "8"
    script = SCRIPT % {"repo": REPO}
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=1200)
    assert "EVAL_EQ_OK" in out.stdout, out.stdout + "\n" + out.stderr
    assert "SAMPLE_INV_OK" in out.stdout, out.stdout + "\n" + out.stderr
    assert "GRAD_OK" in out.stdout, out.stdout + "\n" + out.stderr
