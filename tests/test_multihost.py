"""Multi-host (multi-process) data loading and sharding.

The reference scales input loading with one ``DistributedSampler`` per DDP
process (lib/data/build.py:49).  Our single-controller counterpart:
``parallel.process_batch_slice`` gives each process its rows of every
global batch, ``Loader(batch_slice=...)`` restricts decoding to them, and
``shard_batch(..., local=True)`` assembles the global device array with
``jax.make_array_from_process_local_data``.

The integration test spawns a REAL two-process JAX cluster (4 CPU devices
each, gloo collectives, ``jax.distributed.initialize``) in subprocesses —
the closest this single-host environment can get to a multi-host TPU slice
— and checks both feeding modes produce the exact same global batch as the
single-host loader.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mini_cfg():
    from video_graph_ssl_tpu.config import cfg as CFG

    cfg = CFG.clone()
    cfg.DATASET.SOURCE = "synthetic"
    cfg.DATASET.NUM_CLASS = 4
    cfg.INPUT.VIDEO_LENGTH = 4
    cfg.INPUT.BASE_SIZE = [16, 16]
    cfg.INPUT.SCALE_SIZE = [24, 24]
    cfg.DATALOADER.BATCH_SIZE = 8
    cfg.DATALOADER.NUM_WORKERS = 2
    return cfg


def test_process_batch_slice_single_process():
    """On a single-process mesh every row is local: the slice is the full
    batch, for any data-axis layout."""
    from video_graph_ssl_tpu.parallel import make_mesh, process_batch_slice

    mesh = make_mesh((-1,), ("data",))
    assert process_batch_slice(8, mesh) == (0, 8)


def test_loader_batch_slice_yields_exact_global_rows():
    """A sliced loader must reproduce rows [lo:hi) of every batch of the
    unsliced loader bit-for-bit — the per-item rngs are keyed on GLOBAL
    dataset indices, not on which process loads them."""
    from video_graph_ssl_tpu.data import build_video_contrastive_loader

    cfg = _mini_cfg()
    full, n = build_video_contrastive_loader(cfg)
    part, n2 = build_video_contrastive_loader(cfg, batch_slice=(2, 5))
    assert n == n2
    for epoch in (0, 3):
        for bf, bp in zip(full.epoch(epoch), part.epoch(epoch)):
            assert bp["clips"].shape[0] == 3
            for k in bf:
                np.testing.assert_array_equal(bf[k][2:5], bp[k])


def test_batch_slice_validation():
    from video_graph_ssl_tpu.data.pipeline import Loader

    class _DS:
        def __len__(self):
            return 8

        def __getitem__(self, i, rng=None):
            return {"x": np.zeros(1)}

    with pytest.raises(ValueError):
        Loader(_DS(), batch_size=4, batch_slice=(2, 6))
    with pytest.raises(ValueError):
        Loader(_DS(), batch_size=4, drop_last=False, batch_slice=(0, 2))


WORKER = r"""
import json, sys
import numpy as np
import jax, jax.numpy as jnp
jax.distributed.initialize(coordinator_address=%(coord)r,
                           num_processes=2, process_id=%(pid)d)
sys.path.insert(0, %(repo)r)
from video_graph_ssl_tpu.config import cfg as CFG
from video_graph_ssl_tpu.data import build_video_contrastive_loader
from video_graph_ssl_tpu.parallel import (
    make_mesh, process_batch_slice, replicate_state, shard_batch)

assert jax.process_count() == 2
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

cfg = CFG.clone()
cfg.DATASET.SOURCE = 'synthetic'; cfg.DATASET.NUM_CLASS = 4
cfg.INPUT.VIDEO_LENGTH = 4
cfg.INPUT.BASE_SIZE = [16, 16]; cfg.INPUT.SCALE_SIZE = [24, 24]
cfg.DATALOADER.BATCH_SIZE = 8; cfg.DATALOADER.NUM_WORKERS = 2

mesh = make_mesh((-1,), ('data',))
lo, hi = process_batch_slice(8, mesh)
assert hi - lo == 4, (lo, hi)

checks = jax.jit(lambda c, i: (jnp.sum(c.astype(jnp.int32)), jnp.sum(i)))

# Mode 1: per-process loading (the DistributedSampler role).
loader, n_data = build_video_contrastive_loader(cfg, batch_slice=(lo, hi))
local = next(iter(loader.epoch(0)))
assert local['clips'].shape[0] == 4
g = shard_batch(local, mesh, local=True)
assert g['clips'].shape[0] == 8
csum, isum = checks(g['clips'], g['index'])

# Mode 2: every process builds the full global batch; shard_batch slices.
full_loader, _ = build_video_contrastive_loader(cfg)
full = next(iter(full_loader.epoch(0)))
g2 = shard_batch(full, mesh)
csum2, isum2 = checks(g2['clips'], g2['index'])
assert int(csum) == int(csum2), (int(csum), int(csum2))
assert int(isum) == int(isum2), (int(isum), int(isum2))

# replicate_state across processes (same-seed host value on both).
st = {'a': np.arange(6, dtype=np.float32), 'b': np.ones((2, 3), np.float32)}
rep = replicate_state(st, mesh)
rsum = float(jax.jit(lambda t: t['a'].sum() + t['b'].sum())(rep))

print('MH_RESULT', json.dumps(
    {'csum': int(csum), 'isum': int(isum), 'rsum': rsum}))
"""


@pytest.mark.slow
def test_two_process_cluster_matches_single_host():
    """Two JAX processes × 4 CPU devices: both feeding modes assemble the
    bit-exact single-host global batch; replicated state forms without an
    explicit broadcast."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        coord = f"localhost:{s.getsockname()[1]}"

    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # bypass axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "4"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             WORKER % {"coord": coord, "pid": pid, "repo": REPO}],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    results = []
    for (out, err), p in zip(outs, procs):
        assert p.returncode == 0, out + "\n" + err
        line = [l for l in out.splitlines() if l.startswith("MH_RESULT")]
        assert line, out + "\n" + err
        results.append(json.loads(line[0].split(" ", 1)[1]))

    # both processes agree on the fully-replicated checksums
    assert results[0] == results[1]

    # and they equal the single-host loader's global batch (numpy only)
    from video_graph_ssl_tpu.data import build_video_contrastive_loader

    loader, _ = build_video_contrastive_loader(_mini_cfg())
    batch = next(iter(loader.epoch(0)))
    assert results[0]["csum"] == int(batch["clips"].astype(np.int64).sum())
    assert results[0]["isum"] == int(batch["index"].sum())
    assert results[0]["rsum"] == 15.0 + 6.0
