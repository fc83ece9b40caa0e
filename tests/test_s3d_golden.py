"""S3D golden-feature regression tests.

Pins the full S3D forward (and one graph-augmented forward) against a
stored CPU/fp32 snapshot so that optimization work on the hot path (pool
lowerings, fused kernels, stem variants) cannot silently change the math
— the round-2 where(>=) max-pool swap landed with no such guard.

Reference semantics under test: the whole stage table of
lib/modeling/backbone/backbone_3d/s3d_1.py:5-329 (stem padding arithmetic,
inception branch concat order, head pooling endpoint-halving) plus the
TemporalGraphAug insertion (lib/ops/build.py:9-32).

The snapshot is generated on CPU float32 and compared with a tolerance
that absorbs TPU conv precision (bf16-multiply passes) but is orders of
magnitude below any semantic change.  Regenerate ONLY with a documented
reason (commit message) via:

    PYTHONPATH= JAX_PLATFORMS=cpu python tests/test_s3d_golden.py --regen
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "s3d_feat.npz")

B, T, H, W = 2, 8, 32, 32


def _build(graph: bool):
    import jax.numpy as jnp
    from video_graph_ssl_tpu.models.s3d import S3D

    gcfg = dict(sampler="none", use_pallas=False, sub_sample=True,
                max_pool=True)
    return S3D(
        num_classes=None,
        aug_points=(5,) if graph else (),
        graph_cfg=gcfg if graph else None,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
    )


def _forward(graph: bool) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(
        np.random.default_rng(42).standard_normal((B, T, H, W, 3)),
        jnp.float32)
    model = _build(graph)
    # threefry init is backend-deterministic -> same params on CPU and TPU
    variables = jax.jit(model.init)({"params": jax.random.key(0)}, x)
    feat = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    return np.asarray(feat, np.float32)


def _rel_l2(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(GOLDEN), (
        "missing tests/golden/s3d_feat.npz — regenerate on CPU (see module "
        "docstring)")
    return np.load(GOLDEN)


def test_s3d_feature_golden(golden):
    feat = _forward(graph=False)
    ref = golden["plain"]
    assert feat.shape == ref.shape == (B, 1024)
    assert _rel_l2(feat, ref) < 3e-2


def test_s3d_graph_aug_feature_golden(golden):
    feat = _forward(graph=True)
    ref = golden["graph"]
    assert feat.shape == ref.shape == (B, 1024)
    assert _rel_l2(feat, ref) < 3e-2


if __name__ == "__main__":
    if "--regen" not in sys.argv:
        sys.exit("pass --regen to regenerate the golden snapshot")
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    plain = _forward(graph=False)
    graph = _forward(graph=True)
    np.savez(GOLDEN, plain=plain, graph=graph)
    print("wrote", GOLDEN, plain.shape, graph.shape,
          float(np.abs(plain).mean()))
