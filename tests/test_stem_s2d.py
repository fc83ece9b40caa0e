"""Space-to-depth stem (TPU.STEM_S2D) exactness tests.

The s2d stem must be the SAME FUNCTION as the reference stem
SepConv3d(64, k=7, s=2, p=3) (lib/modeling/backbone/backbone_3d/
s3d_1.py:50-69) given fold_stem_kernel_s2d-folded weights — unlike the
reference's approximate S3DG text-video stem (s3dg.py:297-315).  These
tests pin that equality at the conv level, the stem-module level, and the
full-model level (vs the stored S3D golden snapshot).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_fold_spatial_kernel_exact():
    import jax.numpy as jnp
    import jax.lax as lax
    from video_graph_ssl_tpu.models.layers import (fold_stem_kernel_s2d,
                                                   space_to_depth_hw)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 2, 16, 12, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((1, 7, 7, 3, 8)), jnp.float32)
    dn = ("NDHWC", "DHWIO", "NDHWC")
    ref = lax.conv_general_dilated(
        x, w, window_strides=(1, 2, 2),
        padding=[(0, 0), (3, 3), (3, 3)], dimension_numbers=dn)
    w2 = jnp.asarray(fold_stem_kernel_s2d(w, "hw"))
    got = lax.conv_general_dilated(
        space_to_depth_hw(x), w2, window_strides=(1, 1, 1),
        padding=[(0, 0), (2, 1), (2, 1)], dimension_numbers=dn)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_temporal_kernel_exact():
    import jax.numpy as jnp
    import jax.lax as lax
    from video_graph_ssl_tpu.models.layers import (fold_stem_kernel_s2d,
                                                   space_to_depth_t)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 3, 3, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 1, 1, 4, 8)), jnp.float32)
    dn = ("NDHWC", "DHWIO", "NDHWC")
    ref = lax.conv_general_dilated(
        x, w, window_strides=(2, 1, 1),
        padding=[(3, 3), (0, 0), (0, 0)], dimension_numbers=dn)
    w2 = jnp.asarray(fold_stem_kernel_s2d(w, "t"))
    got = lax.conv_general_dilated(
        space_to_depth_t(x), w2, window_strides=(1, 1, 1),
        padding=[(2, 1), (0, 0), (0, 0)], dimension_numbers=dn)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["full", "spatial"])
def test_sepconv_s2d_module_matches_sepconv3d(mode):
    """Stem module: standard params folded -> identical output + identical
    BN batch_stats structure (both s2d modes)."""
    import jax
    import jax.numpy as jnp
    from video_graph_ssl_tpu.models.layers import SepConv3d, SepConvS2D
    from video_graph_ssl_tpu.models.s3d import stem_params_to_s2d

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16, 3)), jnp.float32)
    std = SepConv3d(16, 7, 2, 3, dtype=jnp.float32, param_dtype=jnp.float32)
    s2d = SepConvS2D(16, temporal_s2d=(mode == "full"),
                     dtype=jnp.float32, param_dtype=jnp.float32)
    v = jax.jit(std.init)(jax.random.key(0), x)
    y_std = std.apply(v, x)
    v2 = dict(v)
    v2["params"] = stem_params_to_s2d({"stem_0": v["params"]},
                                      mode=mode)["stem_0"]
    y_s2d = s2d.apply(v2, x)
    assert y_s2d.shape == y_std.shape
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_std),
                               rtol=1e-5, atol=1e-5)
    # batch_stats trees line up leaf-for-leaf (checkpoint compatibility)
    assert (jax.tree_util.tree_structure(v["batch_stats"])
            == jax.tree_util.tree_structure(v2["batch_stats"]))


def test_s3d_stem_s2d_matches_golden():
    """Full S3D with the converted stem reproduces the standard model's
    stored golden features."""
    import jax
    import jax.numpy as jnp
    from video_graph_ssl_tpu.models.s3d import S3D, stem_params_to_s2d

    golden_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "golden", "s3d_feat.npz")
    if not os.path.exists(golden_path):
        pytest.skip("golden snapshot missing")
    golden = np.load(golden_path)["plain"]

    B, T, H, W = 2, 8, 32, 32
    x = jnp.asarray(
        np.random.default_rng(42).standard_normal((B, T, H, W, 3)),
        jnp.float32)
    std = S3D(num_classes=None, dtype=jnp.float32, param_dtype=jnp.float32)
    v = jax.jit(std.init)({"params": jax.random.key(0)}, x)
    s2d = S3D(num_classes=None, stem_s2d=True, dtype=jnp.float32,
              param_dtype=jnp.float32)
    v2 = stem_params_to_s2d(v)
    feat = jax.jit(lambda v, x: s2d.apply(v, x, train=False))(v2, x)
    np.testing.assert_allclose(np.asarray(feat), golden,
                               rtol=2e-4, atol=2e-4)


def test_torch_interop_stem_s2d():
    """convert_torch_s3d(stem_s2d=True) produces a tree that S3D(
    stem_s2d=True) applies, matching the standard conversion's features."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from video_graph_ssl_tpu.models.s3d import S3D
    from video_graph_ssl_tpu.utils.torch_interop import (
        convert_torch_s3d, reference_s3d_shape_manifest)

    g = torch.Generator().manual_seed(0)
    sd = {k: torch.randn(shape, generator=g).numpy() * 0.05
          for k, shape in reference_s3d_shape_manifest().items()}
    p_std, s_std = convert_torch_s3d(sd)
    p_s2d, s_s2d = convert_torch_s3d(sd, stem_s2d=True)

    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 8, 32, 32, 3)),
        jnp.float32)
    kw = dict(num_classes=None, dtype=jnp.float32, param_dtype=jnp.float32)
    y_std = S3D(**kw).apply(
        {"params": p_std, "batch_stats": s_std}, x, train=False)
    y_s2d = S3D(stem_s2d=True, **kw).apply(
        {"params": p_s2d, "batch_stats": s_s2d}, x, train=False)
    np.testing.assert_allclose(np.asarray(y_s2d), np.asarray(y_std),
                               rtol=1e-4, atol=1e-4)
