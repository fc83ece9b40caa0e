"""PyTorch checkpoint interop: layout-conversion parity + full S3D mapping.

Numerical parity is checked against torch's own Conv3d/BatchNorm3d (CPU) on
a converted SepConv block; the full-network mapping is checked against the
reference-shape manifest (every name consumed, every module filled, forward
runs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_graph_ssl_tpu.models.s3d import S3D
from video_graph_ssl_tpu.utils.torch_interop import (
    convert_torch_s3d,
    export_s3d_to_torch_names,
    reference_s3d_shape_manifest,
    strip_prefixes,
)


def _random_sd(manifest, seed=0):
    g = np.random.default_rng(seed)
    sd = {}
    for name, shape in manifest.items():
        if name.endswith("running_var"):
            sd[name] = g.uniform(0.5, 2.0, shape).astype(np.float32)
        else:
            sd[name] = g.normal(0, 0.1, shape).astype(np.float32)
    return sd


def test_sepconv_numerical_parity_with_torch():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    torch.manual_seed(0)
    conv_s = nn.Conv3d(3, 8, (1, 3, 3), (1, 1, 1), (0, 1, 1), bias=False)
    bn_s = nn.BatchNorm3d(8, eps=1e-3)
    conv_t = nn.Conv3d(8, 8, (3, 1, 1), (1, 1, 1), (1, 0, 0), bias=False)
    bn_t = nn.BatchNorm3d(8, eps=1e-3)
    for bn in (bn_s, bn_t):
        bn.weight.data.uniform_(0.5, 1.5)
        bn.bias.data.normal_()
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)

    sd = {"base.0.conv_s.weight": conv_s.weight.detach().numpy(),
          "base.0.conv_t.weight": conv_t.weight.detach().numpy()}
    for nm, bn in (("bn_s", bn_s), ("bn_t", bn_t)):
        sd[f"base.0.{nm}.weight"] = bn.weight.detach().numpy()
        sd[f"base.0.{nm}.bias"] = bn.bias.detach().numpy()
        sd[f"base.0.{nm}.running_mean"] = bn.running_mean.numpy()
        sd[f"base.0.{nm}.running_var"] = bn.running_var.numpy()

    x = np.random.default_rng(1).normal(size=(2, 3, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        for bn in (bn_s, bn_t):
            bn.eval()
        ref = torch.relu(bn_t(conv_t(torch.relu(bn_s(conv_s(
            torch.tensor(x)))))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 4, 1))  # NCDHW -> NDTHWC

    from video_graph_ssl_tpu.utils.torch_interop import _sep
    params, stats = _sep(sd, "base.0")

    from video_graph_ssl_tpu.models.layers import SepConv3d
    m = SepConv3d(8, 3, 1, 1, dtype=jnp.float32)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    variables = {"params": params, "batch_stats": stats}
    # full fp32 conv precision to isolate the layout conversion (TPU convs
    # otherwise default to bf16 multiply precision)
    with jax.default_matmul_precision("highest"):
        out = jax.jit(lambda v, x: m.apply(v, x, train=False))(variables, xj)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_full_s3d_conversion_and_forward():
    manifest = reference_s3d_shape_manifest(num_classes=None)
    sd = _random_sd(manifest)
    params, stats = convert_torch_s3d(sd)

    m = S3D(num_classes=None, dtype=jnp.float32)
    x = jnp.zeros((1, 8, 32, 32, 3), jnp.float32)
    ref_vars = jax.jit(lambda x: m.init({"params": jax.random.key(0)}, x,
                                        train=False))(x)
    # tree structures match the model's own init exactly
    ref_p = jax.tree_util.tree_structure(ref_vars["params"])
    got_p = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, params))
    assert ref_p == got_p, f"param tree mismatch:\n{ref_p}\nvs\n{got_p}"
    ref_s = jax.tree_util.tree_structure(ref_vars["batch_stats"])
    got_s = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, stats))
    assert ref_s == got_s

    # shapes all agree and the forward runs
    jax.tree_util.tree_map(
        lambda a, b: None if a.shape == b.shape else (_ for _ in ()).throw(
            AssertionError(f"{a.shape} vs {b.shape}")),
        ref_vars["params"], jax.tree_util.tree_map(jnp.asarray, params))
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(
        {"params": params, "batch_stats": stats}, x)
    assert out.shape == (1, 1024)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_export_roundtrip():
    manifest = reference_s3d_shape_manifest()
    sd = _random_sd(manifest, seed=3)
    params, stats = convert_torch_s3d(sd)
    back = export_s3d_to_torch_names(params, stats)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k])


def test_strip_prefixes():
    sd = {"module.encoder.base_model.base.0.conv_s.weight": np.zeros(1)}
    out = strip_prefixes(sd)
    assert list(out) == ["base.0.conv_s.weight"]


def test_s3d_head_pooling_matches_reference_weighting():
    """The reference head pools avg_pool3d((2, H, W), stride 1) then means
    over the remaining temporal windows (s3d_1.py:28-35) — endpoint frames
    get half weight at T'>2 (the 32-frame fine-tune setting).  Golden-check
    our pooling formula against the actual torch ops for T'=2 and T'=4."""
    import torch
    import torch.nn.functional as F
    import jax.numpy as jnp

    g = np.random.default_rng(7)
    for t in (2, 4):
        y = g.normal(size=(3, 1024, t, 4, 4)).astype(np.float32)  # NCTHW
        ref = F.avg_pool3d(torch.from_numpy(y), (2, 4, 4), stride=1)
        ref = ref.view(3, 1024, t - 1).mean(2).numpy()

        # our formula (models/s3d.py head): spatial mean -> adjacent-pair
        # average -> temporal mean, on channels-last activations
        x = jnp.asarray(np.transpose(y, (0, 2, 3, 4, 1)))  # (B,T,H,W,C)
        z = jnp.mean(x, axis=(2, 3))
        z = (z[:, :-1] + z[:, 1:]) * 0.5
        ours = np.asarray(jnp.mean(z, axis=1))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

        if t == 2:  # at T'=2 the weighting degenerates to the uniform mean
            uniform = np.asarray(jnp.mean(x, axis=(1, 2, 3)))
            np.testing.assert_allclose(ours, uniform, rtol=1e-5, atol=1e-5)
