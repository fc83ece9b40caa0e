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


def _assert_matches_init(model, params, stats, x):
    import jax

    ref_vars = jax.jit(lambda x: model.init({"params": jax.random.key(0)}, x,
                                            train=False))(x)
    ref_p = jax.tree_util.tree_structure(ref_vars["params"])
    got_p = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, params))
    assert ref_p == got_p, f"param tree mismatch:\n{ref_p}\nvs\n{got_p}"
    jax.tree_util.tree_map(
        lambda a, b: None if a.shape == b.shape else (_ for _ in ()).throw(
            AssertionError(f"{a.shape} vs {b.shape}")),
        ref_vars["params"], jax.tree_util.tree_map(jnp.asarray, params))
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        {"params": params, "batch_stats": stats}, x)
    assert out.shape == (1, 1024)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_full_s3dg_conversion_and_forward():
    """S3DG ``features.N`` + conv/conv2 naming (S3DG_Pytorch.py:310-335)
    maps onto S3D(temporal_bias=True) — biased separable convs."""
    from video_graph_ssl_tpu.utils.torch_interop import (
        convert_torch_s3dg, reference_s3dg_shape_manifest)

    manifest = reference_s3dg_shape_manifest()
    sd = _random_sd(manifest, seed=5)
    params, stats = convert_torch_s3dg(sd)
    # spot-check: conv bias is carried, temporal conv transposed
    assert params["stem_0"]["spatial"]["conv"]["bias"].shape == (64,)
    assert params["stem_0"]["temporal"]["conv"]["kernel"].shape == (7, 1, 1, 64, 64)
    m = S3D(num_classes=None, temporal_bias=True, dtype=jnp.float32)
    _assert_matches_init(m, params, stats, jnp.zeros((1, 8, 32, 32, 3)))


def test_full_i3d_conversion_and_forward():
    """I3D conv3d_*/mixed_*.branch_K naming (i3dpt.py:161-262) maps onto
    models.i3d.I3D."""
    from video_graph_ssl_tpu.models.i3d import I3D
    from video_graph_ssl_tpu.utils.torch_interop import (
        convert_torch_i3d, reference_i3d_shape_manifest)

    manifest = reference_i3d_shape_manifest()
    sd = _random_sd(manifest, seed=6)
    params, stats = convert_torch_i3d(sd)
    assert params["conv3d_1a"]["conv"]["kernel"].shape == (7, 7, 7, 3, 64)
    m = I3D(num_classes=None, dtype=jnp.float32)
    _assert_matches_init(m, params, stats, jnp.zeros((1, 8, 32, 32, 3)))


def test_tf_i3d_loader_semantics():
    """The TF-name loader reproduces i3dpt.py:313-423: BN scale == ones,
    stats squeezed, Mixed_5b Branch_2 read from the typo'd scope
    ``Conv3d_0a_3x3`` (fix_typo=True, i3dpt.py:295-300)."""
    from video_graph_ssl_tpu.utils.torch_interop import (
        convert_tf_i3d, reference_i3d_shape_manifest, tf_i3d_to_torch_sd)

    manifest = reference_i3d_shape_manifest()
    g = np.random.default_rng(8)
    tf_vars = {}

    def tf_name(pt_name):
        # invert the loader's pt->tf naming for synthesis
        unit_map = {"conv3d_1a_7x7": "Conv3d_1a_7x7",
                    "conv3d_2b_1x1": "Conv3d_2b_1x1",
                    "conv3d_2c_3x3": "Conv3d_2c_3x3"}
        if pt_name in unit_map:
            return unit_map[pt_name]
        mixed, branch = pt_name.split(".", 1)
        scope = "Mixed_" + mixed.split("_")[1]
        bmap = {"branch_0": "Branch_0/Conv3d_0a_1x1",
                "branch_1.0": "Branch_1/Conv3d_0a_1x1",
                "branch_1.1": "Branch_1/Conv3d_0b_3x3",
                "branch_2.0": "Branch_2/Conv3d_0a_1x1",
                "branch_2.1": "Branch_2/Conv3d_0b_3x3",
                "branch_3.1": "Branch_3/Conv3d_0b_1x1"}
        leaf = bmap[branch]
        if mixed == "mixed_5b" and branch == "branch_2.1":
            leaf = "Branch_2/Conv3d_0a_3x3"   # the reference's typo'd scope
        return f"{scope}/{leaf}"

    for name, shape in manifest.items():
        if not name.endswith(".conv3d.weight"):
            continue
        unit = name[: -len(".conv3d.weight")]
        co, ci, kt, kh, kw = shape
        base = f"RGB/inception_i3d/{tf_name(unit)}"
        tf_vars[f"{base}/conv_3d/w"] = g.normal(
            0, 0.1, (kt, kh, kw, ci, co)).astype(np.float32)
        # TF stores BN params as (1,1,1,1,C); the loader squeezes
        bnp = f"{base}/batch_norm"
        tf_vars[f"{bnp}/beta"] = g.normal(0, 0.1, (1, 1, 1, 1, co)).astype(np.float32)
        tf_vars[f"{bnp}/moving_mean"] = g.normal(0, 0.1, (1, 1, 1, 1, co)).astype(np.float32)
        tf_vars[f"{bnp}/moving_variance"] = g.uniform(0.5, 2.0, (1, 1, 1, 1, co)).astype(np.float32)

    sd = tf_i3d_to_torch_sd(tf_vars)
    assert set(sd) == set(manifest), (
        sorted(set(manifest) ^ set(sd))[:4])
    # BN gammas are ones (TF I3D has no scale; i3dpt.py:389)
    np.testing.assert_array_equal(sd["mixed_3b.branch_0.batch3d.weight"],
                                  np.ones(64, np.float32))
    # the typo'd scope's weights landed in mixed_5b.branch_2.1
    w_tf = tf_vars["RGB/inception_i3d/Mixed_5b/Branch_2/Conv3d_0a_3x3/conv_3d/w"]
    np.testing.assert_array_equal(
        sd["mixed_5b.branch_2.1.conv3d.weight"],
        np.transpose(w_tf, (4, 3, 0, 1, 2)))
    # and stats were squeezed to (C,)
    assert sd["mixed_3b.branch_0.batch3d.running_mean"].shape == (64,)
    params, stats = convert_tf_i3d(tf_vars)
    # mixed_5b b2 = (32 -> 128) per the Inception channel plan (_MIXED_SPECS)
    assert params["mixed_5b"]["branch2"]["conv"]["kernel"].shape == (3, 3, 3, 32, 128)


def test_s3dg_inflation_rule():
    """Temporal-collapse rule of the reference S3DG loader
    (S3DG_Pytorch.py:356-380): 5-D weights with spatial k in {3,7} write
    their temporal mean into tap 0 only; others copy; unknown keys skip."""
    from video_graph_ssl_tpu.utils.torch_interop import inflate_s3dg_checkpoint

    g = np.random.default_rng(9)
    init = {
        "features.0.conv2.weight": g.normal(0, 1, (8, 8, 7, 1, 1)).astype(np.float32),
        "features.0.conv.weight": g.normal(0, 1, (8, 3, 1, 7, 7)).astype(np.float32),
        "features.2.conv.weight": g.normal(0, 1, (8, 8, 1, 1, 1)).astype(np.float32),
        "features.0.bn.weight": np.zeros(8, np.float32),
    }
    ckpt = {
        # full-3D 7x7x7 checkpoint weight -> collapses into tap 0 of the
        # init's spatial conv (shape[3] == 7 triggers the rule)
        "features.0.conv.weight": g.normal(0, 1, (8, 3, 7, 7, 7)).astype(np.float32),
        "features.2.conv.weight": g.normal(0, 1, (8, 8, 1, 1, 1)).astype(np.float32),
        "features.0.bn.weight": np.ones(8, np.float32),
        "not.a.key": np.zeros(3, np.float32),
    }
    out = inflate_s3dg_checkpoint(init, ckpt)
    np.testing.assert_allclose(out["features.0.conv.weight"][:, :, 0],
                               ckpt["features.0.conv.weight"].mean(axis=2),
                               rtol=1e-6)
    # non-tap-0 temporal taps keep the initialization — the reference only
    # writes slice 0 (S3DG_Pytorch.py:365-366); here k=(1,7,7) has a single
    # temporal tap, so check an untouched key instead
    np.testing.assert_array_equal(out["features.0.conv2.weight"],
                                  init["features.0.conv2.weight"])
    np.testing.assert_array_equal(out["features.2.conv.weight"],
                                  ckpt["features.2.conv.weight"])
    np.testing.assert_array_equal(out["features.0.bn.weight"], np.ones(8))
    assert "not.a.key" not in out


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


def test_bninception_bias_fold_numerical_parity():
    """The reference BasicConv2d carries conv bias=True into BN
    (bninception.py:13); our conv is biasless and the converter folds the
    bias into the BN running mean — eval outputs must match torch."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    torch.manual_seed(0)
    conv = nn.Conv2d(3, 8, 3, padding=1, bias=True)
    bn = nn.BatchNorm2d(8, eps=1e-3)
    bn.weight.data.uniform_(0.5, 1.5)
    bn.bias.data.normal_()
    bn.running_mean.normal_()
    bn.running_var.uniform_(0.5, 2.0)
    sd = {"blk.conv.weight": conv.weight.detach().numpy(),
          "blk.conv.bias": conv.bias.detach().numpy(),
          "blk.bn.weight": bn.weight.detach().numpy(),
          "blk.bn.bias": bn.bias.detach().numpy(),
          "blk.bn.running_mean": bn.running_mean.numpy(),
          "blk.bn.running_var": bn.running_var.numpy()}
    x = np.random.default_rng(1).normal(size=(2, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        bn.eval()
        ref = torch.relu(bn(conv(torch.tensor(x)))).numpy()
    ref = np.transpose(ref, (0, 2, 3, 1))

    from video_graph_ssl_tpu.models.bninception import BasicConv2d
    from video_graph_ssl_tpu.utils.torch_interop import _convbn2d_fold_bias

    params, stats = _convbn2d_fold_bias(sd, "blk")
    m = BasicConv2d(8, 3, padding=1, dtype=jnp.float32)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    with jax.default_matmul_precision("highest"):
        out = jax.jit(lambda v, x: m.apply(v, x, train=False))(
            {"params": params, "batch_stats": stats}, xj)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def _assert_convert_matches_template(model, params, stats, x, feat_dim):
    ref_vars = jax.jit(lambda x: m_init(model, x))(x)
    ref_p = jax.tree_util.tree_structure(ref_vars["params"])
    got_p = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, params))
    assert ref_p == got_p, f"param tree mismatch:\n{ref_p}\nvs\n{got_p}"
    jax.tree_util.tree_map(
        lambda a, b: None if a.shape == b.shape else (_ for _ in ()).throw(
            AssertionError(f"{a.shape} vs {b.shape}")),
        ref_vars["params"], jax.tree_util.tree_map(jnp.asarray, params))
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        {"params": params, "batch_stats": stats}, x)
    assert out.shape == (x.shape[0], feat_dim)
    assert bool(jnp.all(jnp.isfinite(out)))


def m_init(model, x):
    return model.init({"params": jax.random.key(0)}, x, train=False)


def test_full_bninception_conversion_and_forward():
    from video_graph_ssl_tpu.models.bninception import BNInception
    from video_graph_ssl_tpu.utils.torch_interop import (
        convert_torch_bninception, reference_bninception_shape_manifest)

    manifest = reference_bninception_shape_manifest()
    sd = _random_sd(manifest, seed=5)
    params, stats = convert_torch_bninception(sd)
    m = BNInception(num_classes=None, dtype=jnp.float32)
    # 64px: every stage stays even (the reference reduction block cannot
    # take odd spatial sizes, bninception.py:185-207)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    _assert_convert_matches_template(m, params, stats, x, 1024)


def test_full_inception_v3_conversion_and_forward():
    from video_graph_ssl_tpu.models.inceptionv3 import InceptionV3
    from video_graph_ssl_tpu.utils.torch_interop import (
        convert_torch_inception_v3, reference_inception_v3_shape_manifest)

    manifest = reference_inception_v3_shape_manifest()
    sd = _random_sd(manifest, seed=6)
    params, stats = convert_torch_inception_v3(sd)
    m = InceptionV3(num_classes=None, dtype=jnp.float32)
    x = jnp.zeros((1, 75, 75, 3), jnp.float32)
    _assert_convert_matches_template(m, params, stats, x, 2048)


@pytest.mark.parametrize("depth,feat", [(18, 512), (50, 2048)])
def test_full_resnet2p1d_conversion_and_forward(depth, feat):
    from video_graph_ssl_tpu.models import resnet2p1d as r2p
    from video_graph_ssl_tpu.utils.torch_interop import (
        convert_torch_resnet2p1d, reference_resnet2p1d_shape_manifest)

    manifest = reference_resnet2p1d_shape_manifest(depth)
    sd = _random_sd(manifest, seed=7)
    params, stats = convert_torch_resnet2p1d(sd)
    m = getattr(r2p, f"resnet2p1d_{depth}")(num_classes=None,
                                            dtype=jnp.float32)
    x = jnp.zeros((1, 8, 32, 32, 3), jnp.float32)
    _assert_convert_matches_template(m, params, stats, x, feat)


@pytest.mark.parametrize("depth,feat", [(18, 512), (50, 2048)])
def test_full_resnet_i3d_conversion_and_forward(depth, feat):
    from video_graph_ssl_tpu.models import resnet3d as r3d
    from video_graph_ssl_tpu.utils.torch_interop import (
        convert_torch_resnet_i3d, reference_resnet_i3d_shape_manifest)

    manifest = reference_resnet_i3d_shape_manifest(depth)
    sd = _random_sd(manifest, seed=8)
    params, stats = convert_torch_resnet_i3d(sd)
    m = getattr(r3d, f"resnet_i3d_{depth}")(num_classes=None,
                                            dtype=jnp.float32)
    x = jnp.zeros((1, 8, 32, 32, 3), jnp.float32)
    _assert_convert_matches_template(m, params, stats, x, feat)


def test_s3dg_text_conversion_and_forward():
    """MIL-NCE-named text-video S3D: converted tree grafts into the model
    and both towers run (numeric fidelity vs the executed reference:
    tools/fidelity_check.py --backbone s3dg_text, rel_l2 3.5e-7 08-19)."""
    from video_graph_ssl_tpu.models.s3dg_text import S3DGText
    from video_graph_ssl_tpu.utils.torch_interop import (
        convert_torch_s3dg_text, reference_s3dg_text_shape_manifest)

    manifest = reference_s3dg_text_shape_manifest(embd_dim=32,
                                                  num_embeddings=64)
    sd = _random_sd(manifest, seed=9)
    params, stats = convert_torch_s3dg_text(sd)
    m = S3DGText(embd_dim=32, num_text_embeddings=64, dtype=jnp.float32)
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    ids = jnp.zeros((1, 4), jnp.int32)
    ref_vars = jax.jit(lambda x, i: m.init({"params": jax.random.key(0)},
                                           x, i, train=False))(x, ids)
    ref_p = jax.tree_util.tree_structure(ref_vars["params"])
    got_p = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(jnp.asarray, params))
    assert ref_p == got_p, f"param tree mismatch:\n{ref_p}\nvs\n{got_p}"
    out = jax.jit(lambda v, x, i: m.apply(v, x, i, train=False))(
        {"params": params, "batch_stats": stats}, x, ids)
    assert out["video_embedding"].shape == (1, 32)
    assert out["text_embedding"].shape == (1, 32)


def test_graph_aug_split_convert_export_roundtrip():
    """Aug-wrapped sd (Sequential(TemporalGraphAug, stage) naming) splits,
    converts, and round-trips back to identical torch names/values."""
    import numpy as np

    from video_graph_ssl_tpu.utils.torch_interop import (
        convert_torch_graph_aug, export_graph_aug_to_torch,
        split_aug_wrapped_sd)

    g = np.random.default_rng(11)
    sd = {
        # wrapped stage 5: graph block at .0 (sub_sample Sequential conv
        # naming), original block params shifted to .1
        "base.5.0.g_q.0.weight": g.normal(size=(96, 192, 1, 1, 1)),
        "base.5.0.g_k.0.weight": g.normal(size=(96, 192, 1, 1, 1)),
        "base.5.0.gcns.0.conv.weight": g.normal(size=(192, 192, 1, 1, 1)),
        "base.5.1.branch0.0.conv.weight": g.normal(size=(64, 192, 1, 1, 1)),
        # untouched stage passes through unchanged
        "base.6.branch0.0.conv.weight": g.normal(size=(64, 256, 1, 1, 1)),
    }
    clean, graphs = split_aug_wrapped_sd(sd)
    assert set(graphs) == {5}
    assert "base.5.branch0.0.conv.weight" in clean
    assert "base.6.branch0.0.conv.weight" in clean
    assert not any(".0.g_q" in k or ".1." in k for k in clean)

    params, stats = convert_torch_graph_aug(graphs[5])
    assert params["g_q"]["kernel"].shape == (192, 96)
    assert params["gcn_0"]["transform"]["kernel"].shape == (192, 192)
    assert stats == {}

    back = export_graph_aug_to_torch(params, stats)
    for k in ("g_q.0.weight", "g_k.0.weight", "gcns.0.conv.weight"):
        np.testing.assert_array_equal(back[k], sd[f"base.5.0.{k}"])

    # plain (unwrapped) sd is a passthrough
    clean2, graphs2 = split_aug_wrapped_sd({"base.6.conv.weight": sd[
        "base.6.branch0.0.conv.weight"]})
    assert graphs2 == {} and len(clean2) == 1


def test_graph_aug_export_sub_sample_false_roundtrip():
    """GRAPH.SUB_SAMPLE=False drops the Sequential pool wrap, so torch
    names are bare ``g_q.weight``; the export must honor the threaded flag
    (ADVICE r4 item 2: the flag cannot be inferred from the tree — the pool
    is parameter-free)."""
    import numpy as np

    from video_graph_ssl_tpu.utils.torch_interop import (
        convert_torch_graph_aug, export_graph_aug_to_torch)

    g = np.random.default_rng(13)
    gsd = {
        "g_q.weight": g.normal(size=(96, 192, 1, 1, 1)),
        "g_k.weight": g.normal(size=(96, 192, 1, 1, 1)),
        "gcns.0.conv.weight": g.normal(size=(192, 192, 1, 1, 1)),
    }
    params, stats = convert_torch_graph_aug(gsd)   # import auto-detects
    back = export_graph_aug_to_torch(params, stats, sub_sample=False)
    assert set(back) == set(gsd)
    for k in gsd:
        np.testing.assert_array_equal(back[k], gsd[k])
