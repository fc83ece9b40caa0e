"""Full reference-checkpoint conversion (utils/ckpt_convert.py +
tools/convert_checkpoint.py).

A reference-named GraphWrapper / VideoModelWrapper state_dict is synthesized
from the audited shape manifest (utils/torch_interop.py), converted, and
grafted into a real TrainState template. Checks:

* the grafted state round-trips through our msgpack checkpoint machinery
  and through the train_ds encoder-surgery path,
* ours -> reference-names export inverts the conversion exactly,
* head conversion matches a numpy execution of the reference math
  (project_head.py:12-75),
* the CLI converts an actual torch.save'd .pth.tar end to end.
"""

import os

import numpy as np
import pytest

from video_graph_ssl_tpu.config import cfg as _CFG
from video_graph_ssl_tpu.utils.ckpt_convert import (
    convert_prediction_mlp,
    convert_pretrain_sd,
    convert_proj_head,
    convert_projection_mlp,
    detect_kind,
    export_downstream_to_torch,
    export_pretrain_to_torch,
    graft_downstream_state,
    graft_pretrain_state,
)
from video_graph_ssl_tpu.utils.torch_interop import reference_s3d_shape_manifest

FEAT_DIM = 8
NCE_K = 16
EXAMPLE = (2, 8, 32, 32, 3)


def _rand_sd(manifest, seed):
    g = np.random.default_rng(seed)
    sd = {}
    for name, shape in manifest.items():
        if name.endswith("running_var"):
            sd[name] = g.uniform(0.5, 2.0, shape).astype(np.float32)
        else:
            sd[name] = g.normal(0, 0.1, shape).astype(np.float32)
    return sd


def _head_manifest(head_type="mlp", in_dim=1024, feat_dim=FEAT_DIM):
    if head_type == "linear":
        return {"head.0.weight": (feat_dim, in_dim), "head.0.bias": (feat_dim,)}
    return {"head.0.weight": (in_dim, in_dim), "head.0.bias": (in_dim,),
            "head.2.weight": (feat_dim, in_dim), "head.2.bias": (feat_dim,)}


def _pretrain_sd(seed=0):
    """Reference GraphWrapper (moco) state_dict on synthetic weights."""
    sd = {}
    for k, v in _rand_sd(reference_s3d_shape_manifest(), seed).items():
        sd[f"model.encoder.base_model.{k}"] = v
    for k, v in _rand_sd(_head_manifest(), seed + 1).items():
        sd[f"model.proj_head.{k}"] = v
    return sd


def _cfg(mem_type="moco"):
    c = _CFG.clone()
    c.defrost()
    c.MODEL.BACKBONE = "S3D"
    c.MODEL.BACKBONE_TYPE = "3D"
    c.MODEL.AUG_FLAG = False
    c.MODEL.DROPOUT = 0.0
    c.CONTRAST.MEM_TYPE = mem_type
    c.CONTRAST.NCE_K = NCE_K
    c.CROSS.FEAT_DIM = FEAT_DIM
    c.CROSS.HEAD_TYPE = "mlp"
    return c


@pytest.fixture(scope="module")
def moco_template():
    """One S3D moco TrainState template (init is the expensive part)."""
    import jax.numpy as jnp

    from video_graph_ssl_tpu.engine import create_pretrain_state
    from video_graph_ssl_tpu.models import create_visual_model

    c = _cfg("moco")
    model, _ = create_visual_model(c)
    state, _tx = create_pretrain_state(
        c, model, np.zeros(EXAMPLE, np.float32), n_data=4)
    assert state.contrast.queue.shape == (NCE_K, FEAT_DIM)
    del jnp
    return c, state


def test_detect_kind():
    assert detect_kind({"model.encoder.base_model.base.0.conv_s.weight": 0}) \
        == "pretrain"
    assert detect_kind({"module.model.proj_head.head.0.weight": 0}) == "pretrain"
    assert detect_kind({"base_model.base.0.conv_s.weight": 0, "new_fc.weight": 0}) \
        == "downstream"
    assert detect_kind({
        "model_1.model.encoder.base_model.base.0.conv_s.weight": 0,
        "model_2.model.encoder.base_model.base.0.conv_s.weight": 0,
    }) == "cmc_pretrain"
    with pytest.raises(ValueError):
        detect_kind({"whatever.weight": 0})


def test_cmc_convert_export_roundtrip():
    """Two-stack CMC state_dict -> our CmcWrapper trees -> back: identical
    names and values (the torch convention is model_{1,2}.<GraphWrapper
    names>; the reference never composes a CMC model — its build dispatch
    only selects the memories, lib/memory/build.py:5-13)."""
    from video_graph_ssl_tpu.utils.ckpt_convert import (
        convert_cmc_pretrain_sd, export_cmc_pretrain_to_torch)

    sd = {}
    for i, stack in enumerate(("model_1", "model_2")):
        for k, v in _pretrain_sd(seed=30 + i).items():
            sd[f"{stack}.{k}"] = v
    params, stats = convert_cmc_pretrain_sd(sd, "s3d")
    assert set(params) == {"model_1", "model_2"}
    assert "encoder" in params["model_1"] and "proj_head" in params["model_2"]
    # stacks keep their own weights (not accidentally shared)
    a = params["model_1"]["proj_head"]["fc1"]["kernel"]
    b = params["model_2"]["proj_head"]["fc1"]["kernel"]
    assert not np.allclose(a, b)

    back = export_cmc_pretrain_to_torch(params, stats)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k], rtol=1e-6, atol=1e-7)


def test_proj_head_numpy_parity():
    """Converted ProjectHead executes the reference math (mlp + L2 norm)."""
    import jax

    from video_graph_ssl_tpu.models.heads import ProjectHead

    sd = _rand_sd(_head_manifest(in_dim=12, feat_dim=6), 3)
    params = convert_proj_head(sd, "mlp")
    x = np.random.default_rng(4).normal(size=(5, 12)).astype(np.float32)
    # reference: Linear -> ReLU -> Linear -> F.normalize (project_head.py:22-28)
    h = np.maximum(x @ sd["head.0.weight"].T + sd["head.0.bias"], 0.0)
    ref = h @ sd["head.2.weight"].T + sd["head.2.bias"]
    ref = ref / np.maximum(np.linalg.norm(ref, axis=-1, keepdims=True), 1e-12)
    with jax.default_matmul_precision("highest"):  # fp32 parity on TPU
        ours = jax.jit(lambda p, x: ProjectHead(feat_dim=6).apply(
            {"params": p}, x))(params, x)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_simsiam_mlp_numpy_parity():
    """Projection/Prediction MLP conversion matches reference eval math."""
    import jax

    from video_graph_ssl_tpu.models.heads import PredictionMLP, ProjectionMLP

    d, h = 10, 6
    g = np.random.default_rng(5)

    def lin_bn(prefix, din, dout, sd):
        sd[f"{prefix}.0.weight"] = g.normal(0, 0.1, (dout, din)).astype(np.float32)
        sd[f"{prefix}.0.bias"] = g.normal(0, 0.1, dout).astype(np.float32)
        sd[f"{prefix}.1.weight"] = g.uniform(0.5, 1.5, dout).astype(np.float32)
        sd[f"{prefix}.1.bias"] = g.normal(0, 0.1, dout).astype(np.float32)
        sd[f"{prefix}.1.running_mean"] = g.normal(0, 0.1, dout).astype(np.float32)
        sd[f"{prefix}.1.running_var"] = g.uniform(0.5, 2.0, dout).astype(np.float32)

    def np_lin_bn(prefix, x, sd, relu):
        y = x @ sd[f"{prefix}.0.weight"].T + sd[f"{prefix}.0.bias"]
        y = (y - sd[f"{prefix}.1.running_mean"]) / np.sqrt(
            sd[f"{prefix}.1.running_var"] + 1e-5)
        y = y * sd[f"{prefix}.1.weight"] + sd[f"{prefix}.1.bias"]
        return np.maximum(y, 0.0) if relu else y

    proj_sd, pred_sd = {}, {}
    for l, (din, dout) in (("l1", (d, h)), ("l2", (h, h)), ("l3", (h, h))):
        lin_bn(l, din, dout, proj_sd)
    lin_bn("l1", h, h // 2, pred_sd)
    pred_sd["l2.weight"] = g.normal(0, 0.1, (h, h // 2)).astype(np.float32)
    pred_sd["l2.bias"] = g.normal(0, 0.1, h).astype(np.float32)

    x = g.normal(size=(4, d)).astype(np.float32)
    ref = np_lin_bn("l1", x, proj_sd, True)
    ref = np_lin_bn("l2", ref, proj_sd, True)
    ref = np_lin_bn("l3", ref, proj_sd, False)

    pp, ps = convert_projection_mlp(proj_sd)
    with jax.default_matmul_precision("highest"):  # fp32 parity on TPU
        ours = jax.jit(lambda v, x: ProjectionMLP(hid_dim=h, out_dim=h).apply(
            v, x, train=False))({"params": pp, "batch_stats": ps}, x)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)

    ref2 = np_lin_bn("l1", ref, pred_sd, True)
    ref2 = ref2 @ pred_sd["l2.weight"].T + pred_sd["l2.bias"]
    qp, qs = convert_prediction_mlp(pred_sd)
    with jax.default_matmul_precision("highest"):  # fp32 parity on TPU
        ours2 = jax.jit(lambda v, x: PredictionMLP(
            hid_dim=h // 2, out_dim=h).apply(
            v, x, train=False))({"params": qp, "batch_stats": qs}, ref)
    np.testing.assert_allclose(np.asarray(ours2), ref2, rtol=1e-5, atol=1e-5)


def test_graft_and_roundtrip(moco_template, tmp_path):
    """graft -> save -> restore -> surgery -> export-to-torch inverse."""
    from flax import serialization

    from video_graph_ssl_tpu.utils.checkpoint import (
        load_checkpoint_state,
        load_params_only,
        save_checkpoint_state,
        transfer_encoder_params,
    )

    c, template = moco_template
    sd = _pretrain_sd(seed=11)
    queue = np.random.default_rng(12).normal(size=(NCE_K, FEAT_DIM))
    queue = (queue / np.linalg.norm(queue, axis=-1, keepdims=True)
             ).astype(np.float32)
    payload = {"epoch": 7, "state_dict": sd, "contrast": {"memory": queue}}

    state, notes = graft_pretrain_state(template, payload, c)
    assert notes["model_ema"].startswith("copied")
    assert notes["contrast"].startswith("converted")
    np.testing.assert_array_equal(np.asarray(state.contrast.queue), queue)
    # spot-check one conv kernel: OIDHW -> DHWIO transpose
    k = sd["model.encoder.base_model.base.0.conv_s.weight"]
    np.testing.assert_allclose(
        np.asarray(state.params["model"]["encoder"]["base_model"]["stem_0"]
                   ["spatial"]["conv"]["kernel"]),
        np.transpose(k, (2, 3, 4, 1, 0)), rtol=0, atol=0)

    path = os.path.join(tmp_path, "converted.msgpack")
    save_checkpoint_state(path, state, epoch=7, extra=notes)

    # full-state restore (the video_retrieval/test_ds path)
    restored, meta = load_checkpoint_state(path, template)
    assert meta["epoch"] == 7
    np.testing.assert_array_equal(np.asarray(restored.contrast.queue), queue)

    # encoder surgery (the train_ds --ssl_checkpoint path)
    ssl_sd, _meta = load_params_only(path)
    new_p, new_s = transfer_encoder_params(ssl_sd, {}, {})
    got = serialization.to_state_dict(new_p["encoder"])
    want = serialization.to_state_dict(
        state.params["model"]["encoder"])
    np.testing.assert_allclose(
        got["base_model"]["stem_0"]["spatial"]["conv"]["kernel"],
        want["base_model"]["stem_0"]["spatial"]["conv"]["kernel"])

    # MODEL.PRETRAIN_PATH warm-start: locate base_model in a full SSL ckpt
    from video_graph_ssl_tpu.utils.ckpt_convert import load_backbone_init

    bp, bs = load_backbone_init(path, "s3d")
    np.testing.assert_allclose(
        np.asarray(bp["stem_0"]["spatial"]["conv"]["kernel"]),
        np.transpose(k, (2, 3, 4, 1, 0)), rtol=0, atol=0)
    assert "mean" in bs["stem_0"]["spatial"]["bn"]

    # inverse: ours -> reference names reproduces the source exactly
    out_sd = export_pretrain_to_torch(
        serialization.to_state_dict(state.params),
        serialization.to_state_dict(state.batch_stats), "moco", "mlp")
    assert set(out_sd) == set(sd)
    for kname in sd:
        np.testing.assert_allclose(out_sd[kname], sd[kname], rtol=0, atol=0,
                                   err_msg=kname)


def test_downstream_graft_and_inverse():
    from flax import serialization

    from video_graph_ssl_tpu.engine import create_downstream_state
    from video_graph_ssl_tpu.models import create_video_model

    c = _cfg("moco")
    c.DATASET.NUM_CLASS = 5
    model, _ = create_video_model(c)
    state, _tx = create_downstream_state(c, model, np.zeros(EXAMPLE, np.float32))

    sd = {f"base_model.{k}": v
          for k, v in _rand_sd(reference_s3d_shape_manifest(), 21).items()}
    g = np.random.default_rng(22)
    sd["new_fc.weight"] = g.normal(0, 0.01, (5, 1024)).astype(np.float32)
    sd["new_fc.bias"] = np.zeros(5, np.float32)

    state, _notes = graft_downstream_state(state, {"state_dict": sd}, c)
    np.testing.assert_allclose(
        np.asarray(state.params["new_fc"]["kernel"]), sd["new_fc.weight"].T)

    out_sd = export_downstream_to_torch(
        serialization.to_state_dict(state.params),
        serialization.to_state_dict(state.batch_stats))
    assert set(out_sd) == set(sd)
    for kname in sd:
        np.testing.assert_allclose(out_sd[kname], sd[kname], err_msg=kname)


def test_simsiam_graft_and_inverse():
    """Full SimSiam GraphWrapper conversion: graft into a real template and
    invert back to reference names exactly."""
    from flax import serialization

    from video_graph_ssl_tpu.engine import create_pretrain_state
    from video_graph_ssl_tpu.models import create_visual_model

    c = _cfg("simsiam")
    model, _ = create_visual_model(c)
    state, _tx = create_pretrain_state(
        c, model, np.zeros((2, 2) + EXAMPLE[1:], np.float32), n_data=4)
    assert state.contrast is None and state.ema_params is None

    sd = {}
    for k, v in _rand_sd(reference_s3d_shape_manifest(), 61).items():
        sd[f"model.encoder.base_model.{k}"] = v
    g = np.random.default_rng(62)

    def lin_bn(prefix, din, dout):
        sd[f"{prefix}.0.weight"] = g.normal(0, 0.1, (dout, din)).astype(np.float32)
        sd[f"{prefix}.0.bias"] = g.normal(0, 0.1, dout).astype(np.float32)
        sd[f"{prefix}.1.weight"] = g.uniform(0.5, 1.5, dout).astype(np.float32)
        sd[f"{prefix}.1.bias"] = g.normal(0, 0.1, dout).astype(np.float32)
        sd[f"{prefix}.1.running_mean"] = g.normal(0, 0.1, dout).astype(np.float32)
        sd[f"{prefix}.1.running_var"] = g.uniform(0.5, 2.0, dout).astype(np.float32)

    # reference SimSiam dims (graph_wrappers.py:30-44): projection
    # 1024->hid(->hid->hid), prediction hid->hid//2->hid
    hid = FEAT_DIM
    lin_bn("model.projection.l1", 1024, hid)
    lin_bn("model.projection.l2", hid, hid)
    lin_bn("model.projection.l3", hid, hid)
    lin_bn("model.prediction.l1", hid, hid // 2)
    sd["model.prediction.l2.weight"] = g.normal(
        0, 0.1, (hid, hid // 2)).astype(np.float32)
    sd["model.prediction.l2.bias"] = g.normal(0, 0.1, hid).astype(np.float32)

    state, _notes = graft_pretrain_state(state, {"state_dict": sd}, c)
    out_sd = export_pretrain_to_torch(
        serialization.to_state_dict(state.params),
        serialization.to_state_dict(state.batch_stats), "simsiam")
    assert set(out_sd) == set(sd)
    for kname in sd:
        np.testing.assert_allclose(out_sd[kname], sd[kname], rtol=0, atol=0,
                                   err_msg=kname)


def test_load_backbone_init_torch_file(tmp_path):
    """Bare-backbone .pth warm-start (reference visual_wrappers.py:137-139)."""
    torch = pytest.importorskip("torch")

    from video_graph_ssl_tpu.utils.ckpt_convert import load_backbone_init
    from video_graph_ssl_tpu.utils.torch_interop import convert_torch_s3d

    sd = _rand_sd(reference_s3d_shape_manifest(), 41)
    path = os.path.join(tmp_path, "backbone.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    bp, bs = load_backbone_init(path, "s3d")
    want_p, want_s = convert_torch_s3d(sd)
    np.testing.assert_allclose(
        bp["mixed_3b"]["branch1"]["temporal"]["conv"]["kernel"],
        want_p["mixed_3b"]["branch1"]["temporal"]["conv"]["kernel"])
    np.testing.assert_allclose(
        bs["mixed_3b"]["branch1"]["temporal"]["bn"]["var"],
        want_s["mixed_3b"]["branch1"]["temporal"]["bn"]["var"])

    with pytest.raises(NotImplementedError):
        load_backbone_init(path, "tiny3d")


@pytest.mark.parametrize("family", ["resnet3d_10", "resnet50"])
def test_resnet_conversion_grafts_exactly(family):
    """convert_torch_resnet fills our ResNet trees leaf-for-leaf (both
    dims, both block types; state_dict synthesized from the audited
    manifest)."""
    import jax
    import jax.numpy as jnp

    from video_graph_ssl_tpu.utils.ckpt_convert import graft_like
    from video_graph_ssl_tpu.utils.torch_interop import (
        convert_torch_resnet,
        reference_resnet_shape_manifest,
    )

    if family == "resnet3d_10":
        from video_graph_ssl_tpu.models.resnet3d import resnet3d_10 as ctor

        dims, depth = 3, 10
        x = np.zeros((1, 4, 16, 16, 3), np.float32)
    else:
        from video_graph_ssl_tpu.models.resnet2d import resnet50 as ctor

        dims, depth = 2, 50
        x = np.zeros((1, 32, 32, 3), np.float32)

    model = ctor(num_classes=None, dtype=jnp.float32)
    variables = jax.jit(model.init)({"params": jax.random.key(0)}, x)

    sd = _rand_sd(reference_resnet_shape_manifest(depth, dims), 51)
    p, s = convert_torch_resnet(sd, dims=dims)
    grafted_p = graft_like(dict(variables["params"]), p, "params")
    graft_like(dict(variables["batch_stats"]), s, "batch_stats")
    np.testing.assert_allclose(
        grafted_p["layer2_0"]["ds_conv"]["kernel"],
        np.transpose(sd["layer2.0.downsample.0.weight"],
                     (2, 3, 1, 0) if dims == 2 else (2, 3, 4, 1, 0)))


def test_resnet2d_conv_perm_matches_torch():
    """The 2D (O,I,kh,kw) -> (kh,kw,I,O) permutation executes torch's conv."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    g = np.random.default_rng(6)
    w = g.normal(0, 0.1, (5, 3, 3, 3)).astype(np.float32)   # O I kh kw
    x = g.normal(0, 1.0, (2, 3, 8, 8)).astype(np.float32)   # N C H W
    with torch.no_grad():
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()
    with jax.default_matmul_precision("highest"):  # fp32 parity on TPU
        ours = jax.jit(lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))(
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(w, (2, 3, 1, 0))))
    np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 3, 1, 2)),
                               ref, rtol=1e-4, atol=1e-4)


def test_convert_pretrain_sd_rejects_unknown_backbone():
    with pytest.raises(NotImplementedError):
        convert_pretrain_sd({"model.encoder.base_model.x": 0}, "tiny3d",
                            "moco")


def test_cli_end_to_end(tmp_path):
    """tools/convert_checkpoint.py on a real torch.save'd payload."""
    torch = pytest.importorskip("torch")

    import tools.convert_checkpoint as cc
    from video_graph_ssl_tpu.utils.checkpoint import load_params_only

    sd = {k: torch.from_numpy(v) for k, v in _pretrain_sd(seed=31).items()}
    queue = torch.from_numpy(
        np.random.default_rng(32).normal(size=(NCE_K, FEAT_DIM))
        .astype(np.float32))
    src = os.path.join(tmp_path, "ref.pth.tar")
    torch.save({"epoch": 3, "state_dict": sd,
                "contrast": {"memory": queue}, "optimizer": {}}, src)

    out = os.path.join(tmp_path, "ref.msgpack")
    cc.main(["--torch_ckpt", src, "--output", out,
             "MODEL.BACKBONE", "S3D", "MODEL.BACKBONE_TYPE", "3D",
             "MODEL.AUG_FLAG", "False",
             "MODEL.DROPOUT", "0.0",
             "CONTRAST.MEM_TYPE", "moco", "CONTRAST.NCE_K", str(NCE_K),
             "CROSS.FEAT_DIM", str(FEAT_DIM),
             "INPUT.VIDEO_LENGTH", "8", "INPUT.BASE_SIZE", "(32, 32)"])
    ssl_sd, meta = load_params_only(out)
    assert meta["epoch"] == 3
    assert meta["optimizer"] == "reinitialized"
    np.testing.assert_array_equal(
        np.asarray(ssl_sd["contrast"]["queue"]), queue.numpy())

    back = os.path.join(tmp_path, "back.pth.tar")
    cc.main(["--checkpoint", out, "--to_torch", back,
             "CONTRAST.MEM_TYPE", "moco", "CROSS.HEAD_TYPE", "mlp"])
    roundtrip = torch.load(back, weights_only=False)
    assert roundtrip["epoch"] == 3
    k = "model.encoder.base_model.base.0.conv_s.weight"
    np.testing.assert_allclose(roundtrip["state_dict"][k].numpy(),
                               sd[k].numpy())
