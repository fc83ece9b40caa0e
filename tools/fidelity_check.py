#!/usr/bin/env python
"""Reference-checkpoint fidelity check (BASELINE.md north star).

One command that proves a reference PyTorch checkpoint produces the same
features in this framework, for every backbone with a reference loader:

  --backbone s3d   lib/modeling/backbone/backbone_3d/s3d_1.py
  --backbone s3dg  lib/modeling/backbone/backbone_3d/S3DG_Pytorch.py
                   (the biased-STConv3d variant; features.N naming)
  --backbone i3d   lib/modeling/backbone/backbone_3d/i3dpt.py
                   (TF-SAME padding; also exercises the TF-name loader
                   when --tf_npz is given, mirroring load_tf_weights)
  --backbone resnet3d_{10..200} / resnet{18..152}
                   lib/modeling/backbone/backbone_3d/resnet.py and
                   backbone_2d/resnet.py (trunk features; the 2D path
                   folds frames into the batch)

Steps:
  1. load the torch state_dict (``--torch_ckpt``; or synthesize a random
     reference-shaped one with ``--synthetic`` for the data-less dry run),
  2. run the REFERENCE model code itself (imported by file path from
     /root/reference, executed as ground truth — nothing is copied) on a
     fixed input batch,
  3. convert the checkpoint with utils/torch_interop and run our model
     under jit,
  4. report feature/logit MSE, max abs diff, and cosine similarity, and
     exit non-zero if outside tolerance.

With real UCF101/HMDB51 data, follow up with tools/video_retrieval.py on
both frameworks' features and compare R@k against BASELINE.md.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DIR = "/root/reference/lib/modeling/backbone/backbone_3d"


def _load_ref_module(fname: str, modname: str):
    spec = importlib.util.spec_from_file_location(
        modname, os.path.join(REF_DIR, fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _load_ref_pkg_module(directory: str, fname: str, pkgname: str):
    """Load a reference module that uses relative imports (e.g.
    backbone_2d/resnet.py's ``from .utils import ...``) by registering a
    synthetic parent package pointing at the reference directory."""
    import types

    if pkgname not in sys.modules:
        pkg = types.ModuleType(pkgname)
        pkg.__path__ = [directory]
        sys.modules[pkgname] = pkg
    name = f"{pkgname}.{os.path.splitext(fname)[0]}"
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(directory, fname))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _head_pool(base_np: np.ndarray) -> np.ndarray:
    """Reference head weighting (s3d_1.py:28-35 == i3dpt.py:230-262 up to
    the linear classifier): spatial mean -> adjacent-frame-pair average ->
    temporal mean, on (B, C, T', H', W')."""
    feat_t = base_np.mean(axis=(3, 4))                  # (B, C, T')
    if feat_t.shape[-1] > 1:
        feat_t = (feat_t[..., :-1] + feat_t[..., 1:]) * 0.5
    return feat_t.mean(axis=-1)


def synthesize_state_dict(manifest):
    g = np.random.default_rng(0)
    sd = {}
    for name, shape in manifest.items():
        if name.endswith("running_var"):
            sd[name] = g.uniform(0.5, 1.5, shape).astype(np.float32)
        elif name.endswith(("weight",)) and len(shape) == 5:
            sd[name] = (g.standard_normal(shape) * 0.05).astype(np.float32)
        else:
            sd[name] = (g.standard_normal(shape) * 0.1).astype(np.float32)
    return sd


# --------------------------------------------------------------------------- #
# per-backbone adapters
# --------------------------------------------------------------------------- #

def run_s3d(sd, x, has_fc, n_cls):
    import torch
    from video_graph_ssl_tpu.utils.torch_interop import convert_torch_s3d

    mod = _load_ref_module("s3d_1.py", "ref_s3d")
    ref = mod.S3D(num_class=n_cls)
    missing, unexpected = ref.load_state_dict(
        {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
    unexpected = [k for k in unexpected
                  if not k.endswith("num_batches_tracked")]
    assert not unexpected, f"unconsumed checkpoint keys: {unexpected[:5]}"
    if missing:
        print(f"note: {len(missing)} reference params not in ckpt "
              f"(e.g. {missing[0]}) — encoder-only checkpoint")
    ref.eval()
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))  # NCDHW
    with torch.no_grad():
        if has_fc:
            theirs, what = ref(xt).numpy(), "logits"
        else:
            theirs, what = _head_pool(ref.base(xt).numpy()), "features"

    import jax.numpy as jnp
    from video_graph_ssl_tpu.models.s3d import S3D

    params, stats = convert_torch_s3d(sd, with_classifier=has_fc)
    model = S3D(num_classes=n_cls if has_fc else None, dtype=jnp.float32)
    return model, params, stats, theirs, what, x


def run_s3dg(sd, x, has_fc, n_cls):
    import torch
    from video_graph_ssl_tpu.utils.torch_interop import convert_torch_s3dg

    mod = _load_ref_module("S3DG_Pytorch.py", "ref_s3dg")
    ref = mod.S3DG(num_classes=n_cls)
    # torch's own strict load (the reference's custom load_state_dict is the
    # INFLATION path, exercised separately by inflate_s3dg_checkpoint tests)
    torch.nn.Module.load_state_dict(
        ref, {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
    ref.eval()
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    with torch.no_grad():
        # encoder truncation: features[:16] == through Mixed_5c
        # (S3DG_Pytorch.py:314-331); the reference's own head AvgPool3d
        # k=(2,7,7) assumes 224^2 inputs, so features are the comparable
        # surface at SSL geometry.
        base = xt
        for i in range(16):
            base = ref.features[i](base)
        theirs, what = _head_pool(base.numpy()), "features"

    import jax.numpy as jnp
    from video_graph_ssl_tpu.models.s3d import S3D

    params, stats = convert_torch_s3dg(sd, with_classifier=False)
    model = S3D(num_classes=None, temporal_bias=True, dtype=jnp.float32)
    return model, params, stats, theirs, what, x


def run_i3d(sd, x, has_fc, n_cls):
    import torch
    from video_graph_ssl_tpu.utils.torch_interop import convert_torch_i3d

    mod = _load_ref_module("i3dpt.py", "ref_i3d")
    ref = mod.I3D(num_classes=n_cls, modality="rgb")
    missing, unexpected = ref.load_state_dict(
        {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
    unexpected = [k for k in unexpected
                  if not k.endswith("num_batches_tracked")]
    assert not unexpected, f"unconsumed checkpoint keys: {unexpected[:5]}"
    ref.eval()
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    with torch.no_grad():
        # encoder truncation through mixed_5c (i3dpt.py:244-259); the
        # reference head's AvgPool3d k=(2,7,7) assumes 224^2 inputs.
        out = ref.conv3d_1a_7x7(xt)
        out = ref.maxPool3d_2a_3x3(out)
        out = ref.conv3d_2b_1x1(out)
        out = ref.conv3d_2c_3x3(out)
        out = ref.maxPool3d_3a_3x3(out)
        for name in ("mixed_3b", "mixed_3c"):
            out = getattr(ref, name)(out)
        out = ref.maxPool3d_4a_3x3(out)
        for name in ("mixed_4b", "mixed_4c", "mixed_4d", "mixed_4e",
                     "mixed_4f"):
            out = getattr(ref, name)(out)
        out = ref.maxPool3d_5a_2x2(out)
        out = ref.mixed_5b(out)
        out = ref.mixed_5c(out)
        theirs, what = _head_pool(out.numpy()), "features"

    import jax.numpy as jnp
    from video_graph_ssl_tpu.models.i3d import I3D

    params, stats = convert_torch_i3d(sd, with_classifier=False)
    model = I3D(num_classes=None, dtype=jnp.float32)
    return model, params, stats, theirs, what, x


def run_resnet3d(depth):
    def run(sd, x, has_fc, n_cls):
        import torch
        from video_graph_ssl_tpu.utils.torch_interop import (
            _RESNET_LAYERS,
            convert_torch_resnet,
        )

        # the reference file uses the pre-1.0 ``nn.init.kaiming_normal``
        # (resnet.py:145); alias it to the in-place variant (same values,
        # and it returns the Parameter so the reference's re-assignment
        # still type-checks)
        if not hasattr(torch.nn.init, "kaiming_normal"):
            torch.nn.init.kaiming_normal = torch.nn.init.kaiming_normal_
        mod = _load_ref_module("resnet.py", "ref_resnet3d")
        block_name, layers = _RESNET_LAYERS[depth]
        block = mod.BasicBlock if block_name == "basic" else mod.Bottleneck
        ref = mod.ResNet(block, list(layers), sample_size=x.shape[2],
                         sample_duration=x.shape[1], shortcut_type="B",
                         num_classes=n_cls)
        missing, unexpected = ref.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
        unexpected = [k for k in unexpected
                      if not k.endswith("num_batches_tracked")]
        assert not unexpected, f"unconsumed checkpoint keys: {unexpected[:5]}"
        ref.eval()
        xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))  # NCDHW
        with torch.no_grad():
            out = ref.maxpool(ref.relu(ref.bn1(ref.conv1(xt))))
            for l in (ref.layer1, ref.layer2, ref.layer3, ref.layer4):
                out = l(out)
            # global trunk pooling == our encoder's mean over (T', H', W')
            theirs = out.numpy().mean(axis=(2, 3, 4))

        import jax.numpy as jnp
        from video_graph_ssl_tpu.models import resnet3d as ours_mod

        params, stats = convert_torch_resnet(sd, dims=3)
        model = getattr(ours_mod, f"resnet3d_{depth}")(
            num_classes=None, dtype=jnp.float32)
        return model, params, stats, theirs, "features", x

    return run


def run_resnet2d(depth):
    def run(sd, x, has_fc, n_cls):
        import torch
        from video_graph_ssl_tpu.utils.torch_interop import (
            _RESNET_LAYERS,
            convert_torch_resnet,
        )

        mod = _load_ref_pkg_module(
            os.path.join(os.path.dirname(REF_DIR), "backbone_2d"),
            "resnet.py", "ref_backbone_2d")
        block_name, layers = _RESNET_LAYERS[depth]
        block = mod.BasicBlock if block_name == "basic" else mod.Bottleneck
        ref = mod.ResNet(block, list(layers), num_classes=n_cls)
        missing, unexpected = ref.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
        unexpected = [k for k in unexpected
                      if not k.endswith("num_batches_tracked")]
        assert not unexpected, f"unconsumed checkpoint keys: {unexpected[:5]}"
        ref.eval()
        # frames fold into the batch: the 2D path sees (B*T, H, W, C)
        x2 = x.reshape((-1,) + x.shape[2:])
        xt = torch.from_numpy(np.transpose(x2, (0, 3, 1, 2)))  # NCHW
        with torch.no_grad():
            out = ref.maxpool(ref.relu(ref.bn1(ref.conv1(xt))))
            for l in (ref.layer1, ref.layer2, ref.layer3, ref.layer4):
                out = l(out)
            theirs = out.numpy().mean(axis=(2, 3))

        import jax.numpy as jnp
        from video_graph_ssl_tpu.models import resnet2d as ours_mod

        params, stats = convert_torch_resnet(sd, dims=2)
        model = getattr(ours_mod, f"resnet{depth}")(
            num_classes=None, dtype=jnp.float32)
        return model, params, stats, theirs, "features", x2

    return run


def run_bninception(sd, x, has_fc, n_cls):
    import torch

    mod = _load_ref_pkg_module(
        os.path.join(os.path.dirname(REF_DIR), "backbone_2d"),
        "bninception.py", "ref_backbone_2d_bninc")
    ref = mod.BNInception(num_classes=n_cls, aux_logits=False,
                          init_weights=False)
    missing, unexpected = ref.load_state_dict(
        {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
    unexpected = [k for k in unexpected
                  if not k.endswith("num_batches_tracked")]
    assert not unexpected, f"unconsumed checkpoint keys: {unexpected[:5]}"
    ref.eval()
    x2 = x.reshape((-1,) + x.shape[2:])
    xt = torch.from_numpy(np.transpose(x2, (0, 3, 1, 2)))  # NCHW
    with torch.no_grad():
        # stage-by-stage (the reference forward is littered with debug
        # prints, bninception.py:78-131)
        out = ref.maxpool2(ref.conv3(ref.conv2(ref.maxpool1(ref.conv1(xt)))))
        for blk in (ref.inception3a, ref.inception3b, ref.inception3c,
                    ref.inception4a, ref.inception4b, ref.inception4c,
                    ref.inception4d, ref.inception4e, ref.inception5a,
                    ref.inception5b):
            out = blk(out)
        theirs = out.numpy().mean(axis=(2, 3))

    import jax.numpy as jnp
    from video_graph_ssl_tpu.models.bninception import BNInception
    from video_graph_ssl_tpu.utils.torch_interop import \
        convert_torch_bninception

    params, stats = convert_torch_bninception(sd)
    model = BNInception(num_classes=None, dtype=jnp.float32)
    return model, params, stats, theirs, "features", x2


def run_inception_v3(sd, x, has_fc, n_cls):
    import torch
    import torch.nn.functional as F

    mod = _load_ref_pkg_module(
        os.path.join(os.path.dirname(REF_DIR), "backbone_2d"),
        "inceptionv3.py", "ref_backbone_2d_inc3")
    ref = mod.Inception3(num_classes=n_cls, aux_logits=False,
                         transform_input=False)
    missing, unexpected = ref.load_state_dict(
        {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
    unexpected = [k for k in unexpected
                  if not k.endswith("num_batches_tracked")]
    assert not unexpected, f"unconsumed checkpoint keys: {unexpected[:5]}"
    ref.eval()
    x2 = x.reshape((-1,) + x.shape[2:])
    xt = torch.from_numpy(np.transpose(x2, (0, 3, 1, 2)))  # NCHW
    with torch.no_grad():
        # stage-by-stage (forward order: inceptionv3.py:98-135; skips
        # the fixed-k8 head pool so any 299-like geometry works)
        out = ref.Conv2d_2b_3x3(ref.Conv2d_2a_3x3(ref.Conv2d_1a_3x3(xt)))
        out = F.max_pool2d(out, kernel_size=3, stride=2)
        out = ref.Conv2d_4a_3x3(ref.Conv2d_3b_1x1(out))
        out = F.max_pool2d(out, kernel_size=3, stride=2)
        for blk in (ref.Mixed_5b, ref.Mixed_5c, ref.Mixed_5d, ref.Mixed_6a,
                    ref.Mixed_6b, ref.Mixed_6c, ref.Mixed_6d, ref.Mixed_6e,
                    ref.Mixed_7a, ref.Mixed_7b, ref.Mixed_7c):
            out = blk(out)
        theirs = out.numpy().mean(axis=(2, 3))

    import jax.numpy as jnp
    from video_graph_ssl_tpu.models.inceptionv3 import InceptionV3
    from video_graph_ssl_tpu.utils.torch_interop import \
        convert_torch_inception_v3

    params, stats = convert_torch_inception_v3(sd)
    model = InceptionV3(num_classes=None, dtype=jnp.float32)
    return model, params, stats, theirs, "features", x2


def run_resnet2p1d(depth):
    def run(sd, x, has_fc, n_cls):
        import torch

        mod = _load_ref_pkg_module(REF_DIR, "resnet2p1d.py",
                                   "ref_backbone_3d_r2p1d")
        ref = mod.generate_model(depth, n_classes=n_cls)
        missing, unexpected = ref.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
        unexpected = [k for k in unexpected
                      if not k.endswith("num_batches_tracked")]
        assert not unexpected, f"unconsumed checkpoint keys: {unexpected[:5]}"
        ref.eval()
        xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))  # NCDHW
        with torch.no_grad():
            out = ref.relu(ref.bn1_s(ref.conv1_s(xt)))
            out = ref.relu(ref.bn1_t(ref.conv1_t(out)))
            out = ref.maxpool(out)
            for l in (ref.layer1, ref.layer2, ref.layer3, ref.layer4):
                out = l(out)
            theirs = out.numpy().mean(axis=(2, 3, 4))

        import jax.numpy as jnp
        from video_graph_ssl_tpu.models import resnet2p1d as ours_mod
        from video_graph_ssl_tpu.utils.torch_interop import \
            convert_torch_resnet2p1d

        params, stats = convert_torch_resnet2p1d(sd)
        model = getattr(ours_mod, f"resnet2p1d_{depth}")(
            num_classes=None, dtype=jnp.float32)
        return model, params, stats, theirs, "features", x

    return run


_BACKENDS = {"s3d": run_s3d, "s3dg": run_s3dg, "i3d": run_i3d,
             "bninception": run_bninception,
             "inception_v3": run_inception_v3}
for _d in (10, 18, 34, 50, 101, 152, 200):
    _BACKENDS[f"resnet2p1d_{_d}"] = run_resnet2p1d(_d)


def run_resnet_i3d(depth):
    def run(sd, x, has_fc, n_cls):
        import torch

        mod = _load_ref_pkg_module(REF_DIR, "resnet_i3d.py",
                                   "ref_backbone_3d_ri3d")
        ref = getattr(mod, f"resnet{depth}")(num_classes=n_cls,
                                             sample_duration=x.shape[1],
                                             sample_size=x.shape[2])
        missing, unexpected = ref.load_state_dict(
            {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
        unexpected = [k for k in unexpected
                      if not k.endswith("num_batches_tracked")]
        assert not unexpected, f"unconsumed checkpoint keys: {unexpected[:5]}"
        ref.eval()
        xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))  # NCDHW
        with torch.no_grad():
            out = ref.maxpool(ref.relu(ref.bn1(ref.conv1(xt))))
            for l in (ref.layer1, ref.layer2, ref.layer3, ref.layer4):
                out = l(out)
            theirs = out.numpy().mean(axis=(2, 3, 4))

        import jax.numpy as jnp
        from video_graph_ssl_tpu.models import resnet3d as ours_mod
        from video_graph_ssl_tpu.utils.torch_interop import \
            convert_torch_resnet_i3d

        params, stats = convert_torch_resnet_i3d(sd)
        model = getattr(ours_mod, f"resnet_i3d_{depth}")(
            num_classes=None, dtype=jnp.float32)
        return model, params, stats, theirs, "features", x

    return run


def run_s3dg_text(sd, x, has_fc, n_cls):
    """Text-video S3D (MIL-NCE naming): checks the video tower AND the
    text tower in one comparison (rows = [video embeddings; text
    embeddings of two fixed sentences])."""
    import tempfile

    import torch

    vocab = ["hello", "world", "video", "graph", "contrastive", "tpu"]
    dict_path = os.path.join(tempfile.mkdtemp(), "dict.npy")
    np.save(dict_path, np.array(vocab))
    sentences = ["hello world video", "graph contrastive tpu hello"]

    mod = _load_ref_pkg_module(REF_DIR, "s3dg.py", "ref_backbone_3d_s3dgt")
    embd = sd["fc.weight"].shape[0]
    ref = mod.S3D(dict_path, num_classes=embd, gating=True,
                  space_to_depth=True)
    missing, unexpected = ref.load_state_dict(
        {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False)
    unexpected = [k for k in unexpected
                  if not k.endswith("num_batches_tracked")]
    assert not unexpected, f"unconsumed checkpoint keys: {unexpected[:5]}"
    ref.eval()
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))  # NCDHW
    with torch.no_grad():
        v_ref = ref(xt)["video_embedding"].numpy()
        t_ref = ref.text_module(sentences)["text_embedding"].numpy()
    theirs = np.concatenate([v_ref, t_ref], axis=0)

    import jax.numpy as jnp
    from video_graph_ssl_tpu.models.s3dg_text import (S3DGText,
                                                      build_word_to_token,
                                                      tokenize)
    from video_graph_ssl_tpu.utils.torch_interop import \
        convert_torch_s3dg_text

    params, stats = convert_torch_s3dg_text(sd)
    n_emb = sd["text_module.word_embd.weight"].shape[0]
    model = S3DGText(embd_dim=embd, num_text_embeddings=n_emb,
                     dtype=jnp.float32)
    ids = jnp.asarray(tokenize(sentences, build_word_to_token(vocab)))

    class Shim:
        def apply(self, variables, video, train=False):
            out = model.apply(variables, video, ids, train=train)
            return jnp.concatenate(
                [out["video_embedding"], out["text_embedding"]], axis=0)

    return Shim(), params, stats, theirs, "video+text embeddings", x


_BACKENDS["s3dg_text"] = run_s3dg_text


# fbasic only: the fbottleneck converter maps weights but our block fixes
# the reference's pre-add ReLU (documented deviation), so numeric
# fidelity vs the executed reference is only defined for the basic family.
for _d in (18, 34):
    _BACKENDS[f"resnet_i3d_{_d}"] = run_resnet_i3d(_d)
for _d in (10, 18, 34, 50, 101, 152, 200):
    _BACKENDS[f"resnet3d_{_d}"] = run_resnet3d(_d)
for _d in (18, 34, 50, 101, 152):
    _BACKENDS[f"resnet{_d}"] = run_resnet2d(_d)


def _manifest(backbone, num_classes):
    from video_graph_ssl_tpu.utils import torch_interop as ti
    if backbone == "s3d":
        return ti.reference_s3d_shape_manifest(num_classes)
    if backbone == "s3dg":
        return ti.reference_s3dg_shape_manifest(None)
    if backbone == "s3dg_text":
        # the reference Sentence_Embedding hardcodes 66250 embeddings
        return ti.reference_s3dg_text_shape_manifest()
    if backbone == "bninception":
        return ti.reference_bninception_shape_manifest(num_classes)
    if backbone == "inception_v3":
        return ti.reference_inception_v3_shape_manifest(num_classes)
    if backbone.startswith("resnet_i3d"):
        return ti.reference_resnet_i3d_shape_manifest(
            int(backbone.rsplit("_", 1)[-1]))
    if backbone.startswith("resnet2p1d"):
        return ti.reference_resnet2p1d_shape_manifest(
            int(backbone.rsplit("_", 1)[-1]))
    if backbone.startswith("resnet"):
        depth = int(backbone.rsplit("_", 1)[-1].replace("resnet", ""))
        return ti.reference_resnet_shape_manifest(
            depth, dims=3 if "3d" in backbone else 2)
    return ti.reference_i3d_shape_manifest(None)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--backbone", choices=sorted(_BACKENDS), default="s3d")
    ap.add_argument("--torch_ckpt", default=None,
                    help=".pth/.pth.tar reference checkpoint")
    ap.add_argument("--tf_npz", default=None,
                    help="i3d only: .npz of TF variable-name -> array "
                         "(convert_tf_i3d path, mirrors ref load_tf_weights)")
    ap.add_argument("--synthetic", action="store_true",
                    help="dry run on a synthesized reference-shaped ckpt")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=112)
    ap.add_argument("--num_classes", type=int, default=101)
    ap.add_argument("--tol_rel", type=float, default=2e-3,
                    help="max allowed relative L2 error (fp32 conv reorder)")
    args = ap.parse_args(argv)

    from video_graph_ssl_tpu.utils.torch_interop import (
        load_torch_file, strip_prefixes)

    if args.tf_npz:
        # Route TF vars through the same torch-named dict the reference's
        # load_tf_weights builds (tf_i3d_to_torch_sd), then continue exactly
        # as a torch checkpoint — the torch ground-truth run consumes it.
        assert args.backbone == "i3d", "--tf_npz is an I3D checkpoint format"
        from video_graph_ssl_tpu.utils.torch_interop import tf_i3d_to_torch_sd
        sd = tf_i3d_to_torch_sd(dict(np.load(args.tf_npz)))
    elif args.torch_ckpt:
        sd = strip_prefixes(load_torch_file(args.torch_ckpt))
    elif args.synthetic:
        sd = synthesize_state_dict(_manifest(args.backbone, args.num_classes))
    else:
        ap.error("pass --torch_ckpt PATH or --synthetic")

    fc_key = {"s3d": "fc.0.weight", "s3dg": "features.18.weight",
              "i3d": "conv3d_0c_1x1.conv3d.weight"}.get(
                  args.backbone, "fc.weight")
    has_fc = fc_key in sd and args.backbone == "s3d"
    n_cls = sd[fc_key].shape[0] if fc_key in sd else args.num_classes

    g = np.random.default_rng(42)
    x = g.standard_normal(
        (args.batch, args.frames, args.size, args.size, 3)).astype(np.float32)

    model, params, stats, theirs, what, x = _BACKENDS[args.backbone](
        sd, x, has_fc, n_cls)

    import jax
    import jax.numpy as jnp

    variables = {"params": params, "batch_stats": stats}
    out = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(
        variables, jnp.asarray(x))
    ours = np.asarray(out)

    diff = ours - theirs
    rel = np.linalg.norm(diff) / max(np.linalg.norm(theirs), 1e-12)
    cos = float(np.sum(ours * theirs)
                / max(np.linalg.norm(ours) * np.linalg.norm(theirs), 1e-12))
    print(f"{args.backbone} {what}: shape {ours.shape}  "
          f"mse {np.mean(diff**2):.3e}  max|d| {np.max(np.abs(diff)):.3e}  "
          f"rel_l2 {rel:.3e}  cos {cos:.6f}")
    ok = rel < args.tol_rel
    print("FIDELITY_OK" if ok else f"FIDELITY_FAIL (rel_l2 {rel:.3e} "
          f">= {args.tol_rel})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
