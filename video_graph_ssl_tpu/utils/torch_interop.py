"""PyTorch <-> JAX checkpoint interoperability for S3D.

The north star requires pretrained-feature fidelity against the PyTorch
reference at eval tolerance, which means reference checkpoints must load
into this framework.  This module maps the reference S3D state_dict names
(lib/modeling/backbone/backbone_3d/s3d_1.py layout: ``base.N...`` Sequential
indices, SepConv3d's ``conv_s/bn_s/conv_t/bn_t``, Mixed branches
``branchK.J``) onto our Flax tree (models/s3d.py: ``stem_N``/``mixed_XY``
with ``spatial``/``temporal``/``block`` ConvBN submodules), including the
layout transposes:

    conv3d  torch (O, I, kt, kh, kw)  ->  flax (kt, kh, kw, I, O)
    BN      weight/bias               ->  scale/bias (params)
            running_mean/var          ->  mean/var   (batch_stats)
    linear  torch (O, I)              ->  flax kernel (I, O)

Works on plain numpy dicts — no torch import needed for conversion itself
(torch is only needed to unpickle ``.pth`` files, via ``load_torch_file``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

# our stage name -> (reference base index, stage kind)
_S3D_STAGES = {
    "stem_0": (0, "sep"),
    "stem_2": (2, "basic"),
    "stem_3": (3, "sep"),
    "mixed_3b": (5, "mixed"),
    "mixed_3c": (6, "mixed"),
    "mixed_4b": (8, "mixed"),
    "mixed_4c": (9, "mixed"),
    "mixed_4d": (10, "mixed"),
    "mixed_4e": (11, "mixed"),
    "mixed_4f": (12, "mixed"),
    "mixed_5b": (14, "mixed"),
    "mixed_5c": (15, "mixed"),
}

# our branch submodule -> (reference branch index, layer index, kind)
_MIXED_BRANCHES = {
    "branch0": (0, 0, "basic"),
    "branch1_reduce": (1, 0, "basic"),
    "branch1": (1, 1, "sep"),
    "branch2_reduce": (2, 0, "basic"),
    "branch2": (2, 1, "sep"),
    "branch3": (3, 1, "basic"),   # index 1: after the branch MaxPool
}


def _conv(sd: Dict[str, np.ndarray], name: str) -> np.ndarray:
    w = np.asarray(sd[name])
    return np.transpose(w, (2, 3, 4, 1, 0))


def _convbn(sd, conv_name: str, bn_name: str) -> Tuple[dict, dict]:
    params = {
        "conv": {"kernel": _conv(sd, conv_name + ".weight")},
        "bn": {"scale": np.asarray(sd[bn_name + ".weight"]),
               "bias": np.asarray(sd[bn_name + ".bias"])},
    }
    stats = {
        "bn": {"mean": np.asarray(sd[bn_name + ".running_mean"]),
               "var": np.asarray(sd[bn_name + ".running_var"])},
    }
    return params, stats


def _sep(sd, prefix: str) -> Tuple[dict, dict]:
    sp, ss = _convbn(sd, prefix + ".conv_s", prefix + ".bn_s")
    tp, ts = _convbn(sd, prefix + ".conv_t", prefix + ".bn_t")
    return {"spatial": sp, "temporal": tp}, {"spatial": ss, "temporal": ts}


def _basic(sd, prefix: str) -> Tuple[dict, dict]:
    p, s = _convbn(sd, prefix + ".conv", prefix + ".bn")
    return {"block": p}, {"block": s}


def strip_prefixes(sd: Dict[str, np.ndarray],
                   prefixes=("module.", "encoder.", "base_model.",
                             "model.")) -> Dict[str, np.ndarray]:
    """Remove wrapper prefixes (DDP 'module.', ContrastWrapper 'encoder.',
    VisualModelWrapper 'base_model.'), like the reference's checkpoint
    surgery (tools/video_retrieval.py:42, train_ds.py:70-79)."""
    out = dict(sd)
    changed = True
    while changed:
        changed = False
        for pre in prefixes:
            if out and all(k.startswith(pre) for k in out):
                out = {k[len(pre):]: v for k, v in out.items()}
                changed = True
    return out


def convert_torch_s3d(
    sd: Dict[str, np.ndarray],
    with_classifier: bool = False,
) -> Tuple[dict, dict]:
    """Reference S3D state_dict -> (params, batch_stats) for models.s3d.S3D.

    ``sd`` keys are expected in the bare-S3D namespace (``base.N...``,
    ``fc.0....``); run :func:`strip_prefixes` first for wrapped checkpoints.
    Raises KeyError listing what is missing.
    """
    params: dict = {}
    stats: dict = {}
    for ours, (idx, kind) in _S3D_STAGES.items():
        base = f"base.{idx}"
        if kind == "sep":
            p, s = _sep(sd, base)
        elif kind == "basic":
            p, s = _basic(sd, base)
        else:
            p, s = {}, {}
            for bname, (bidx, lidx, bkind) in _MIXED_BRANCHES.items():
                prefix = f"{base}.branch{bidx}.{lidx}"
                bp, bs = (_sep(sd, prefix) if bkind == "sep"
                          else _basic(sd, prefix))
                p[bname], s[bname] = bp, bs
        params[ours] = p
        stats[ours] = s

    if with_classifier and "fc.0.weight" in sd:
        w = np.asarray(sd["fc.0.weight"])         # (num_class, 1024, 1, 1, 1)
        params["fc"] = {"kernel": w.reshape(w.shape[0], w.shape[1]).T}
        if "fc.0.bias" in sd:
            params["fc"]["bias"] = np.asarray(sd["fc.0.bias"])
    return params, stats


def export_s3d_to_torch_names(params: dict, stats: dict) -> Dict[str, np.ndarray]:
    """Inverse mapping: our S3D tree -> reference-named state_dict (numpy),
    for the checkpoint-key compatibility requirement."""
    out: Dict[str, np.ndarray] = {}

    def put_convbn(prefix_conv, prefix_bn, p, s):
        out[prefix_conv + ".weight"] = np.transpose(
            np.asarray(p["conv"]["kernel"]), (4, 3, 0, 1, 2))
        out[prefix_bn + ".weight"] = np.asarray(p["bn"]["scale"])
        out[prefix_bn + ".bias"] = np.asarray(p["bn"]["bias"])
        out[prefix_bn + ".running_mean"] = np.asarray(s["bn"]["mean"])
        out[prefix_bn + ".running_var"] = np.asarray(s["bn"]["var"])

    def put(kind, base, p, s):
        if kind == "sep":
            put_convbn(base + ".conv_s", base + ".bn_s",
                       p["spatial"], s["spatial"])
            put_convbn(base + ".conv_t", base + ".bn_t",
                       p["temporal"], s["temporal"])
        else:
            put_convbn(base + ".conv", base + ".bn", p["block"], s["block"])

    for ours, (idx, kind) in _S3D_STAGES.items():
        base = f"base.{idx}"
        if kind == "mixed":
            for bname, (bidx, lidx, bkind) in _MIXED_BRANCHES.items():
                put(bkind, f"{base}.branch{bidx}.{lidx}",
                    params[ours][bname], stats[ours][bname])
        else:
            put(kind, base, params[ours], stats[ours])

    if "fc" in params:
        k = np.asarray(params["fc"]["kernel"])   # (1024, num_class)
        out["fc.0.weight"] = k.T.reshape(k.shape[1], k.shape[0], 1, 1, 1)
        if "bias" in params["fc"]:
            out["fc.0.bias"] = np.asarray(params["fc"]["bias"])
    return out


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Unpickle a .pth/.pth.tar checkpoint to a flat numpy state_dict
    (handles the reference's {'state_dict': ...} envelope,
    train_video_contrast_dis.py:274-283)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def reference_s3d_shape_manifest(num_classes: Optional[int] = None
                                 ) -> Dict[str, tuple]:
    """Name -> shape manifest of a reference S3D state_dict (for tests and
    for validating foreign checkpoints before conversion)."""
    from ..models.s3d import _MIXED_SPECS

    manifest: Dict[str, tuple] = {}

    def convbn(prefix_conv, prefix_bn, cin, cout, k):
        manifest[prefix_conv + ".weight"] = (cout, cin) + k
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            manifest[f"{prefix_bn}.{suffix}"] = (cout,)

    def sep(base, cin, cout, k):
        convbn(base + ".conv_s", base + ".bn_s", cin, cout, (1, k, k))
        convbn(base + ".conv_t", base + ".bn_t", cout, cout, (k, 1, 1))

    def basic(base, cin, cout, k=1):
        convbn(base + ".conv", base + ".bn", cin, cout, (k, k, k))

    sep("base.0", 3, 64, 7)
    basic("base.2", 64, 64)
    sep("base.3", 64, 192, 3)
    in_ch = {"mixed_3b": 192, "mixed_3c": 256, "mixed_4b": 480,
             "mixed_4c": 512, "mixed_4d": 512, "mixed_4e": 512,
             "mixed_4f": 528, "mixed_5b": 832, "mixed_5c": 832}
    for name, (idx, kind) in _S3D_STAGES.items():
        if kind != "mixed":
            continue
        b0, b1, b2, b3 = _MIXED_SPECS[name]
        cin = in_ch[name]
        base = f"base.{idx}"
        basic(f"{base}.branch0.0", cin, b0)
        basic(f"{base}.branch1.0", cin, b1[0])
        sep(f"{base}.branch1.1", b1[0], b1[1], 3)
        basic(f"{base}.branch2.0", cin, b2[0])
        sep(f"{base}.branch2.1", b2[0], b2[1], 3)
        basic(f"{base}.branch3.1", cin, b3)
    if num_classes:
        manifest["fc.0.weight"] = (num_classes, 1024, 1, 1, 1)
        manifest["fc.0.bias"] = (num_classes,)
    return manifest
