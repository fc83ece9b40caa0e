"""PyTorch/TF <-> JAX checkpoint interoperability (S3D, S3DG, I3D).

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
    stem_s2d: bool = False,
) -> Tuple[dict, dict]:
    """Reference S3D state_dict -> (params, batch_stats) for models.s3d.S3D.

    ``sd`` keys are expected in the bare-S3D namespace (``base.N...``,
    ``fc.0....``); run :func:`strip_prefixes` first for wrapped checkpoints.
    Raises KeyError listing what is missing.  ``stem_s2d=True`` folds the
    stem kernels for ``S3D(stem_s2d=True)`` (exact function equality — see
    layers.fold_stem_kernel_s2d).
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
    if stem_s2d:
        from ..models.s3d import stem_params_to_s2d

        params = stem_params_to_s2d(
            params, mode="spatial" if stem_s2d == "spatial" else "full")
    return params, stats


def export_s3d_to_torch_names(
    params: dict, stats: dict, graph_sub_sample: bool = True,
) -> Dict[str, np.ndarray]:
    """Inverse mapping: our S3D tree -> reference-named state_dict (numpy),
    for the checkpoint-key compatibility requirement.

    ``graph_sub_sample`` mirrors the graph block's GRAPH.SUB_SAMPLE config
    (the reference nests the q/k convs in a Sequential with the pool, which
    shifts torch key names; the pool itself is parameter-free so it cannot
    be inferred from the tree — thread the config, ADVICE r4 item 2)."""
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

    # Graph-aug variant: reproduce the aug-wrapped naming (each wrapped
    # stage becomes Sequential(TemporalGraphAug, stage): graph params at
    # base.{i}.0.*, the stage's at base.{i}.1.* — see split_aug_wrapped_sd).
    aug_idxs = sorted(int(k.rsplit("_", 1)[1]) for k in params
                      if k.startswith("graph_aug_"))
    if aug_idxs:
        wrapped: Dict[str, np.ndarray] = {}
        for k, v in out.items():
            parts = k.split(".")
            if parts[0] == "base" and int_or(parts[1]) in aug_idxs:
                wrapped[".".join(parts[:2] + ["1"] + parts[2:])] = v
            else:
                wrapped[k] = v
        for i in aug_idxs:
            g = export_graph_aug_to_torch(
                params[f"graph_aug_{i}"],
                (stats or {}).get(f"graph_aug_{i}", {}),
                sub_sample=graph_sub_sample)
            for k, v in g.items():
                wrapped[f"base.{i}.0.{k}"] = v
        out = wrapped
    return out


# --------------------------------------------------------------------------- #
# Graph-aug (TemporalGraphAug) wrapped checkpoints.
#
# The reference's intended ``build_aug_block`` (lib/ops/build.py:9-32 — its
# shipped form has latent bugs: the wrap logic sits outside the loop so only
# the last name is processed, and the dotted-name for/else re-getattrs the
# full dotted string, an AttributeError; plus TemporalGraphAug.__init__ calls
# ``self.reset_parameter`` while the method is ``reset_parameters``,
# temporal_graph.py:115/123 vs 129) replaces each named stage M with
# ``Sequential(TemporalGraphAug(in_ch), M)``, so the wrapped stage's torch
# names move to ``<name>.1.*`` and the graph block's live at ``<name>.0.*``.
# --------------------------------------------------------------------------- #

def split_aug_wrapped_sd(
    sd: Dict[str, np.ndarray],
) -> Tuple[Dict[str, np.ndarray], Dict[int, Dict[str, np.ndarray]]]:
    """Aug-wrapped backbone state_dict -> (clean backbone sd, {idx: graph sd}).

    Detects ``base.{i}.0.g_q*`` graph markers, strips the Sequential wrap
    (``base.{i}.1.X`` -> ``base.{i}.X``) and collects each graph block's
    slice keyed by its stage index.  A state_dict without aug wraps passes
    through unchanged.
    """
    aug_idx = set()
    for k in sd:
        parts = k.split(".")
        if (len(parts) > 3 and parts[0] == "base" and parts[2] == "0"
                and parts[3] in ("g_q", "g_k", "gcns")):
            aug_idx.add(int(parts[1]))
    if not aug_idx:
        return dict(sd), {}
    clean: Dict[str, np.ndarray] = {}
    graphs: Dict[int, Dict[str, np.ndarray]] = {i: {} for i in aug_idx}
    for k, v in sd.items():
        parts = k.split(".")
        if len(parts) > 2 and parts[0] == "base" and int_or(parts[1]) in aug_idx:
            idx = int(parts[1])
            if parts[2] == "0":
                graphs[idx][".".join(parts[3:])] = v
                continue
            if parts[2] == "1":
                clean[".".join(parts[:2] + parts[3:])] = v
                continue
        clean[k] = v
    return clean, graphs


def int_or(s: str, default: int = -1) -> int:
    try:
        return int(s)
    except ValueError:
        return default


def _find_graph_conv(gsd: Dict[str, np.ndarray], stem: str) -> str:
    """Locate the q/k Conv3d weight under Sequential nesting (bare
    ``g_q.weight``; ``g_q.0.weight`` with sub_sample; ``g_q.0.0.weight``
    with bn_layer+sub_sample)."""
    for cand in (f"{stem}.weight", f"{stem}.0.weight", f"{stem}.0.0.weight"):
        if cand in gsd and np.asarray(gsd[cand]).ndim == 5:
            return cand[:-len(".weight")]
    raise KeyError(f"no conv weight for '{stem}' in {sorted(gsd)}")


def convert_torch_graph_aug(gsd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """One TemporalGraphAug state_dict slice -> our ops.temporal_graph tree
    (params, batch_stats).  Covers the default geometry (bias/bn optional);
    conv3d 1x1x1 (O, I, 1,1,1) -> Dense kernel (I, O)."""
    params: dict = {}
    stats: dict = {}
    for stem in ("g_q", "g_k"):
        conv = _find_graph_conv(gsd, stem)
        w = np.asarray(gsd[conv + ".weight"])
        params[stem] = {"kernel": w.reshape(w.shape[0], w.shape[1]).T}
        if conv + ".bias" in gsd:
            params[stem]["bias"] = np.asarray(gsd[conv + ".bias"])
        # optional BN right after the conv (bn_layer=True)
        bn = conv[:-1] + "1" if conv.endswith(".0") else None
        if bn and bn + ".running_mean" in gsd:
            params[f"{stem}_bn"] = {"scale": np.asarray(gsd[bn + ".weight"]),
                                    "bias": np.asarray(gsd[bn + ".bias"])}
            stats[f"{stem}_bn"] = {"mean": np.asarray(gsd[bn + ".running_mean"]),
                                   "var": np.asarray(gsd[bn + ".running_var"])}
    i = 0
    while f"gcns.{i}.conv.weight" in gsd:
        w = np.asarray(gsd[f"gcns.{i}.conv.weight"])
        t = {"kernel": w.reshape(w.shape[0], w.shape[1]).T}
        if f"gcns.{i}.conv.bias" in gsd:
            t["bias"] = np.asarray(gsd[f"gcns.{i}.conv.bias"])
        params[f"gcn_{i}"] = {"transform": t}
        i += 1
    if i == 0:
        raise KeyError(f"no GCN conv weights in {sorted(gsd)}")
    return params, stats


def export_graph_aug_to_torch(
    params: dict, stats: dict, sub_sample: bool = True,
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_torch_graph_aug` for one graph block."""
    out: Dict[str, np.ndarray] = {}
    for stem in ("g_q", "g_k"):
        has_bn = f"{stem}_bn" in params
        conv = stem
        if has_bn:
            conv += ".0"
        if sub_sample:
            conv = (f"{stem}.0.0" if has_bn else f"{stem}.0")
        k = np.asarray(params[stem]["kernel"])
        out[conv + ".weight"] = k.T.reshape(k.shape[1], k.shape[0], 1, 1, 1)
        if "bias" in params[stem]:
            out[conv + ".bias"] = np.asarray(params[stem]["bias"])
        if has_bn:
            bn = conv[:-1] + "1"
            out[bn + ".weight"] = np.asarray(params[f"{stem}_bn"]["scale"])
            out[bn + ".bias"] = np.asarray(params[f"{stem}_bn"]["bias"])
            out[bn + ".running_mean"] = np.asarray(stats[f"{stem}_bn"]["mean"])
            out[bn + ".running_var"] = np.asarray(stats[f"{stem}_bn"]["var"])
    i = 0
    while f"gcn_{i}" in params:
        t = params[f"gcn_{i}"]["transform"]
        k = np.asarray(t["kernel"])
        out[f"gcns.{i}.conv.weight"] = k.T.reshape(
            k.shape[1], k.shape[0], 1, 1, 1)
        if "bias" in t:
            out[f"gcns.{i}.conv.bias"] = np.asarray(t["bias"])
        i += 1
    return out


# --------------------------------------------------------------------------- #
# S3DG (reference: S3DG_Pytorch.py) — same topology as S3D with biased
# separable convs ('STConv3d'), ``features.N`` Sequential naming, and
# STConv3d field names conv/bn (spatial) + conv2/bn2 (temporal).
# --------------------------------------------------------------------------- #

def _convbn_sdg(sd, conv_name: str, bn_name: str) -> Tuple[dict, dict]:
    params, stats = _convbn(sd, conv_name, bn_name)
    if conv_name + ".bias" in sd:
        params["conv"]["bias"] = np.asarray(sd[conv_name + ".bias"])
    return params, stats


def _sep_sdg(sd, prefix: str) -> Tuple[dict, dict]:
    sp, ss = _convbn_sdg(sd, prefix + ".conv", prefix + ".bn")
    tp, ts = _convbn_sdg(sd, prefix + ".conv2", prefix + ".bn2")
    return {"spatial": sp, "temporal": tp}, {"spatial": ss, "temporal": ts}


def convert_torch_s3dg(
    sd: Dict[str, np.ndarray],
    with_classifier: bool = False,
) -> Tuple[dict, dict]:
    """Reference S3DG state_dict -> (params, batch_stats) for
    models.s3d.S3D(temporal_bias=True).

    Name map (reference: S3DG_Pytorch.py:310-335): the ``features.N``
    Sequential mirrors S3D's ``base.N`` stage table exactly; STConv3d stores
    its two convs as ``conv``/``bn`` (spatial) + ``conv2``/``bn2``
    (temporal), both biased; BasicConv3d as ``conv``/``bn``; Mixed branches
    ``branchK`` with branch3's conv at index 1 after the MaxPool.
    """
    params: dict = {}
    stats: dict = {}
    for ours, (idx, kind) in _S3D_STAGES.items():
        base = f"features.{idx}"
        if kind == "sep":
            p, s = _sep_sdg(sd, base)
        elif kind == "basic":
            p, s = _convbn_sdg(sd, base + ".conv", base + ".bn")
            p, s = {"block": p}, {"block": s}
        else:
            p, s = {}, {}
            for bname, (bidx, lidx, bkind) in _MIXED_BRANCHES.items():
                prefix = f"{base}.branch{bidx}.{lidx}"
                if bkind == "sep":
                    bp, bs = _sep_sdg(sd, prefix)
                else:
                    bp, bs = _convbn_sdg(sd, prefix + ".conv", prefix + ".bn")
                    bp, bs = {"block": bp}, {"block": bs}
                p[bname], s[bname] = bp, bs
        params[ours] = p
        stats[ours] = s

    # classifier: features.18 = Conv3d(1024, classes, 1, bias=True)
    # (S3DG_Pytorch.py:334)
    if with_classifier and "features.18.weight" in sd:
        w = np.asarray(sd["features.18.weight"])
        params["fc"] = {"kernel": w.reshape(w.shape[0], w.shape[1]).T}
        if "features.18.bias" in sd:
            params["fc"]["bias"] = np.asarray(sd["features.18.bias"])
    return params, stats


def inflate_s3dg_checkpoint(
    init_sd: Dict[str, np.ndarray],
    ckpt_sd: Dict[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    """Reproduce the reference S3DG loader's temporal-collapse rule on
    reference-named numpy dicts (S3DG_Pytorch.py:356-380).

    For every checkpoint tensor that exists in ``init_sd``: 5-D conv
    weights whose spatial kernel is 3 or 7 (``param.size()[3] in [3,7]``)
    write the checkpoint's TEMPORAL MEAN into temporal tap 0 of the init
    weight — the remaining taps keep their initialization (this is how the
    reference seeds S3DG's separable convs from full-3D I3D weights);
    everything else is copied verbatim.  Keys absent from ``init_sd`` are
    skipped (the reference prints a warning and continues).
    """
    out = {k: np.array(v) for k, v in init_sd.items()}
    for name, param in ckpt_sd.items():
        if name not in out:
            continue
        param = np.asarray(param)
        if param.ndim == 5 and param.shape[3] in (3, 7):
            out[name][:, :, 0, :, :] = param.mean(axis=2)
        else:
            out[name] = param.astype(out[name].dtype, copy=False)
    return out


def reference_s3dg_shape_manifest(num_classes: Optional[int] = None
                                  ) -> Dict[str, tuple]:
    """Name -> shape manifest of a reference S3DG state_dict
    (S3DG_Pytorch.py:310-335 ``features.N`` naming; biased convs)."""
    from ..models.s3d import _MIXED_SPECS

    manifest: Dict[str, tuple] = {}

    def convbn(prefix_conv, prefix_bn, cin, cout, k, bias):
        manifest[prefix_conv + ".weight"] = (cout, cin) + k
        if bias:
            manifest[prefix_conv + ".bias"] = (cout,)
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            manifest[f"{prefix_bn}.{suffix}"] = (cout,)

    # STConv3d convs are biased (torch Conv3d default, S3DG_Pytorch.py:23-24);
    # BasicConv3d sets bias=False (:7-8).
    def sep(base, cin, cout, k):
        convbn(base + ".conv", base + ".bn", cin, cout, (1, k, k), True)
        convbn(base + ".conv2", base + ".bn2", cout, cout, (k, 1, 1), True)

    def basic(base, cin, cout, k=1):
        convbn(base + ".conv", base + ".bn", cin, cout, (k, k, k), False)

    sep("features.0", 3, 64, 7)
    basic("features.2", 64, 64)
    sep("features.3", 64, 192, 3)
    in_ch = {"mixed_3b": 192, "mixed_3c": 256, "mixed_4b": 480,
             "mixed_4c": 512, "mixed_4d": 512, "mixed_4e": 512,
             "mixed_4f": 528, "mixed_5b": 832, "mixed_5c": 832}
    for name, (idx, kind) in _S3D_STAGES.items():
        if kind != "mixed":
            continue
        b0, b1, b2, b3 = _MIXED_SPECS[name]
        cin = in_ch[name]
        base = f"features.{idx}"
        basic(f"{base}.branch0.0", cin, b0)
        basic(f"{base}.branch1.0", cin, b1[0])
        sep(f"{base}.branch1.1", b1[0], b1[1], 3)
        basic(f"{base}.branch2.0", cin, b2[0])
        sep(f"{base}.branch2.1", b2[0], b2[1], 3)
        basic(f"{base}.branch3.1", cin, b3)
    if num_classes:
        manifest["features.18.weight"] = (num_classes, 1024, 1, 1, 1)
        manifest["features.18.bias"] = (num_classes,)
    return manifest


# --------------------------------------------------------------------------- #
# I3D (reference: i3dpt.py) — Unit3Dpy modules named conv3d_*/mixed_* with
# fields ``conv3d``/``batch3d``; TF-checkpoint mapping per load_conv3d /
# load_mixed (i3dpt.py:313-423).
# --------------------------------------------------------------------------- #

# our I3D module name -> reference module name
_I3D_UNITS = {
    "conv3d_1a": "conv3d_1a_7x7",
    "conv3d_2b": "conv3d_2b_1x1",
    "conv3d_2c": "conv3d_2c_3x3",
}
_I3D_MIXED = ["mixed_3b", "mixed_3c", "mixed_4b", "mixed_4c", "mixed_4d",
              "mixed_4e", "mixed_4f", "mixed_5b", "mixed_5c"]
# our branch submodule -> reference branch attribute path
_I3D_BRANCHES = {
    "branch0": "branch_0",
    "branch1_reduce": "branch_1.0",
    "branch1": "branch_1.1",
    "branch2_reduce": "branch_2.0",
    "branch2": "branch_2.1",
    "branch3": "branch_3.1",    # index 1: after the branch MaxPool
}


def _unit3d(sd, prefix: str) -> Tuple[dict, dict]:
    """Reference Unit3Dpy (i3dpt.py:38-107): conv3d.weight (+bias),
    batch3d.{weight,bias,running_mean,running_var}."""
    params = {"conv": {"kernel": _conv(sd, prefix + ".conv3d.weight")}}
    if prefix + ".conv3d.bias" in sd:
        params["conv"]["bias"] = np.asarray(sd[prefix + ".conv3d.bias"])
    params["bn"] = {"scale": np.asarray(sd[prefix + ".batch3d.weight"]),
                    "bias": np.asarray(sd[prefix + ".batch3d.bias"])}
    stats = {"bn": {"mean": np.asarray(sd[prefix + ".batch3d.running_mean"]),
                    "var": np.asarray(sd[prefix + ".batch3d.running_var"])}}
    return params, stats


def convert_torch_i3d(
    sd: Dict[str, np.ndarray],
    with_classifier: bool = False,
) -> Tuple[dict, dict]:
    """Reference I3D state_dict (i3dpt.py:161-311 naming) ->
    (params, batch_stats) for models.i3d.I3D."""
    params: dict = {}
    stats: dict = {}
    for ours, ref in _I3D_UNITS.items():
        params[ours], stats[ours] = _unit3d(sd, ref)
    for name in _I3D_MIXED:
        p, s = {}, {}
        for bname, bref in _I3D_BRANCHES.items():
            p[bname], s[bname] = _unit3d(sd, f"{name}.{bref}")
        params[name], stats[name] = p, s

    # classifier: conv3d_0c_1x1 = Unit3Dpy(1024, classes, bias, no BN)
    # (i3dpt.py:241-247); 1x1x1 conv == Dense on pooled features.
    if with_classifier and "conv3d_0c_1x1.conv3d.weight" in sd:
        w = np.asarray(sd["conv3d_0c_1x1.conv3d.weight"])
        params["fc"] = {"kernel": w.reshape(w.shape[0], w.shape[1]).T}
        if "conv3d_0c_1x1.conv3d.bias" in sd:
            params["fc"]["bias"] = np.asarray(sd["conv3d_0c_1x1.conv3d.bias"])
    return params, stats


def tf_i3d_to_torch_sd(
    tf_vars: Dict[str, np.ndarray],
    modality: str = "rgb",
    with_classifier: bool = False,
) -> Dict[str, np.ndarray]:
    """TF DeepMind-I3D checkpoint variables -> reference-named torch-style
    state_dict (the exact dict i3dpt.py's ``load_tf_weights`` builds).

    Faithful port of the reference's TF loader (i3dpt.py:313-423
    load_conv3d/load_mixed/get_conv_params/get_bn_params) without needing
    TensorFlow: ``tf_vars`` maps TF variable names (e.g.
    ``RGB/inception_i3d/Conv3d_1a_7x7/conv_3d/w``) to numpy arrays — the
    dict a one-line TF script exports as .npz.  Reproduces the reference's
    quirks: BN scale fixed to ONES (TF I3D has no gamma; i3dpt.py:389),
    beta/moving stats squeezed, and Mixed_5b's Branch_2 typo'd scope name
    ``Conv3d_0a_3x3`` (``fix_typo=True``, i3dpt.py:295-300).
    """
    prefix = {"rgb": "RGB/inception_i3d", "flow": "Flow/inception_i3d"}[modality]

    sd: Dict[str, np.ndarray] = {}

    def load_conv3d(name_pt, name_tf, bias=False, bn=True):
        w = np.asarray(tf_vars[f"{prefix}/{name_tf}/conv_3d/w"])
        # TF (kt,kh,kw,ci,co) -> torch (co,ci,kt,kh,kw), as the reference
        # stores it; convert_torch_i3d transposes back for flax.
        sd[name_pt + ".conv3d.weight"] = np.transpose(w, (4, 3, 0, 1, 2))
        if bias:
            sd[name_pt + ".conv3d.bias"] = np.asarray(
                tf_vars[f"{prefix}/{name_tf}/conv_3d/b"])
        if bn:
            bnp = f"{prefix}/{name_tf}/batch_norm"
            co = w.shape[4]
            sd[name_pt + ".batch3d.weight"] = np.ones(co, np.float32)
            sd[name_pt + ".batch3d.bias"] = np.asarray(
                tf_vars[f"{bnp}/beta"]).squeeze()
            sd[name_pt + ".batch3d.running_mean"] = np.asarray(
                tf_vars[f"{bnp}/moving_mean"]).squeeze()
            sd[name_pt + ".batch3d.running_var"] = np.asarray(
                tf_vars[f"{bnp}/moving_variance"]).squeeze()

    def load_mixed(name_pt, name_tf, fix_typo=False):
        load_conv3d(name_pt + ".branch_0", f"{name_tf}/Branch_0/Conv3d_0a_1x1")
        load_conv3d(name_pt + ".branch_1.0", f"{name_tf}/Branch_1/Conv3d_0a_1x1")
        load_conv3d(name_pt + ".branch_1.1", f"{name_tf}/Branch_1/Conv3d_0b_3x3")
        load_conv3d(name_pt + ".branch_2.0", f"{name_tf}/Branch_2/Conv3d_0a_1x1")
        load_conv3d(name_pt + ".branch_2.1",
                    f"{name_tf}/Branch_2/"
                    + ("Conv3d_0a_3x3" if fix_typo else "Conv3d_0b_3x3"))
        load_conv3d(name_pt + ".branch_3.1", f"{name_tf}/Branch_3/Conv3d_0b_1x1")

    load_conv3d("conv3d_1a_7x7", "Conv3d_1a_7x7")
    load_conv3d("conv3d_2b_1x1", "Conv3d_2b_1x1")
    load_conv3d("conv3d_2c_3x3", "Conv3d_2c_3x3")
    for name in _I3D_MIXED:
        load_mixed(name, "Mixed_" + name.split("_")[1],
                   fix_typo=(name == "mixed_5b"))
    if with_classifier:
        load_conv3d("conv3d_0c_1x1", "Logits/Conv3d_0c_1x1", bias=True,
                    bn=False)
    return sd


def convert_tf_i3d(
    tf_vars: Dict[str, np.ndarray],
    modality: str = "rgb",
    with_classifier: bool = False,
) -> Tuple[dict, dict]:
    """TF DeepMind-I3D checkpoint variables -> (params, batch_stats) for
    models.i3d.I3D (see :func:`tf_i3d_to_torch_sd`)."""
    sd = tf_i3d_to_torch_sd(tf_vars, modality, with_classifier)
    return convert_torch_i3d(sd, with_classifier=with_classifier)


def reference_i3d_shape_manifest(num_classes: Optional[int] = None,
                                 modality: str = "rgb") -> Dict[str, tuple]:
    """Name -> shape manifest of a reference I3D state_dict
    (i3dpt.py:161-262 module naming; convs unbiased except the classifier)."""
    from ..models.s3d import _MIXED_SPECS

    manifest: Dict[str, tuple] = {}

    def unit(prefix, cin, cout, k):
        manifest[prefix + ".conv3d.weight"] = (cout, cin) + k
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            manifest[f"{prefix}.batch3d.{suffix}"] = (cout,)

    cin0 = {"rgb": 3, "flow": 2}[modality]
    unit("conv3d_1a_7x7", cin0, 64, (7, 7, 7))
    unit("conv3d_2b_1x1", 64, 64, (1, 1, 1))
    unit("conv3d_2c_3x3", 64, 192, (3, 3, 3))
    in_ch = {"mixed_3b": 192, "mixed_3c": 256, "mixed_4b": 480,
             "mixed_4c": 512, "mixed_4d": 512, "mixed_4e": 512,
             "mixed_4f": 528, "mixed_5b": 832, "mixed_5c": 832}
    for name in _I3D_MIXED:
        b0, b1, b2, b3 = _MIXED_SPECS[name]
        cin = in_ch[name]
        unit(f"{name}.branch_0", cin, b0, (1, 1, 1))
        unit(f"{name}.branch_1.0", cin, b1[0], (1, 1, 1))
        unit(f"{name}.branch_1.1", b1[0], b1[1], (3, 3, 3))
        unit(f"{name}.branch_2.0", cin, b2[0], (1, 1, 1))
        unit(f"{name}.branch_2.1", b2[0], b2[1], (3, 3, 3))
        unit(f"{name}.branch_3.1", cin, b3, (1, 1, 1))
    if num_classes:
        manifest["conv3d_0c_1x1.conv3d.weight"] = (num_classes, 1024, 1, 1, 1)
        manifest["conv3d_0c_1x1.conv3d.bias"] = (num_classes,)
    return manifest


def convert_torch_resnet(
    sd: Dict[str, np.ndarray],
    dims: int,
    with_classifier: bool = False,
) -> Tuple[dict, dict]:
    """Reference ResNet state_dict -> (params, batch_stats) for
    models.resnet2d.ResNet2D (``dims=2``, torchvision naming —
    backbone_2d/resnet.py:34-112) or models.resnet3d.ResNet3D (``dims=3``,
    backbone_3d/resnet.py:41-108).

    Depth/block-type is inferred from the keys (``layerS.B.convI``), so one
    function covers resnet10..200, basic and bottleneck. Only shortcut
    type B (conv ``downsample.0``/``downsample.1``) carries weights; the 3D
    family's type-A (parameter-free pad) checkpoints convert with their
    block convs only and will fail the template graft where our model has a
    ``ds_conv`` — by design, since type A has no equivalent here."""
    perm = (2, 3, 1, 0) if dims == 2 else (2, 3, 4, 1, 0)

    def convw(name):
        return {"kernel": np.transpose(np.asarray(sd[name + ".weight"]), perm)}

    def bn(name):
        p = {"bn": {"scale": np.asarray(sd[name + ".weight"]),
                    "bias": np.asarray(sd[name + ".bias"])}}
        s = {"bn": {"mean": np.asarray(sd[name + ".running_mean"]),
                    "var": np.asarray(sd[name + ".running_var"])}}
        return p, s

    params: dict = {"conv1": convw("conv1")}
    stats: dict = {}
    params["bn1"], stats["bn1"] = bn("bn1")
    for s in (1, 2, 3, 4):
        b = 0
        while f"layer{s}.{b}.conv1.weight" in sd:
            prefix = f"layer{s}.{b}"
            bp: dict = {}
            bs: dict = {}
            i = 1
            while f"{prefix}.conv{i}.weight" in sd:
                bp[f"conv{i}"] = convw(f"{prefix}.conv{i}")
                bp[f"bn{i}"], bs[f"bn{i}"] = bn(f"{prefix}.bn{i}")
                i += 1
            if f"{prefix}.downsample.0.weight" in sd:
                bp["ds_conv"] = convw(f"{prefix}.downsample.0")
                bp["ds_bn"], bs["ds_bn"] = bn(f"{prefix}.downsample.1")
            params[f"layer{s}_{b}"], stats[f"layer{s}_{b}"] = bp, bs
            b += 1
        if b == 0:
            raise KeyError(f"no blocks found under 'layer{s}.' — "
                           "not a ResNet state_dict?")
    if with_classifier and "fc.weight" in sd:
        params["fc"] = {"kernel": np.asarray(sd["fc.weight"]).T}
        if "fc.bias" in sd:
            params["fc"]["bias"] = np.asarray(sd["fc.bias"])
    return params, stats


_RESNET_LAYERS = {
    10: ("basic", (1, 1, 1, 1)),
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
    200: ("bottleneck", (3, 24, 36, 3)),
}


def reference_resnet_shape_manifest(
    depth: int, dims: int, num_classes: Optional[int] = None,
) -> Dict[str, tuple]:
    """Name -> shape manifest of a reference ResNet state_dict
    (backbone_2d/resnet.py torchvision naming / backbone_3d/resnet.py,
    shortcut type B)."""
    block, layers = _RESNET_LAYERS[depth]
    exp = 4 if block == "bottleneck" else 1
    manifest: Dict[str, tuple] = {}

    def conv(name, cout, cin, k):
        manifest[name + ".weight"] = (cout, cin) + (k,) * dims

    def bn(name, c):
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            manifest[f"{name}.{suffix}"] = (c,)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    in_ch = 64
    for s, (planes, n) in enumerate(zip((64, 128, 256, 512), layers), 1):
        for b in range(n):
            p = f"layer{s}.{b}"
            if block == "basic":
                conv(f"{p}.conv1", planes, in_ch, 3)
                bn(f"{p}.bn1", planes)
                conv(f"{p}.conv2", planes, planes, 3)
                bn(f"{p}.bn2", planes)
            else:
                conv(f"{p}.conv1", planes, in_ch, 1)
                bn(f"{p}.bn1", planes)
                conv(f"{p}.conv2", planes, planes, 3)
                bn(f"{p}.bn2", planes)
                conv(f"{p}.conv3", planes * 4, planes, 1)
                bn(f"{p}.bn3", planes * 4)
            stride = 2 if (b == 0 and s > 1) else 1
            if stride != 1 or in_ch != planes * exp:
                conv(f"{p}.downsample.0", planes * exp, in_ch, 1)
                bn(f"{p}.downsample.1", planes * exp)
            in_ch = planes * exp
    if num_classes:
        manifest["fc.weight"] = (num_classes, 512 * exp)
        manifest["fc.bias"] = (num_classes,)
    return manifest


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


# --------------------------------------------------------------------------- #
# BN-Inception (2D) — reference backbone_2d/bninception.py:22-266
# --------------------------------------------------------------------------- #
# ours-module-name -> torch attribute suffix inside each inception block
_BNINC_REGULAR = {
    "branch1": "branch1",
    "branch2_reduce": "branch2.0",
    "branch2": "branch2.1",
    "branch3_reduce": "branch3.0",
    "branch3_mid": "branch3.1",
    "branch3": "branch3.2",
    "branch4": "branch4.1",
}
_BNINC_REDUCE = {
    "branch1_reduce": "branch1.0",
    "branch1": "branch1.1",
    "branch2_reduce": "branch2.0",
    "branch2_mid": "branch2.1",
    "branch2": "branch2.2",
}


def _convbn2d_fold_bias(sd, prefix: str) -> Tuple[dict, dict]:
    """Reference BasicConv2d ``prefix``.{conv,bn} -> our {conv, bn}.

    The reference conv carries ``bias=True`` (bninception.py:13) feeding
    straight into BatchNorm, where a constant shift is mathematically
    inert in train mode (batch centering removes it) and only offsets the
    tracked running mean.  Our conv is biasless, so the bias FOLDS exactly:
    ``mean_ours = running_mean - bias`` (variance unchanged) — eval
    outputs are bit-identical."""
    w = np.transpose(np.asarray(sd[prefix + ".conv.weight"]), (2, 3, 1, 0))
    bias = np.asarray(sd.get(prefix + ".conv.bias",
                             np.zeros(w.shape[-1], np.float32)))
    params = {
        "conv": {"kernel": w},
        "bn": {"scale": np.asarray(sd[prefix + ".bn.weight"]),
               "bias": np.asarray(sd[prefix + ".bn.bias"])},
    }
    stats = {"bn": {"mean": np.asarray(sd[prefix + ".bn.running_mean"])
                    - bias,
                    "var": np.asarray(sd[prefix + ".bn.running_var"])}}
    return params, stats


def convert_torch_bninception(
    sd: Dict[str, np.ndarray],
    with_classifier: bool = False,
) -> Tuple[dict, dict]:
    """Reference BNInception state_dict -> (params, batch_stats) for
    models.bninception.BNInception (naming: bninception.py:27-49 ->
    models/bninception.py _NAMES/_PLAN)."""
    from ..models.bninception import _NAMES, _PLAN

    params: dict = {}
    stats: dict = {}
    for stem in ("conv1", "conv2", "conv3"):
        params[stem], stats[stem] = _convbn2d_fold_bias(sd, stem)
    for name, (kind, _spec) in zip(_NAMES, _PLAN):
        table = _BNINC_REGULAR if kind == "i" else _BNINC_REDUCE
        bp: dict = {}
        bs: dict = {}
        for ours, suffix in table.items():
            bp[ours], bs[ours] = _convbn2d_fold_bias(sd, f"{name}.{suffix}")
        params[name], stats[name] = bp, bs
    if with_classifier and "fc.weight" in sd:
        params["fc"] = {"kernel": np.asarray(sd["fc.weight"]).T,
                        "bias": np.asarray(sd["fc.bias"])}
    return params, stats


def reference_bninception_shape_manifest(num_classes: Optional[int] = None
                                         ) -> Dict[str, tuple]:
    """Name -> shape manifest of a reference BNInception state_dict
    (channel plan: bninception.py:28-46)."""
    from ..models.bninception import _NAMES, _PLAN

    manifest: Dict[str, tuple] = {}

    def convbn(base, cin, cout, k):
        manifest[base + ".conv.weight"] = (cout, cin, k, k)
        manifest[base + ".conv.bias"] = (cout,)
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            manifest[f"{base}.bn.{suffix}"] = (cout,)

    convbn("conv1", 3, 64, 7)
    convbn("conv2", 64, 64, 1)
    convbn("conv3", 64, 192, 3)
    in_ch = 192
    for name, (kind, spec) in zip(_NAMES, _PLAN):
        if kind == "i":
            c1, c3r, c3, cdr, cdm, cdb, cp, _pool = spec
            convbn(f"{name}.branch1", in_ch, c1, 1)
            convbn(f"{name}.branch2.0", in_ch, c3r, 1)
            convbn(f"{name}.branch2.1", c3r, c3, 3)
            convbn(f"{name}.branch3.0", in_ch, cdr, 1)
            convbn(f"{name}.branch3.1", cdr, cdm, 3)
            convbn(f"{name}.branch3.2", cdm, cdb, 3)
            convbn(f"{name}.branch4.1", in_ch, cp, 1)
            in_ch = c1 + c3 + cdb + cp
        else:
            c3r, c3, cdr, cdm, cdb = spec
            convbn(f"{name}.branch1.0", in_ch, c3r, 1)
            convbn(f"{name}.branch1.1", c3r, c3, 3)
            convbn(f"{name}.branch2.0", in_ch, cdr, 1)
            convbn(f"{name}.branch2.1", cdr, cdm, 3)
            convbn(f"{name}.branch2.2", cdm, cdb, 3)
            in_ch = c3 + cdb + in_ch
    if num_classes:
        manifest["fc.weight"] = (num_classes, in_ch)
        manifest["fc.bias"] = (num_classes,)
    return manifest


# --------------------------------------------------------------------------- #
# Inception-v3 (2D) — reference backbone_2d/inceptionv3.py:51-352
# --------------------------------------------------------------------------- #
# NB the reference's InceptionC/D/E kernel ORIENTATIONS are swapped vs
# torchvision (e.g. branch7x7_2 is (7,1) not (1,7), inceptionv3.py:213-222);
# models/inceptionv3.py follows the reference exactly, so the converter is a
# pure rename + transpose.
_INC3_STEMS = {
    "conv1a": "Conv2d_1a_3x3",
    "conv2a": "Conv2d_2a_3x3",
    "conv2b": "Conv2d_2b_3x3",
    "conv3b": "Conv2d_3b_1x1",
    "conv4a": "Conv2d_4a_3x3",
}
_INC3_BRANCHES = {
    "A": {"b1x1": "branch1x1", "b5_1": "branch5x5_1", "b5_2": "branch5x5_2",
          "b3_1": "branch3x3dbl_1", "b3_2": "branch3x3dbl_2",
          "b3_3": "branch3x3dbl_3", "bpool": "branch_pool"},
    "B": {"b3": "branch3x3", "bd_1": "branch3x3dbl_1",
          "bd_2": "branch3x3dbl_2", "bd_3": "branch3x3dbl_3"},
    "C": {"b1x1": "branch1x1", "b7_1": "branch7x7_1", "b7_2": "branch7x7_2",
          "b7_3": "branch7x7_3", "bd_1": "branch7x7dbl_1",
          "bd_2": "branch7x7dbl_2", "bd_3": "branch7x7dbl_3",
          "bd_4": "branch7x7dbl_4", "bd_5": "branch7x7dbl_5",
          "bpool": "branch_pool"},
    "D": {"b3_1": "branch3x3_1", "b3_2": "branch3x3_2",
          "b7_1": "branch7x7x3_1", "b7_2": "branch7x7x3_2",
          "b7_3": "branch7x7x3_3", "b7_4": "branch7x7x3_4"},
    "E": {"b1x1": "branch1x1", "b3_1": "branch3x3_1", "b3_2a": "branch3x3_2a",
          "b3_2b": "branch3x3_2b", "bd_1": "branch3x3dbl_1",
          "bd_2": "branch3x3dbl_2", "bd_3a": "branch3x3dbl_3a",
          "bd_3b": "branch3x3dbl_3b", "bpool": "branch_pool"},
}
# ours block name -> (family, torch module name)
_INC3_BLOCKS = (
    ("mixed_5b", "A", "Mixed_5b"), ("mixed_5c", "A", "Mixed_5c"),
    ("mixed_5d", "A", "Mixed_5d"), ("mixed_6a", "B", "Mixed_6a"),
    ("mixed_6b", "C", "Mixed_6b"), ("mixed_6c", "C", "Mixed_6c"),
    ("mixed_6d", "C", "Mixed_6d"), ("mixed_6e", "C", "Mixed_6e"),
    ("mixed_7a", "D", "Mixed_7a"), ("mixed_7b", "E", "Mixed_7b"),
    ("mixed_7c", "E", "Mixed_7c"),
)


def convert_torch_inception_v3(
    sd: Dict[str, np.ndarray],
    with_classifier: bool = False,
) -> Tuple[dict, dict]:
    """Reference Inception3 state_dict -> (params, batch_stats) for
    models.inceptionv3.InceptionV3."""
    params: dict = {}
    stats: dict = {}
    for ours, theirs in _INC3_STEMS.items():
        params[ours], stats[ours] = _convbn2d_fold_bias(sd, theirs)
    for ours_blk, family, theirs_blk in _INC3_BLOCKS:
        bp: dict = {}
        bs: dict = {}
        for ours, theirs in _INC3_BRANCHES[family].items():
            bp[ours], bs[ours] = _convbn2d_fold_bias(
                sd, f"{theirs_blk}.{theirs}")
        params[ours_blk], stats[ours_blk] = bp, bs
    if with_classifier and "fc.weight" in sd:
        params["fc"] = {"kernel": np.asarray(sd["fc.weight"]).T,
                        "bias": np.asarray(sd["fc.bias"])}
    return params, stats


def reference_inception_v3_shape_manifest(num_classes: Optional[int] = None
                                          ) -> Dict[str, tuple]:
    """Name -> shape manifest of a reference Inception3 state_dict
    (channel plan + the reference's swapped orientations,
    inceptionv3.py:57-76,152-340)."""
    manifest: Dict[str, tuple] = {}

    def convbn(base, cout, cin, kh, kw_):
        manifest[base + ".conv.weight"] = (cout, cin, kh, kw_)
        manifest[base + ".conv.bias"] = (cout,)
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            manifest[f"{base}.bn.{suffix}"] = (cout,)

    convbn("Conv2d_1a_3x3", 32, 3, 3, 3)
    convbn("Conv2d_2a_3x3", 32, 32, 3, 3)
    convbn("Conv2d_2b_3x3", 64, 32, 3, 3)
    convbn("Conv2d_3b_1x1", 80, 64, 1, 1)
    convbn("Conv2d_4a_3x3", 192, 80, 3, 3)
    a_specs = {"Mixed_5b": (192, 32), "Mixed_5c": (256, 64),
               "Mixed_5d": (288, 64)}
    for blk, (cin, pf) in a_specs.items():
        convbn(f"{blk}.branch1x1", 64, cin, 1, 1)
        convbn(f"{blk}.branch5x5_1", 48, cin, 1, 1)
        convbn(f"{blk}.branch5x5_2", 64, 48, 5, 5)
        convbn(f"{blk}.branch3x3dbl_1", 64, cin, 1, 1)
        convbn(f"{blk}.branch3x3dbl_2", 96, 64, 3, 3)
        convbn(f"{blk}.branch3x3dbl_3", 96, 96, 3, 3)
        convbn(f"{blk}.branch_pool", pf, cin, 1, 1)
    convbn("Mixed_6a.branch3x3", 384, 288, 3, 3)
    convbn("Mixed_6a.branch3x3dbl_1", 64, 288, 1, 1)
    convbn("Mixed_6a.branch3x3dbl_2", 96, 64, 3, 3)
    convbn("Mixed_6a.branch3x3dbl_3", 96, 96, 3, 3)
    for blk, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160),
                    ("Mixed_6d", 160), ("Mixed_6e", 192)):
        convbn(f"{blk}.branch1x1", 192, 768, 1, 1)
        convbn(f"{blk}.branch7x7_1", c7, 768, 1, 1)
        convbn(f"{blk}.branch7x7_2", c7, c7, 7, 1)
        convbn(f"{blk}.branch7x7_3", 192, c7, 1, 7)
        convbn(f"{blk}.branch7x7dbl_1", c7, 768, 1, 1)
        convbn(f"{blk}.branch7x7dbl_2", c7, c7, 1, 7)
        convbn(f"{blk}.branch7x7dbl_3", c7, c7, 7, 1)
        convbn(f"{blk}.branch7x7dbl_4", c7, c7, 1, 7)
        convbn(f"{blk}.branch7x7dbl_5", 192, c7, 7, 1)
        convbn(f"{blk}.branch_pool", 192, 768, 1, 1)
    convbn("Mixed_7a.branch3x3_1", 192, 768, 1, 1)
    convbn("Mixed_7a.branch3x3_2", 320, 192, 3, 3)
    convbn("Mixed_7a.branch7x7x3_1", 192, 768, 1, 1)
    convbn("Mixed_7a.branch7x7x3_2", 192, 192, 7, 1)
    convbn("Mixed_7a.branch7x7x3_3", 192, 192, 1, 7)
    convbn("Mixed_7a.branch7x7x3_4", 192, 192, 3, 3)
    for blk, cin in (("Mixed_7b", 1280), ("Mixed_7c", 2048)):
        convbn(f"{blk}.branch1x1", 320, cin, 1, 1)
        convbn(f"{blk}.branch3x3_1", 384, cin, 1, 1)
        convbn(f"{blk}.branch3x3_2a", 384, 384, 3, 1)
        convbn(f"{blk}.branch3x3_2b", 384, 384, 1, 3)
        convbn(f"{blk}.branch3x3dbl_1", 448, cin, 1, 1)
        convbn(f"{blk}.branch3x3dbl_2", 384, 448, 3, 3)
        convbn(f"{blk}.branch3x3dbl_3a", 384, 384, 3, 1)
        convbn(f"{blk}.branch3x3dbl_3b", 384, 384, 1, 3)
        convbn(f"{blk}.branch_pool", 192, cin, 1, 1)
    if num_classes:
        manifest["fc.weight"] = (num_classes, 2048)
        manifest["fc.bias"] = (num_classes,)
    return manifest


# --------------------------------------------------------------------------- #
# R(2+1)D — reference backbone_3d/resnet2p1d.py:139-285
# --------------------------------------------------------------------------- #
def convert_torch_resnet2p1d(
    sd: Dict[str, np.ndarray],
    with_classifier: bool = False,
) -> Tuple[dict, dict]:
    """Reference R(2+1)D state_dict -> (params, batch_stats) for
    models.resnet2p1d.ResNet2Plus1D.  Block type is inferred from the keys
    (bottleneck iff ``layer1.0.conv3`` exists); the factorized pairs map
    conv{i}_s/bn{i}_s/conv{i}_t into our Conv2Plus1D(spatial, bn_s,
    temporal) with bn{i}_t as the block-level bn{i}."""
    perm = (2, 3, 4, 1, 0)

    def convw(name):
        return {"kernel": np.transpose(np.asarray(sd[name + ".weight"]),
                                       perm)}

    def bn(name):
        p = {"bn": {"scale": np.asarray(sd[name + ".weight"]),
                    "bias": np.asarray(sd[name + ".bias"])}}
        s = {"bn": {"mean": np.asarray(sd[name + ".running_mean"]),
                    "var": np.asarray(sd[name + ".running_var"])}}
        return p, s

    def pair(prefix, i):
        """conv{i}_s / bn{i}_s / conv{i}_t -> Conv2Plus1D subtree."""
        bs_p, bs_s = bn(f"{prefix}.bn{i}_s")
        p = {"spatial": convw(f"{prefix}.conv{i}_s"),
             "bn_s": bs_p,
             "temporal": convw(f"{prefix}.conv{i}_t")}
        s = {"bn_s": bs_s}
        return p, s

    params: dict = {"stem_s": convw("conv1_s"), "stem_t": convw("conv1_t")}
    stats: dict = {}
    params["stem_bn_s"], stats["stem_bn_s"] = bn("bn1_s")
    params["stem_bn_t"], stats["stem_bn_t"] = bn("bn1_t")
    bottleneck = "layer1.0.conv3.weight" in sd
    for st in (1, 2, 3, 4):
        b = 0
        while (f"layer{st}.{b}.conv1_s.weight" in sd
               or f"layer{st}.{b}.conv1.weight" in sd):
            prefix = f"layer{st}.{b}"
            bp: dict = {}
            bs: dict = {}
            if bottleneck:
                bp["conv1"] = convw(f"{prefix}.conv1")
                bp["bn1"], bs["bn1"] = bn(f"{prefix}.bn1")
                bp["conv2"], bs["conv2"] = pair(prefix, 2)
                bp["bn2"], bs["bn2"] = bn(f"{prefix}.bn2_t")
                bp["conv3"] = convw(f"{prefix}.conv3")
                bp["bn3"], bs["bn3"] = bn(f"{prefix}.bn3")
            else:
                bp["conv1"], bs["conv1"] = pair(prefix, 1)
                bp["bn1"], bs["bn1"] = bn(f"{prefix}.bn1_t")
                bp["conv2"], bs["conv2"] = pair(prefix, 2)
                bp["bn2"], bs["bn2"] = bn(f"{prefix}.bn2_t")
            if f"{prefix}.downsample.0.weight" in sd:
                bp["ds_conv"] = convw(f"{prefix}.downsample.0")
                bp["ds_bn"], bs["ds_bn"] = bn(f"{prefix}.downsample.1")
            params[f"layer{st}_{b}"], stats[f"layer{st}_{b}"] = bp, bs
            b += 1
        if b == 0:
            raise KeyError(f"no blocks under 'layer{st}.' — not an "
                           "R(2+1)D state_dict?")
    if with_classifier and "fc.weight" in sd:
        params["fc"] = {"kernel": np.asarray(sd["fc.weight"]).T,
                        "bias": np.asarray(sd["fc.bias"])}
    return params, stats


def reference_resnet2p1d_shape_manifest(
        depth: int, num_classes: Optional[int] = None) -> Dict[str, tuple]:
    """Name -> shape manifest of a reference R(2+1)D state_dict
    (resnet2p1d.py:139-285; parameter-matched mid widths :44-57,100-104)."""
    from ..models.resnet2p1d import _mid

    block_name, layers = _RESNET_LAYERS[depth]
    exp = 1 if block_name == "basic" else 4
    manifest: Dict[str, tuple] = {}

    def conv(name, cout, cin, k):
        manifest[name + ".weight"] = (cout, cin) + k

    def bn(name, c):
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            manifest[f"{name}.{suffix}"] = (c,)

    stem_mid = _mid(3, 64, 7, 7)
    conv("conv1_s", stem_mid, 3, (1, 7, 7))
    bn("bn1_s", stem_mid)
    conv("conv1_t", 64, stem_mid, (7, 1, 1))
    bn("bn1_t", 64)
    in_ch = 64
    for st, (planes, n) in enumerate(zip((64, 128, 256, 512), layers), 1):
        for b in range(n):
            p = f"layer{st}.{b}"
            if block_name == "basic":
                m1 = _mid(in_ch, planes)
                conv(f"{p}.conv1_s", m1, in_ch, (1, 3, 3))
                bn(f"{p}.bn1_s", m1)
                conv(f"{p}.conv1_t", planes, m1, (3, 1, 1))
                bn(f"{p}.bn1_t", planes)
                m2 = _mid(planes, planes)
                conv(f"{p}.conv2_s", m2, planes, (1, 3, 3))
                bn(f"{p}.bn2_s", m2)
                conv(f"{p}.conv2_t", planes, m2, (3, 1, 1))
                bn(f"{p}.bn2_t", planes)
            else:
                conv(f"{p}.conv1", planes, in_ch, (1, 1, 1))
                bn(f"{p}.bn1", planes)
                m2 = _mid(planes, planes)
                conv(f"{p}.conv2_s", m2, planes, (1, 3, 3))
                bn(f"{p}.bn2_s", m2)
                conv(f"{p}.conv2_t", planes, m2, (3, 1, 1))
                bn(f"{p}.bn2_t", planes)
                conv(f"{p}.conv3", planes * 4, planes, (1, 1, 1))
                bn(f"{p}.bn3", planes * 4)
            stride = 2 if (b == 0 and st > 1) else 1
            if b == 0 and (stride != 1 or in_ch != planes * exp):
                conv(f"{p}.downsample.0", planes * exp, in_ch, (1, 1, 1))
                bn(f"{p}.downsample.1", planes * exp)
            in_ch = planes * exp
    if num_classes:
        manifest["fc.weight"] = (num_classes, 512 * exp)
        manifest["fc.bias"] = (num_classes,)
    return manifest


# --------------------------------------------------------------------------- #
# Factorized resnet_i3d — reference backbone_3d/resnet_i3d.py:141-249
# --------------------------------------------------------------------------- #
def convert_torch_resnet_i3d(
    sd: Dict[str, np.ndarray],
    with_classifier: bool = False,
) -> Tuple[dict, dict]:
    """Reference factorized-ResNet3D state_dict -> (params, batch_stats)
    for models.resnet3d.ResNet3D(block='fbasic'/'fbottleneck').

    fbasic (conv{i}_1/bn{i}_1 spatial + conv{i}_2/bn{i}_2 temporal,
    resnet_i3d.py:56-97) converts with exact eval fidelity.  fbottleneck
    weights also map cleanly (BasicSTConv3d's conv2.conv1/conv2.conv2 +
    the outer conv3 whose BN the reference misnames ``bn2``,
    :99-138) — but our block FIXES the reference's pre-residual-add ReLU
    (it applies relu(bn2(conv3)) BEFORE the add, killing the identity
    path's negative values), so converted fbottleneck activations
    deviate at exactly that documented bugfix site."""
    perm = (2, 3, 4, 1, 0)

    def convw(name):
        return {"kernel": np.transpose(np.asarray(sd[name + ".weight"]),
                                       perm)}

    def bn(name):
        p = {"bn": {"scale": np.asarray(sd[name + ".weight"]),
                    "bias": np.asarray(sd[name + ".bias"])}}
        s = {"bn": {"mean": np.asarray(sd[name + ".running_mean"]),
                    "var": np.asarray(sd[name + ".running_var"])}}
        return p, s

    params: dict = {"conv1": convw("conv1")}
    stats: dict = {}
    params["bn1"], stats["bn1"] = bn("bn1")
    bottleneck = "layer1.0.conv3.weight" in sd
    for st in (1, 2, 3, 4):
        b = 0
        while (f"layer{st}.{b}.conv1_1.weight" in sd
               or f"layer{st}.{b}.conv1.weight" in sd):
            prefix = f"layer{st}.{b}"
            bp: dict = {}
            bs: dict = {}
            if bottleneck:
                bp["conv1"] = convw(f"{prefix}.conv1")
                bp["bn1"], bs["bn1"] = bn(f"{prefix}.bn1")
                bp["conv2_s"] = convw(f"{prefix}.conv2.conv1")
                bp["bn2_s"], bs["bn2_s"] = bn(f"{prefix}.conv2.bn1")
                bp["conv2_t"] = convw(f"{prefix}.conv2.conv2")
                bp["bn2_t"], bs["bn2_t"] = bn(f"{prefix}.conv2.bn2")
                bp["conv3"] = convw(f"{prefix}.conv3")
                bp["bn3"], bs["bn3"] = bn(f"{prefix}.bn2")
            else:
                for i in (1, 2):
                    bp[f"conv{i}_s"] = convw(f"{prefix}.conv{i}_1")
                    bp[f"conv{i}_s_bn"], bs[f"conv{i}_s_bn"] = \
                        bn(f"{prefix}.bn{i}_1")
                    bp[f"conv{i}_t"] = convw(f"{prefix}.conv{i}_2")
                    bp[f"conv{i}_t_bn"], bs[f"conv{i}_t_bn"] = \
                        bn(f"{prefix}.bn{i}_2")
            if f"{prefix}.downsample.0.weight" in sd:
                bp["ds_conv"] = convw(f"{prefix}.downsample.0")
                bp["ds_bn"], bs["ds_bn"] = bn(f"{prefix}.downsample.1")
            params[f"layer{st}_{b}"], stats[f"layer{st}_{b}"] = bp, bs
            b += 1
        if b == 0:
            raise KeyError(f"no blocks under 'layer{st}.' — not a "
                           "resnet_i3d state_dict?")
    if with_classifier and "fc.weight" in sd:
        params["fc"] = {"kernel": np.asarray(sd["fc.weight"]).T,
                        "bias": np.asarray(sd["fc.bias"])}
    return params, stats


def reference_resnet_i3d_shape_manifest(
        depth: int, num_classes: Optional[int] = None) -> Dict[str, tuple]:
    """Name -> shape manifest of a reference resnet_i3d state_dict
    (resnet_i3d.py:141-249)."""
    block_name, layers = _RESNET_LAYERS[depth]
    exp = 1 if block_name == "basic" else 4
    manifest: Dict[str, tuple] = {}

    def conv(name, cout, cin, k):
        manifest[name + ".weight"] = (cout, cin) + k

    def bn(name, c):
        for suffix in ("weight", "bias", "running_mean", "running_var"):
            manifest[f"{name}.{suffix}"] = (c,)

    conv("conv1", 64, 3, (7, 7, 7))
    bn("bn1", 64)
    in_ch = 64
    for st, (planes, n) in enumerate(zip((64, 128, 256, 512), layers), 1):
        for b in range(n):
            p = f"layer{st}.{b}"
            if block_name == "basic":
                for i in (1, 2):
                    cin = in_ch if i == 1 else planes
                    conv(f"{p}.conv{i}_1", planes, cin, (1, 3, 3))
                    bn(f"{p}.bn{i}_1", planes)
                    conv(f"{p}.conv{i}_2", planes, planes, (3, 1, 1))
                    bn(f"{p}.bn{i}_2", planes)
            else:
                conv(f"{p}.conv1", planes, in_ch, (1, 1, 1))
                bn(f"{p}.bn1", planes)
                conv(f"{p}.conv2.conv1", planes, planes, (1, 3, 3))
                bn(f"{p}.conv2.bn1", planes)
                conv(f"{p}.conv2.conv2", planes, planes, (3, 1, 1))
                bn(f"{p}.conv2.bn2", planes)
                conv(f"{p}.conv3", planes * 4, planes, (1, 1, 1))
                bn(f"{p}.bn2", planes * 4)
            stride = 2 if (b == 0 and st > 1) else 1
            if b == 0 and (stride != 1 or in_ch != planes * exp):
                conv(f"{p}.downsample.0", planes * exp, in_ch, (1, 1, 1))
                bn(f"{p}.downsample.1", planes * exp)
            in_ch = planes * exp
    if num_classes:
        manifest["fc.weight"] = (num_classes, 512 * exp)
        manifest["fc.bias"] = (num_classes,)
    return manifest


# --------------------------------------------------------------------------- #
# Text-video S3D-G (MIL-NCE naming) — reference backbone_3d/s3dg.py:238-331
# --------------------------------------------------------------------------- #
def _stconv_text(sd, prefix: str, separable: bool) -> Tuple[dict, dict]:
    """Reference STConv3D (s3dg.py:91-150) -> our s3dg_text.STConv tree
    (child names conv1/bn1[/conv2/bn2] mirror the torch fields)."""
    p: dict = {"conv1": {"kernel": _conv(sd, prefix + ".conv1.weight")}}
    s: dict = {}
    p["bn1"] = {"scale": np.asarray(sd[prefix + ".bn1.weight"]),
                "bias": np.asarray(sd[prefix + ".bn1.bias"])}
    s["bn1"] = {"mean": np.asarray(sd[prefix + ".bn1.running_mean"]),
                "var": np.asarray(sd[prefix + ".bn1.running_var"])}
    if separable:
        p["conv2"] = {"kernel": _conv(sd, prefix + ".conv2.weight")}
        p["bn2"] = {"scale": np.asarray(sd[prefix + ".bn2.weight"]),
                    "bias": np.asarray(sd[prefix + ".bn2.bias"])}
        s["bn2"] = {"mean": np.asarray(sd[prefix + ".bn2.running_mean"]),
                    "var": np.asarray(sd[prefix + ".bn2.running_var"])}
    return p, s


def _gating_fc(sd, prefix: str) -> dict:
    return {"fc": {"kernel": np.asarray(sd[prefix + ".fc.weight"]).T,
                   "bias": np.asarray(sd[prefix + ".fc.bias"])}}


_S3DG_TEXT_MIXED = ("mixed_3b", "mixed_3c", "mixed_4b", "mixed_4c",
                    "mixed_4d", "mixed_4e", "mixed_4f", "mixed_5b",
                    "mixed_5c")


def convert_torch_s3dg_text(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """Reference text-video S3D state_dict (the MIL-NCE naming — the
    public ``s3d_howto100m.pth`` checkpoint uses exactly these keys) ->
    (params, batch_stats) for models.s3dg_text.S3DGText.

    Handles both stem variants (space_to_depth (2,4,4) 24-channel and the
    standard (3,7,7) 3-channel — distinguished by conv1 kernel shape) and
    converts the text tower (word_embd/fc1/fc2)."""
    enc_p: dict = {}
    enc_s: dict = {}
    enc_p["conv1"], enc_s["conv1"] = _stconv_text(sd, "conv1", False)
    enc_p["conv_2b"], enc_s["conv_2b"] = _stconv_text(sd, "conv_2b", False)
    enc_p["conv_2c"], enc_s["conv_2c"] = _stconv_text(sd, "conv_2c", True)
    if "gating.fc.weight" in sd:
        enc_p["gating"] = _gating_fc(sd, "gating")
    for blk in _S3DG_TEXT_MIXED:
        bp: dict = {}
        bs: dict = {}
        for branch, sep in (("conv_b0", False), ("conv_b1_a", False),
                            ("conv_b1_b", True), ("conv_b2_a", False),
                            ("conv_b2_b", True), ("conv_b3_b", False)):
            bp[branch], bs[branch] = _stconv_text(sd, f"{blk}.{branch}", sep)
        for g in ("gating_b0", "gating_b1", "gating_b2", "gating_b3"):
            if f"{blk}.{g}.fc.weight" in sd:
                bp[g] = _gating_fc(sd, f"{blk}.{g}")
        enc_p[blk], enc_s[blk] = bp, bs
    enc_p["fc"] = {"kernel": np.asarray(sd["fc.weight"]).T,
                   "bias": np.asarray(sd["fc.bias"])}
    params = {"encode_video": enc_p}
    stats = {"encode_video": enc_s}
    if "text_module.word_embd.weight" in sd:
        params["text_module"] = {
            "word_embd": {"embedding":
                          np.asarray(sd["text_module.word_embd.weight"])},
            "fc1": {"kernel": np.asarray(sd["text_module.fc1.weight"]).T,
                    "bias": np.asarray(sd["text_module.fc1.bias"])},
            "fc2": {"kernel": np.asarray(sd["text_module.fc2.weight"]).T,
                    "bias": np.asarray(sd["text_module.fc2.bias"])},
        }
    return params, stats


def reference_s3dg_text_shape_manifest(
        embd_dim: int = 512, space_to_depth: bool = True,
        num_embeddings: int = 66250) -> Dict[str, tuple]:
    """Name -> shape manifest of a reference text-S3D state_dict
    (s3dg.py:238-331; channel plan shared with s3d_1.py)."""
    from ..models.s3d import _MIXED_SPECS

    manifest: Dict[str, tuple] = {}

    def stconv(base, cin, cout, k, separable):
        if separable:
            manifest[base + ".conv1.weight"] = (cout, cin, 1, k, k)
            manifest[base + ".conv2.weight"] = (cout, cout, k, 1, 1)
            bns = ("bn1", "bn2")
        else:
            kk = k if isinstance(k, tuple) else (k, k, k)
            manifest[base + ".conv1.weight"] = (cout, cin) + kk
            bns = ("bn1",)
        for bn in bns:
            for suffix in ("weight", "bias", "running_mean", "running_var"):
                manifest[f"{base}.{bn}.{suffix}"] = (cout,)

    def gating(base, c):
        manifest[base + ".fc.weight"] = (c, c)
        manifest[base + ".fc.bias"] = (c,)

    if space_to_depth:
        stconv("conv1", 24, 64, (2, 4, 4), False)
    else:
        stconv("conv1", 3, 64, (3, 7, 7), False)
    stconv("conv_2b", 64, 64, (1, 1, 1), False)
    stconv("conv_2c", 64, 192, 3, True)
    gating("gating", 192)
    in_ch = 192
    for blk in _S3DG_TEXT_MIXED:
        b0, (b1r, b1), (b2r, b2), b3 = _MIXED_SPECS[blk]
        stconv(f"{blk}.conv_b0", in_ch, b0, (1, 1, 1), False)
        stconv(f"{blk}.conv_b1_a", in_ch, b1r, (1, 1, 1), False)
        stconv(f"{blk}.conv_b1_b", b1r, b1, 3, True)
        stconv(f"{blk}.conv_b2_a", in_ch, b2r, (1, 1, 1), False)
        stconv(f"{blk}.conv_b2_b", b2r, b2, 3, True)
        stconv(f"{blk}.conv_b3_b", in_ch, b3, (1, 1, 1), False)
        for g, c in (("gating_b0", b0), ("gating_b1", b1),
                     ("gating_b2", b2), ("gating_b3", b3)):
            gating(f"{blk}.{g}", c)
        in_ch = b0 + b1 + b2 + b3
    manifest["fc.weight"] = (embd_dim, 1024)
    manifest["fc.bias"] = (embd_dim,)
    manifest["text_module.word_embd.weight"] = (num_embeddings, 300)
    manifest["text_module.fc1.weight"] = (2048, 300)
    manifest["text_module.fc1.bias"] = (2048,)
    manifest["text_module.fc2.weight"] = (embd_dim, 2048)
    manifest["text_module.fc2.bias"] = (embd_dim,)
    return manifest
