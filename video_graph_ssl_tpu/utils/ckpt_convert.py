"""Full reference-checkpoint conversion (migration surface).

torch_interop maps the *backbone* weight trees; this module converts the
reference's full training checkpoints — SSL pretrain and downstream — and
grafts them into a real :class:`~video_graph_ssl_tpu.engine.TrainState`
template, so the emitted ``.msgpack`` loads in EVERY consumer:
``train_ds --ssl_checkpoint`` (encoder surgery), ``video_retrieval`` /
``test_ds`` (full-state restore), and ``export_model``.

Reference payloads being converted:
  * SSL pretrain (tools/train_video_contrast_dis.py:274-283):
    ``{'epoch', 'state_dict': GraphWrapper, 'optimizer',
       'contrast': memory buffers, ['model_ema'], ['amp']}`` where the
    GraphWrapper state_dict is rooted at ``model.`` —
    ``model.encoder.base_model.*`` (VisualModelWrapper),
    ``model.proj_head.head.{0,2}.*`` (moco/bank, project_head.py:12-34) or
    ``model.projection.l{1,2,3}.{0,1}.*`` + ``model.prediction.{l1.{0,1},l2}.*``
    (simsiam, project_head.py:36-75).
  * Downstream (tools/train_ds.py save path): VideoModelWrapper state_dict
    ``base_model.*`` + ``new_fc.{weight,bias}`` (model_wrappers.py).

Optimizer state is NOT converted (torch SGD momentum buffers have no
stable correspondence to an arbitrary optax chain); the emitted checkpoint
carries the template's fresh optimizer state and records
``optimizer: "reinitialized"`` in its metadata.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

import functools

from .torch_interop import (
    convert_torch_bninception,
    convert_torch_graph_aug,
    convert_torch_i3d,
    convert_torch_inception_v3,
    convert_torch_resnet,
    convert_torch_s3d,
    convert_torch_s3dg,
    export_s3d_to_torch_names,
    split_aug_wrapped_sd,
)

_BACKBONE_CONVERTERS = {
    "s3d": convert_torch_s3d,
    "s3dg": convert_torch_s3dg,
    "i3d": convert_torch_i3d,
    "inceptioni3d": convert_torch_i3d,
    "bninception": convert_torch_bninception,
    "inception_v3": convert_torch_inception_v3,
}
# ResNet families: one key-driven converter covers every depth
# (backbone_2d/resnet.py torchvision naming, backbone_3d/resnet.py).
for _d in (10, 18, 34, 50, 101, 152, 200):
    _BACKBONE_CONVERTERS[f"resnet3d_{_d}"] = functools.partial(
        convert_torch_resnet, dims=3)
for _d in (18, 34, 50, 101, 152):
    _BACKBONE_CONVERTERS[f"resnet{_d}"] = functools.partial(
        convert_torch_resnet, dims=2)
from .torch_interop import (  # noqa: E402
    convert_torch_resnet2p1d,
    convert_torch_resnet_i3d,
)
for _d in (10, 18, 34, 50, 101, 152, 200):
    _BACKBONE_CONVERTERS[f"resnet2p1d_{_d}"] = convert_torch_resnet2p1d
for _d in (18, 34, 50, 101):
    _BACKBONE_CONVERTERS[f"resnet_i3d_{_d}"] = convert_torch_resnet_i3d


def _sub(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    if not out:
        raise KeyError(
            f"no keys under '{prefix}' — got roots "
            f"{sorted({k.split('.')[0] for k in sd})}")
    return out


def _dense(sd, name: str) -> dict:
    p = {"kernel": np.asarray(sd[name + ".weight"]).T}
    if name + ".bias" in sd:
        p["bias"] = np.asarray(sd[name + ".bias"])
    return p


def _bn1d(sd, name: str) -> Tuple[dict, dict]:
    return ({"scale": np.asarray(sd[name + ".weight"]),
             "bias": np.asarray(sd[name + ".bias"])},
            {"mean": np.asarray(sd[name + ".running_mean"]),
             "var": np.asarray(sd[name + ".running_var"])})


def convert_proj_head(sd: Dict[str, np.ndarray], head_type: str) -> dict:
    """ProjectHead (reference project_head.py:12-34) -> models.heads tree.

    ``sd`` rooted at the head: keys ``head.0.*`` (+ ``head.2.*`` for mlp).
    """
    if head_type == "linear":
        return {"fc": _dense(sd, "head.0")}
    if head_type == "mlp":
        return {"fc1": _dense(sd, "head.0"), "fc2": _dense(sd, "head.2")}
    raise NotImplementedError(f"head not supported: {head_type}")


def convert_projection_mlp(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """SimSiam ProjectionMLP (project_head.py:36-59): l1/l2/l3 each
    ``Sequential(Linear, BatchNorm1d[, ReLU])``."""
    params, stats = {}, {}
    for l in ("l1", "l2", "l3"):
        bn_p, bn_s = _bn1d(sd, f"{l}.1")
        params[l] = {"fc": _dense(sd, f"{l}.0"), "bn": bn_p}
        stats[l] = {"bn": bn_s}
    return params, stats


def convert_prediction_mlp(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """SimSiam PredictionMLP (project_head.py:62-75): l1 = Linear+BN+ReLU,
    l2 = bare Linear."""
    bn_p, bn_s = _bn1d(sd, "l1.1")
    params = {"l1": {"fc": _dense(sd, "l1.0"), "bn": bn_p},
              "l2": _dense(sd, "l2")}
    return params, {"l1": {"bn": bn_s}}


def convert_pretrain_sd(
    sd: Dict[str, np.ndarray],
    backbone: str,
    mem_type: str,
    head_type: str = "mlp",
) -> Tuple[dict, dict]:
    """GraphWrapper state_dict -> (params, batch_stats) subtrees for our
    models.wrappers.GraphWrapper (the ``{"model": ...}`` root)."""
    backbone = backbone.lower()
    if backbone not in _BACKBONE_CONVERTERS:
        raise NotImplementedError(
            f"no torch converter for backbone '{backbone}' "
            f"(have: {sorted(_BACKBONE_CONVERTERS)})")
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    enc_sd = _sub(sd, "model.encoder.base_model.")
    # Graph-aug (MODEL.AUG_FLAG) checkpoints: strip the Sequential wraps and
    # convert each TemporalGraphAug block alongside the backbone.
    enc_sd, graph_sds = split_aug_wrapped_sd(enc_sd)
    enc_p, enc_s = _BACKBONE_CONVERTERS[backbone](enc_sd)
    for idx, gsd in sorted(graph_sds.items()):
        gp, gs = convert_torch_graph_aug(gsd)
        enc_p[f"graph_aug_{idx}"] = gp
        if gs:
            enc_s[f"graph_aug_{idx}"] = gs
    model_p: dict = {"encoder": {"base_model": enc_p}}
    model_s: dict = {"encoder": {"base_model": enc_s}}
    if mem_type == "simsiam":
        proj_p, proj_s = convert_projection_mlp(_sub(sd, "model.projection."))
        pred_p, pred_s = convert_prediction_mlp(_sub(sd, "model.prediction."))
        model_p["projection"], model_s["projection"] = proj_p, proj_s
        model_p["prediction"], model_s["prediction"] = pred_p, pred_s
    else:
        model_p["proj_head"] = convert_proj_head(
            _sub(sd, "model.proj_head."), head_type)
    return {"model": model_p}, {"model": model_s}


def convert_downstream_sd(
    sd: Dict[str, np.ndarray], backbone: str,
) -> Tuple[dict, dict]:
    """VideoModelWrapper state_dict -> (params, batch_stats) for
    models.wrappers.VideoModel (``encoder.base_model`` + ``new_fc``)."""
    backbone = backbone.lower()
    if backbone not in _BACKBONE_CONVERTERS:
        raise NotImplementedError(
            f"no torch converter for backbone '{backbone}' "
            f"(have: {sorted(_BACKBONE_CONVERTERS)})")
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    enc_p, enc_s = _BACKBONE_CONVERTERS[backbone](_sub(sd, "base_model."))
    params = {"encoder": {"base_model": enc_p}, "new_fc": _dense(sd, "new_fc")}
    return params, {"encoder": {"base_model": enc_s}}


def detect_kind(sd: Dict[str, np.ndarray]) -> str:
    """'pretrain' (GraphWrapper roots) vs 'cmc_pretrain' (two-stack CMC) vs
    'downstream' (VideoModelWrapper)."""
    roots = {k.split(".")[0] for k in sd}
    if roots == {"module"}:
        roots = {k.split(".")[1] for k in sd}
    if "model" in roots:
        return "pretrain"
    if {"model_1", "model_2"} <= roots:
        return "cmc_pretrain"
    if "base_model" in roots:
        return "downstream"
    raise ValueError(f"unrecognized checkpoint layout; roots={sorted(roots)}")


def convert_cmc_pretrain_sd(
    sd: Dict[str, np.ndarray],
    backbone: str,
    head_type: str = "mlp",
) -> Tuple[dict, dict]:
    """Two-stack CMC state_dict -> subtrees for models.wrappers.CmcWrapper.

    The reference never composes a CMC *model* (its tools never build the
    second encoder; lib/memory/build.py:5-13 only dispatches the memories),
    so the torch naming convention here is the natural container one —
    ``model_{1,2}.<GraphWrapper names>`` (i.e. ``model_1.model.encoder...``)
    — which is also what :func:`export_cmc_pretrain_to_torch` emits."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    params: dict = {}
    stats: dict = {}
    for stack in ("model_1", "model_2"):
        sub = _sub(sd, stack + ".")
        if not sub:
            raise ValueError(f"no '{stack}.' keys in CMC state_dict")
        p, s = convert_pretrain_sd(sub, backbone, "moco", head_type)
        params[stack] = p["model"]
        stats[stack] = s["model"]
    return params, stats


def export_cmc_pretrain_to_torch(
    params: dict, stats: dict, head_type: str = "mlp",
    graph_sub_sample: bool = True,
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_cmc_pretrain_sd` (S3D backbone)."""
    out: Dict[str, np.ndarray] = {}
    for stack in ("model_1", "model_2"):
        sub = export_pretrain_to_torch(
            {"model": params[stack]}, {"model": stats[stack]},
            mem_type="moco", head_type=head_type,
            graph_sub_sample=graph_sub_sample)
        out.update({f"{stack}.{k}": v for k, v in sub.items()})
    return out


# --------------------------------------------------------------------------- #
# Grafting into a TrainState template
# --------------------------------------------------------------------------- #


def graft_like(template: Any, new: Any, path: str = "") -> Any:
    """Replace ``template``'s leaves with ``new``'s, checking structure and
    shapes; casts to the template leaf dtype (fp32 params/BN convention)."""
    if isinstance(template, dict):
        if not isinstance(new, dict) or set(template) != set(new):
            raise ValueError(
                f"tree mismatch at '{path}': template keys "
                f"{sorted(template) if isinstance(template, dict) else template} "
                f"vs converted {sorted(new) if isinstance(new, dict) else new}")
        return {k: graft_like(template[k], new[k], f"{path}.{k}")
                for k in template}
    t = np.asarray(template)
    n = np.asarray(new)
    if t.shape != n.shape:
        raise ValueError(f"shape mismatch at '{path}': template {t.shape} "
                         f"vs converted {n.shape}")
    return n.astype(t.dtype)


def graft_pretrain_state(state, payload: Dict[str, Any], cfg):
    """Convert a reference SSL checkpoint payload into ``state``'s mold.

    ``payload``: the torch.load dict (``state_dict``/``contrast``/
    ``model_ema``/``epoch``). Returns (new_state, meta_extra).
    """
    backbone = str(cfg.MODEL.BACKBONE)
    mem_type = str(cfg.CONTRAST.MEM_TYPE)
    head_type = str(cfg.CROSS.HEAD_TYPE)
    sd = _to_numpy_sd(payload.get("state_dict", payload))

    notes = {"optimizer": "reinitialized"}
    is_cmc = str(cfg.CROSS.MODALITY) != "visual"
    if is_cmc:
        p, s = convert_cmc_pretrain_sd(sd, backbone, head_type)
        convert = lambda d: convert_cmc_pretrain_sd(d, backbone, head_type)  # noqa: E731
        stacks = ("model_1", "model_2")
    else:
        p, s = convert_pretrain_sd(sd, backbone, mem_type, head_type)
        convert = lambda d: convert_pretrain_sd(d, backbone, mem_type,  # noqa: E731
                                                head_type)
        stacks = ("model",)
    params = dict(state.params)
    stats = dict(state.batch_stats)
    for st in stacks:
        params[st] = graft_like(state.params[st], p[st], f"params.{st}")
        stats[st] = graft_like(state.batch_stats[st], s[st],
                               f"batch_stats.{st}")
    state = state.replace(params=params, batch_stats=stats)

    if state.ema_params is not None:
        ema_sd = payload.get("model_ema")
        if ema_sd is not None:
            ep, es = convert(_to_numpy_sd(ema_sd))
            notes["model_ema"] = "converted"
        else:
            # reference initializes the EMA encoder as a copy when absent
            # (train_video_contrast_dis.py:145-146)
            ep, es = p, s
            notes["model_ema"] = "copied from model (absent in source)"
        state = state.replace(
            ema_params=graft_like(state.ema_params, ep, "ema_params"),
            ema_batch_stats=graft_like(state.ema_batch_stats, es,
                                        "ema_batch_stats"))

    contrast_sd = payload.get("contrast")
    if state.contrast is not None and contrast_sd:
        contrast_sd = _to_numpy_sd(contrast_sd)
        if is_cmc and "memory_1" in contrast_sd:
            # CMC dual memories (reference: CMCMoCo registers memory_1/
            # memory_2, mem_moco.py:95-99; CMCMem likewise, mem_bank.py:
            # 100-105) -> our queue_1/queue_2 or memory_1/memory_2 fields.
            import jax.numpy as jnp
            field = "queue_1" if hasattr(state.contrast, "queue_1") \
                else "memory_1"
            tmpl = getattr(state.contrast, field)
            if tuple(tmpl.shape) == tuple(np.asarray(
                    contrast_sd["memory_1"]).shape):
                reps = {
                    field: jnp.asarray(contrast_sd["memory_1"], tmpl.dtype),
                    field.replace("_1", "_2"): jnp.asarray(
                        contrast_sd["memory_2"], tmpl.dtype),
                }
                state = state.replace(
                    contrast=state.contrast._replace(**reps))
                notes["contrast"] = f"converted (memory_1/2 -> {field}/_2)"
            else:
                notes["contrast"] = (
                    f"kept template init (shape mismatch: ours "
                    f"{tuple(tmpl.shape)} vs source "
                    f"{np.asarray(contrast_sd['memory_1']).shape})")
            return state, notes
        mem = contrast_sd.get("memory")
        if mem is None:
            notes["contrast"] = ("kept template init (no 'memory' buffer in "
                                 f"source: {sorted(contrast_sd)})")
        else:
            field = "queue" if hasattr(state.contrast, "queue") else "memory"
            tmpl = getattr(state.contrast, field)
            if tuple(tmpl.shape) != tuple(np.asarray(mem).shape):
                notes["contrast"] = (
                    f"kept template init (shape mismatch: ours "
                    f"{tuple(tmpl.shape)} vs source {np.asarray(mem).shape})")
            else:
                import jax.numpy as jnp
                state = state.replace(contrast=state.contrast._replace(
                    **{field: jnp.asarray(np.asarray(mem), tmpl.dtype)}))
                notes["contrast"] = f"converted ('memory' -> {field})"
    return state, notes


def graft_downstream_state(state, payload: Dict[str, Any], cfg):
    """Convert a reference downstream checkpoint payload into ``state``."""
    sd = _to_numpy_sd(payload.get("state_dict", payload))
    p, s = convert_downstream_sd(sd, str(cfg.MODEL.BACKBONE))
    params = graft_like(state.params, p, "params")
    stats = graft_like(state.batch_stats, s, "batch_stats")
    return state.replace(params=params, batch_stats=stats), \
        {"optimizer": "reinitialized"}


def _to_numpy_sd(obj) -> Dict[str, np.ndarray]:
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def _find_subtree(tree, name: str):
    if isinstance(tree, dict):
        if name in tree and isinstance(tree[name], dict):
            return tree[name]
        for v in tree.values():
            r = _find_subtree(v, name)
            if r is not None:
                return r
    return None


def load_backbone_init(path: str, backbone: str) -> Tuple[dict, dict]:
    """Backbone warm-start for ``MODEL.PRETRAIN_PATH`` (the reference loads
    a bare-backbone torch state_dict at encoder build,
    visual_wrappers.py:137-139). Returns (params, batch_stats) for the
    ``base_model`` subtree.

    Accepts our ``.msgpack``/orbax checkpoints of ANY layout (SSL pretrain,
    downstream, or a bare tree — the ``base_model`` subtree is located
    recursively; works for every backbone), or torch ``.pth``/``.pth.tar``
    files (bare backbone, or ``encoder.``/``base_model.``-wrapped naming;
    s3d/s3dg/i3d only — the mapped backbones)."""
    from .checkpoint import load_params_only

    if path.endswith((".msgpack",)) or _looks_orbax(path):
        ssl_sd, _meta = load_params_only(path)
        params = ssl_sd.get("params", ssl_sd)
        stats = ssl_sd.get("batch_stats", {}) or {}
        bp = _find_subtree(params, "base_model")
        if bp is None:
            raise ValueError(f"no 'base_model' subtree in '{path}'")
        bs = _find_subtree(stats, "base_model") or {}
        return bp, bs

    from .torch_interop import load_torch_file, strip_prefixes

    backbone = backbone.lower()
    if backbone not in _BACKBONE_CONVERTERS:
        raise NotImplementedError(
            f"no torch converter for backbone '{backbone}' "
            f"(have: {sorted(_BACKBONE_CONVERTERS)}); convert the checkpoint "
            "to .msgpack first (tools/convert_checkpoint.py)")
    sd = strip_prefixes(load_torch_file(path))
    for prefix in ("encoder.base_model.", "base_model."):
        if any(k.startswith(prefix) for k in sd):
            sd = _sub(sd, prefix)
            break
    return _BACKBONE_CONVERTERS[backbone](sd)


def _looks_orbax(path: str) -> bool:
    import os

    return os.path.isdir(path)


# --------------------------------------------------------------------------- #
# Reverse direction: our checkpoint -> reference-named torch state_dict
# (S3D only — export_s3d_to_torch_names is the audited inverse mapping).
# --------------------------------------------------------------------------- #


def _dense_to_torch(out, name: str, p: dict) -> None:
    out[name + ".weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        out[name + ".bias"] = np.asarray(p["bias"])


def _bn1d_to_torch(out, name: str, p: dict, s: dict) -> None:
    out[name + ".weight"] = np.asarray(p["scale"])
    out[name + ".bias"] = np.asarray(p["bias"])
    out[name + ".running_mean"] = np.asarray(s["mean"])
    out[name + ".running_var"] = np.asarray(s["var"])


def export_pretrain_to_torch(
    params: dict, stats: dict, mem_type: str, head_type: str = "mlp",
    graph_sub_sample: bool = True,
) -> Dict[str, np.ndarray]:
    """Our SSL params/batch_stats -> reference GraphWrapper state_dict
    names (S3D backbone). Inverse of :func:`convert_pretrain_sd`.
    ``graph_sub_sample`` = GRAPH.SUB_SAMPLE of the graph blocks, if any."""
    mp, ms = params["model"], stats["model"]
    enc = export_s3d_to_torch_names(mp["encoder"]["base_model"],
                                    ms["encoder"]["base_model"],
                                    graph_sub_sample=graph_sub_sample)
    out = {f"model.encoder.base_model.{k}": v for k, v in enc.items()}
    if mem_type == "simsiam":
        for l in ("l1", "l2", "l3"):
            _dense_to_torch(out, f"model.projection.{l}.0", mp["projection"][l]["fc"])
            _bn1d_to_torch(out, f"model.projection.{l}.1",
                           mp["projection"][l]["bn"], ms["projection"][l]["bn"])
        _dense_to_torch(out, "model.prediction.l1.0", mp["prediction"]["l1"]["fc"])
        _bn1d_to_torch(out, "model.prediction.l1.1",
                       mp["prediction"]["l1"]["bn"], ms["prediction"]["l1"]["bn"])
        _dense_to_torch(out, "model.prediction.l2", mp["prediction"]["l2"])
    elif head_type == "linear":
        _dense_to_torch(out, "model.proj_head.head.0", mp["proj_head"]["fc"])
    else:
        _dense_to_torch(out, "model.proj_head.head.0", mp["proj_head"]["fc1"])
        _dense_to_torch(out, "model.proj_head.head.2", mp["proj_head"]["fc2"])
    return out


def export_downstream_to_torch(
    params: dict, stats: dict, graph_sub_sample: bool = True,
) -> Dict[str, np.ndarray]:
    """Our downstream params/batch_stats -> reference VideoModelWrapper
    state_dict names (S3D backbone)."""
    enc = export_s3d_to_torch_names(params["encoder"]["base_model"],
                                    stats["encoder"]["base_model"],
                                    graph_sub_sample=graph_sub_sample)
    out = {f"base_model.{k}": v for k, v in enc.items()}
    _dense_to_torch(out, "new_fc", params["new_fc"])
    return out
