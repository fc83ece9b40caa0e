"""Model factories: name registry + ``create_visual_model``/``create_video_model``.

Counterpart of lib/modeling/build.py:5-32 and the ``getattr(backbone_3d, name)``
lookup (visual_wrappers.py:128-144).  Returns Flax module definitions; the
MoCo EMA encoder is *not* a second module copy (reference build.py:16-32) —
in the functional train state it is simply a second parameter pytree.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax.numpy as jnp

from . import resnet2d, resnet2p1d, resnet3d
from .bninception import BNINCEPTION_FEATURE_DIM, bninception
from .i3d import I3D, I3D_FEATURE_DIM
from .i3dnon import i3d_res50_nonlocal
from .inceptionv3 import INCEPTIONV3_FEATURE_DIM, inception_v3
from .s3d import S3D, S3D_FEATURE_DIM
from .tiny import TINY3D_FEATURE_DIM, Tiny3D
from .wrappers import CmcWrapper, GraphWrapper, VideoModel

# name -> (ctor, feature_dim, default graph-aug insertion points)
# Aug points follow the reference defaults (visual_wrappers.py:113-124).
BACKBONES_3D = {
    "S3D": (lambda **kw: S3D(**kw), S3D_FEATURE_DIM, (5, 9, 14)),
    # S3D-G: same topology, biased temporal convs (S3DG_Pytorch.py:310-355)
    "S3DG": (lambda **kw: S3D(temporal_bias=True, **kw),
             S3D_FEATURE_DIM, (5, 9, 14)),
    # Both reference I3D implementations (i3dpt.py / i3d_inception.py,
    # byte-near duplicates) map to one TF-SAME-padded network.
    "I3D": (lambda **kw: I3D(**kw), I3D_FEATURE_DIM, (5, 9, 14)),
    "InceptionI3d": (lambda **kw: I3D(**kw), I3D_FEATURE_DIM, (5, 9, 14)),
    "i3d_res50_nonlocal": (i3d_res50_nonlocal, 2048, (2, 3, 4)),
    "resnet2p1d_10": (resnet2p1d.resnet2p1d_10, 512, (2, 3, 4)),
    "resnet2p1d_18": (resnet2p1d.resnet2p1d_18, 512, (2, 3, 4)),
    "resnet2p1d_34": (resnet2p1d.resnet2p1d_34, 512, (2, 3, 4)),
    "resnet2p1d_50": (resnet2p1d.resnet2p1d_50, 2048, (2, 3, 4)),
    "resnet2p1d_101": (resnet2p1d.resnet2p1d_101, 2048, (2, 3, 4)),
    "resnet2p1d_152": (resnet2p1d.resnet2p1d_152, 2048, (2, 3, 4)),
    "resnet2p1d_200": (resnet2p1d.resnet2p1d_200, 2048, (2, 3, 4)),
    "resnet3d_10": (resnet3d.resnet3d_10, 512, (2, 3, 4)),
    "resnet3d_18": (resnet3d.resnet3d_18, 512, (2, 3, 4)),
    "resnet3d_34": (resnet3d.resnet3d_34, 512, (2, 3, 4)),
    "resnet3d_50": (resnet3d.resnet3d_50, 2048, (2, 3, 4)),
    "resnet3d_101": (resnet3d.resnet3d_101, 2048, (2, 3, 4)),
    "resnet3d_152": (resnet3d.resnet3d_152, 2048, (2, 3, 4)),
    "resnet3d_200": (resnet3d.resnet3d_200, 2048, (2, 3, 4)),
    # factorized (spatial+temporal) family, reference resnet_i3d.py:141-249
    "resnet_i3d_18": (resnet3d.resnet_i3d_18, 512, (2, 3, 4)),
    "resnet_i3d_50": (resnet3d.resnet_i3d_50, 2048, (2, 3, 4)),
    "resnet_i3d_101": (resnet3d.resnet_i3d_101, 2048, (2, 3, 4)),
    # test/dry-run-only micro backbone (not in the reference inventory)
    "tiny3d": (lambda **kw: Tiny3D(**kw), TINY3D_FEATURE_DIM, (1,)),
}

BACKBONES_2D = {
    "bninception": (bninception, BNINCEPTION_FEATURE_DIM, ()),
    "inception_v3": (inception_v3, INCEPTIONV3_FEATURE_DIM, ()),
    "resnet18": (resnet2d.resnet18, 512, ()),
    "resnet34": (resnet2d.resnet34, 512, ()),
    "resnet50": (resnet2d.resnet50, 2048, ()),
    "resnet101": (resnet2d.resnet101, 2048, ()),
    "resnet152": (resnet2d.resnet152, 2048, ()),
}


def _lookup_backbone(name: str, backbone_type: str):
    table = BACKBONES_3D if backbone_type == "3D" else BACKBONES_2D
    if name not in table:
        raise ValueError(
            f"Unknown {backbone_type} backbone '{name}'. "
            f"Available: {sorted(table)}"
        )
    return table[name]


def _resolve_new_length(cfg) -> int:
    """Reference default: 1 for RGB, 5 otherwise (model_wrappers.py:41-45)."""
    nl = int(cfg.INPUT.NEW_LENGTH)
    return nl if nl > 0 else (1 if cfg.INPUT.MODALITY == "RGB" else 5)


def _resolve_remat(cfg, name: str):
    """TPU.REMAT x TPU.REMAT_POLICY -> the backbone ``remat`` arg.

    False when off; True = block-granular jax.checkpoint (recompute whole
    stages); 'conv_saved' = checkpoint with save_only_these_names('conv_out')
    — keep every conv output, recompute only the BN/ReLU epilogues (S3D
    family only; see layers.ConvBN's checkpoint tag)."""
    if not bool(cfg.TPU.REMAT):
        return False
    policy = str(cfg.TPU.REMAT_POLICY)
    if policy == "block":
        return True
    if policy == "conv_saved":
        if name not in ("S3D", "S3DG"):
            raise ValueError(
                f"TPU.REMAT_POLICY=conv_saved only applies to S3D/S3DG, "
                f"got {name}")
        return "conv_saved"
    raise ValueError(f"TPU.REMAT_POLICY must be block|conv_saved, "
                     f"got {policy}")


def graph_cfg_from(cfg) -> Dict[str, Any]:
    """GRAPH section → TemporalGraphAug kwargs."""
    g = cfg.GRAPH
    return dict(
        max_hop=g.MAX_HOP,
        num_gcn_layers=g.NUM_GCN_LAYERS,
        temperature=g.TEMPERATURE,
        alpha=g.ALPHA,
        sub_sample=g.SUB_SAMPLE,
        max_pool=g.MAX_POOL,
        bn_layer=g.BN_LAYER,
        sampler=g.SAMPLER,
        mask_frame=g.MASK_FRAME,
        nei_size=g.NEI_SIZE,
        use_pallas=g.USE_PALLAS,
        propagate_pallas=g.PROPAGATE_PALLAS,
    )


def encoder_cfg_from(cfg, aug_flag: bool,
                     partial_bn: bool = False) -> Tuple[Dict[str, Any], int]:
    """Build VisualEncoder kwargs from the config; returns (kwargs, feat_dim)."""
    name = cfg.MODEL.BACKBONE
    btype = cfg.MODEL.BACKBONE_TYPE
    ctor, feat_dim, default_aug = _lookup_backbone(name, btype)
    s2d = str(cfg.TPU.STEM_S2D).lower()
    if s2d in ("true", "1", "full"):
        s2d = "full"
    elif s2d in ("false", "0", "off", "none", ""):
        s2d = ""
    if s2d:
        if s2d not in ("full", "spatial"):
            raise ValueError(f"TPU.STEM_S2D must be off|full|spatial, "
                             f"got {cfg.TPU.STEM_S2D}")
        if name not in ("S3D", "S3DG"):
            raise ValueError(f"TPU.STEM_S2D only applies to S3D/S3DG, "
                             f"got {name}")
        ctor = functools.partial(ctor, stem_s2d=s2d)
    if bool(cfg.TPU.PACK_POINTWISE):
        # Default-ON knob: applies to the inception family (where the
        # three sibling 1x1x1 convs exist to pack — +1.2-1.3% on v5e,
        # CHIP_QUEUE_r03b/r03c) and is a structural no-op elsewhere, so
        # other backbones simply ignore it rather than erroring out.
        if name in ("S3D", "S3DG", "I3D", "InceptionI3d"):
            ctor = functools.partial(ctor, pack_pointwise=True)
    if bool(cfg.TPU.SEPCONV_FUSED):
        if name != "S3D":
            # S3DG's biased STConv3d variant keeps the standard backward
            raise ValueError(f"TPU.SEPCONV_FUSED only applies to S3D, "
                             f"got {name}")
        ctor = functools.partial(ctor, fused_sepconv=True)
    dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
    enc = dict(
        backbone_ctor=ctor,
        backbone_type=btype,
        agg_fun=cfg.MODEL.POOLING_TYPE,
        dropout=float(cfg.MODEL.DROPOUT),
        aug_points=(tuple(cfg.GRAPH.AUG_POINTS) or tuple(default_aug))
        if aug_flag else (),
        graph_cfg=graph_cfg_from(cfg) if aug_flag else None,
        remat=_resolve_remat(cfg, name),
        partial_bn=bool(partial_bn),
        modality=cfg.INPUT.MODALITY,
        new_length=_resolve_new_length(cfg),
        dtype=dtype,
    )
    return enc, feat_dim


def create_visual_model(cfg) -> Tuple[GraphWrapper, int]:
    """SSL pretraining model (reference: lib/modeling/build.py:16-32).

    Returns (module, feature_dim).  For MoCo the caller initializes the EMA
    parameter copy from the same module definition — no second module.
    Note: like the reference, pass ``cfg.MODEL.AUG_FLAG=True`` for the
    GCA-M / GCA-S graph variants; shipped baseline configs run plain
    MoCo-/SimSiam-video.
    """
    enc_cfg, feat_dim = encoder_cfg_from(cfg, aug_flag=bool(cfg.MODEL.AUG_FLAG))
    mem_type = cfg.CONTRAST.MEM_TYPE
    hid_dim = int(cfg.CROSS.FEAT_DIM)
    if cfg.CROSS.MODALITY != "visual":
        # CMC: two-modality model (reference dispatches its memory on this
        # key, lib/memory/build.py:7-11, but never builds the second
        # encoder — see models.wrappers.CmcWrapper).
        if mem_type not in ("moco", "bank"):
            raise ValueError(
                f"CROSS.MODALITY={cfg.CROSS.MODALITY!r} (CMC) supports "
                f"moco/bank memories, not {mem_type!r}")
        return CmcWrapper(encoder_cfg=enc_cfg, hid_dim=hid_dim,
                          head_type=cfg.CROSS.HEAD_TYPE), feat_dim
    model = GraphWrapper(
        encoder_cfg=enc_cfg,
        hid_dim=hid_dim,
        head_type=cfg.CROSS.HEAD_TYPE,
        mem_type=mem_type,
    )
    return model, feat_dim


def create_video_model(cfg) -> Tuple[VideoModel, int]:
    """Downstream fine-tune / linear-probe model
    (reference: lib/modeling/build.py:5-14).

    Partial-BN is on by default for downstream training (the reference's
    VideoModelWrapper defaults + train() override) unless
    MODEL.NO_PARTIALBN."""
    enc_cfg, feat_dim = encoder_cfg_from(
        cfg, aug_flag=bool(cfg.MODEL.AUG_FLAG),
        partial_bn=not bool(cfg.MODEL.NO_PARTIALBN))
    model = VideoModel(encoder_cfg=enc_cfg, num_classes=int(cfg.DATASET.NUM_CLASS))
    return model, feat_dim
