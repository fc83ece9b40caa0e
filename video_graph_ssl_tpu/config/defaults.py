"""Default configuration tree.

Keeps the exact section/key schema of the reference
(reference: lib/config/defaults.py:1-131) so existing YAML configs and CLI
``opts`` overrides keep working, and adds a ``TPU`` section for the
JAX-native knobs (mesh layout, dtypes, donation, pallas toggles) that have no
CUDA counterpart.
"""

from .node import CfgNode as CN

_C = CN()

# ---------------------------------------------------------------------------- #
# Model
# ---------------------------------------------------------------------------- #
_C.MODEL = CN()
_C.MODEL.DEVICE = "tpu"            # reference default: 'cuda'
_C.MODEL.DEVICE_IDS = "0, 1, 2, 3"
_C.MODEL.SEED = 1
_C.MODEL.BACKBONE = "resnet101"
_C.MODEL.BACKBONE_TYPE = "2D"
_C.MODEL.PRETRAINED = True
_C.MODEL.PRETRAIN_PATH = "none"
_C.MODEL.PRETRAIN_CHOICE = "none"
_C.MODEL.METRIC_LOSS_TYPE = "CrossEntropyLoss"
_C.MODEL.POOLING_TYPE = "avg"
_C.MODEL.DROPOUT = 0.5
_C.MODEL.NO_PARTIALBN = False
_C.MODEL.DISTRIBUTED = True
_C.MODEL.REASONING_FLAG = False
_C.MODEL.AUG_FLAG = False          # enables the temporal-graph augmentation
_C.MODEL.LINEAR_PROBE = False
# BN semantics when LINEAR_PROBE freezes the encoder:
#   'eval'      — whole model on running stats (this framework's default;
#                 deterministic probe, no stat drift)
#   'reference' — partial-BN train mode: the FIRST BN keeps using batch
#                 statistics and updating its running stats, the rest are
#                 frozen — the reference's VideoModelWrapper.train()
#                 override (model_wrappers.py:130-146).
# Measured A/B (perf/probe_bn_lab.py, temporal-motion probe set, 08-19,
# 2 seeds): 'reference' fits train harder (93.8/100 vs 68.8/100 top1) but
# LOSES 12.5-16.7 val points to 'eval' at probe batch 16 — the live first
# BN overfits batch statistics.  Default stays 'eval'; 'reference' remains
# available for strict-parity runs.
_C.MODEL.PROBE_BN = "eval"

# ---------------------------------------------------------------------------- #
# Input
# ---------------------------------------------------------------------------- #
_C.INPUT = CN()
_C.INPUT.BASE_SIZE = [224, 224]
_C.INPUT.CROP_SIZE = [224, 224]
_C.INPUT.SCALE_SIZE = [256, 256]
_C.INPUT.MEAN = [0.485, 0.456, 0.406]
_C.INPUT.STD = [0.229, 0.224, 0.225]
_C.INPUT.MODALITY = "RGB"
_C.INPUT.SAMPLE_TYPE = "uniform"
_C.INPUT.VIDEO_LENGTH = 16
_C.INPUT.SAMPLE_RATE = 4
_C.INPUT.IMG_TMP = "img_{:05d}.jpg"
_C.INPUT.FLOW_TMP = "flow_{}_{:05d}.jpg"
_C.INPUT.FLIP = True
_C.INPUT.PRE_LOAD = "cv2"          # cv2 | PIL | shard | native (C++ jpeg pool)
_C.INPUT.TEMPORAL_JITTER = False
# Consecutive frames loaded per sampled index, channel-stacked.  -1 = auto
# by modality: 1 for RGB, 5 for Flow/RGBDiff (the reference wrappers'
# default, model_wrappers.py:41-45); RGBDiff adds +1 in the dataset.
_C.INPUT.NEW_LENGTH = -1

# ---------------------------------------------------------------------------- #
# Dataset
# ---------------------------------------------------------------------------- #
_C.DATASET = CN()
_C.DATASET.NAME = "kinetics"
_C.DATASET.NUM_CLASS = 101
_C.DATASET.VISUAL_ROOT_DIR = "path"
_C.DATASET.AUDIO_ROOT_DIR = "path"
_C.DATASET.TRAIN_SPLIT = "./"
_C.DATASET.VALIDATION_SPLIT = "./"
# Non-reference extension: 'frames' reads JPEG frame folders like the
# reference; 'synthetic' generates deterministic fake clips (tests/benches).
_C.DATASET.SOURCE = "frames"

# ---------------------------------------------------------------------------- #
# DataLoader
# ---------------------------------------------------------------------------- #
_C.DATALOADER = CN()
_C.DATALOADER.NUM_WORKERS = 8
_C.DATALOADER.BATCH_SIZE = 128

# ---------------------------------------------------------------------------- #
# Solver
# ---------------------------------------------------------------------------- #
_C.SOLVER = CN()
_C.SOLVER.OPTIMIZER_NAME = "SGD"
_C.SOLVER.LR_SCHEDULER = "poly"
_C.SOLVER.MAX_EPOCHS = 50
_C.SOLVER.START_EPOCH = 0
_C.SOLVER.BASE_LR = 0.001
_C.SOLVER.BIAS_LR_FACTOR = 2
_C.SOLVER.MOMENTUM = 0.9
_C.SOLVER.WEIGHT_DECAY = 5e-4
_C.SOLVER.WEIGHT_DECAY_BIAS = 0.0
_C.SOLVER.NESTEROV = False
_C.SOLVER.USE_TRICK = False
_C.SOLVER.LR_STEP = 20
_C.SOLVER.CLIP_GRADIENT = "none"
_C.SOLVER.NO_PARTIALBN = True

_C.SOLVER.GAMMA = 0.1
_C.SOLVER.STEPS = (30, 60)
_C.SOLVER.WARMUP_FACTOR = 1.0 / 3
_C.SOLVER.WARMUP_ITERS = 5
_C.SOLVER.WARMUP_METHOD = "linear"

# ---------------------------------------------------------------------------- #
# APEX — kept for YAML compatibility. On TPU, AMP is replaced by native
# bfloat16 compute (TPU.COMPUTE_DTYPE); no loss scaling is required.
# ---------------------------------------------------------------------------- #
_C.APEX = CN()
_C.APEX.FLAG = False
_C.APEX.OPT_LEVEL = "O1"
_C.APEX.LOCAL_RANK = -1

_C.TEST = CN()
_C.TEST.BATCH_SIZE = 128
_C.TEST.WEIGHT = ""

# ---------------------------------------------------------------------------- #
# Checkpoint
# ---------------------------------------------------------------------------- #
_C.CHECKPOINT = CN()
_C.CHECKPOINT.RESUME = "none"
_C.CHECKPOINT.CHECKNAME = "video_model"
_C.CHECKPOINT.CHECKPOINT_INTERVAL = 20
_C.CHECKPOINT.NO_VAL = False
_C.CHECKPOINT.EVAL_INTERVAL = 5
_C.CHECKPOINT.FINETUNE = False
_C.CHECKPOINT.PRINT_FREQ = 20

# ---------------------------------------------------------------------------- #
# Contrast
# ---------------------------------------------------------------------------- #
_C.CONTRAST = CN()
_C.CONTRAST.MEM_TYPE = "bank"
_C.CONTRAST.NCE_K = 65536
_C.CONTRAST.NCE_T = 0.07
_C.CONTRAST.NCE_M = 0.5
_C.CONTRAST.ALPHA = 0.999
_C.CONTRAST.JIGSAW = False

# ---------------------------------------------------------------------------- #
# Cross modality
# ---------------------------------------------------------------------------- #
_C.CROSS = CN()
_C.CROSS.FEAT_DIM = 128
_C.CROSS.HEAD_TYPE = "mlp"
_C.CROSS.MEM = None
_C.CROSS.BETA = 0.5
_C.CROSS.MODALITY = "visual"
_C.CROSS.CRITERION = "crossentropy"

# ---------------------------------------------------------------------------- #
# Graph augmentation (TemporalGraphAug) hyper-parameters.  The reference
# hardcodes these in lib/ops/module_wrappers/temporal_graph.py:66-99; exposed
# here so configs can sweep them.
# ---------------------------------------------------------------------------- #
_C.GRAPH = CN()
_C.GRAPH.MAX_HOP = 3
_C.GRAPH.NUM_GCN_LAYERS = 1
_C.GRAPH.TEMPERATURE = 1.0
_C.GRAPH.ALPHA = 0.5
_C.GRAPH.SUB_SAMPLE = True
_C.GRAPH.MAX_POOL = True
_C.GRAPH.BN_LAYER = False
# relaxed_bernoulli (rsample) | relaxed_bernoulli_sample (no grad through
# the draw, reference _sample_adj_with_van) | gaussian | none
_C.GRAPH.SAMPLER = "relaxed_bernoulli"
# Which backbone stages get a TemporalGraphAug block.  () = the backbone
# registry's defaults, which mirror the reference's hardcoded per-backbone
# lists (visual_wrappers.py:115-123; S3D 'base.{5,9,14}' == aug_points
# (5, 9, 14)).  A non-empty tuple overrides the list — beyond-reference
# convenience: the reference geometry REQUIRES >=2x2 spatial at every
# wrapped stage (g_q halves channels then MaxPool3d((1,2,2)),
# temporal_graph.py:76-86), so micro-input runs must drop base.14.
_C.GRAPH.AUG_POINTS = ()
# Temporal neighborhood masking pre-softmax (intended semantics of the
# reference's broken mask_frame/nei_size, temporal_graph.py:169-174).
_C.GRAPH.MASK_FRAME = False
_C.GRAPH.NEI_SIZE = 0                    # <=0: full sequence (no masking)
# Fused Pallas adjacency kernel (ops/pallas/graph_kernel.py). Measured on
# v5e (bs=128, S3D aug points): beats the XLA path at every aug shape in
# isolation (e.g. idx5 fwd 4.29 vs 4.85 ms, f+b 4.35 vs 4.88 ms,
# perf/graph_lab.py) but is within measurement noise of — and in two
# independent full-step sweeps slightly behind — the XLA path inside the
# fused MoCo+graph step (r2: 112.2 vs 111.3 ms; 08-18: 104.0 vs 103.8 ms,
# perf/regime_bench.py). Default OFF: the isolation win does not justify
# the extra compile time and custom-VJP surface in the full graph, where
# XLA fuses the adjacency chain into neighbors anyway. Auto-falls back to
# XLA on non-TPU platforms and non-relaxed_bernoulli samplers.
_C.GRAPH.USE_PALLAS = False

# Layout-native Pallas kernel for the GCN frame-axis propagation
# (ops/pallas/gcn_propagate.py): performs the (T,T)x(T,HWC) contraction in
# VMEM reading/writing the conv (W,C) tiling directly, avoiding the HBM
# relayout copies XLA pays to collapse (h,w,c) for the batched matmul.
# Exact same math (fp32 accumulation, bf16-cast adjacency).  Chip verdict
# r5 (perf/CHIP_QUEUE_r05.jsonl): Mosaic rejects non-lane-aligned C (2 of 3
# S3D aug points) and the lane-aligned point loses ~2x on fwd+bwd — premise
# refuted; default stays OFF.  Full-step confirmation (same ledger,
# gca_defaults_paired_sweep): the flag costs -5.5% on the GCA step
# (1207.9 vs 1278.7 clips/s).  The kernel auto-falls back to the XLA
# einsum off-TPU and for C % 128 != 0.
_C.GRAPH.PROPAGATE_PALLAS = False

# ---------------------------------------------------------------------------- #
# TPU-native runtime knobs (no reference counterpart)
# ---------------------------------------------------------------------------- #
_C.TPU = CN()
_C.TPU.MESH_SHAPE = (-1,)                # -1 = all devices on the 'data' axis
_C.TPU.MESH_AXES = ("data",)
_C.TPU.COMPUTE_DTYPE = "bfloat16"        # activations / conv compute
_C.TPU.PARAM_DTYPE = "float32"           # master params
_C.TPU.SYNC_BN = True                    # cross-replica batch stats (psum)
_C.TPU.SHUFFLE_BN = False                # shard_map local-BN ShuffleBN for MoCo keys
_C.TPU.REMAT = False                     # jax.checkpoint the backbone stages
_C.TPU.REMAT_POLICY = "block"            # block: recompute whole stages;
                                         # conv_saved: keep conv outputs,
                                         # recompute only BN/ReLU epilogues
                                         # (S3D/S3DG; no conv recompute,
                                         # ~half the stored activations)
_C.TPU.STEM_S2D = "off"                  # S3D/S3DG space-to-depth stem:
                                         # off | full | spatial (exact rewrite)
_C.TPU.PACK_POINTWISE = True             # S3D/S3DG: fuse each inception
                                         # block's three sibling 1x1x1 convs
                                         # into one MXU matmul (same math,
                                         # same checkpoint tree; +1.2-1.3%
                                         # in two independent chip sweeps,
                                         # CHIP_QUEUE_r03b/r03c ledgers)
_C.TPU.SEPCONV_FUSED = False             # S3D: custom-VJP 3-sweep recompute
                                         # backward for branch SepConvs
                                         # (Pallas on one TPU device)
_C.TPU.PREFETCH = 2                      # host->device pipeline depth
_C.TPU.COMPILER_OPTIONS = ()             # flat (key, value, key, value, ...)
                                         # XLA compile-option overrides for
                                         # the train step, sent INSIDE the
                                         # compile request (reaches the
                                         # server-side TPU compiler even
                                         # over relays where XLA_FLAGS
                                         # can't; perf/compiler_options_
                                         # sweep.py measures candidates)
_C.TPU.CKPT_BACKEND = "msgpack"          # msgpack (1 file) | orbax (sharded)
_C.TPU.ASYNC_CKPT = False                # orbax only: commit in background

cfg = _C
