#!/usr/bin/env python
"""Training-dynamics parity: N optimizer steps in lockstep with the
reference trainer math, executed as ground truth.

`tools/fidelity_check.py` proves eval-time feature parity; this harness
proves the TRAINING recipe: starting from identical weights (the reference
model's state_dict converted with utils/ckpt_convert) and identical
batches, both frameworks run N SGD steps. That covers what no eval test
can reach: train-mode BN batch statistics, SimSiam's symmetric
negative-cosine loss, backprop through the whole net, and the reference's
exact non-trick optimizer grouping (lib/solver/build.py:24-60: every torch
".bias" gets BIAS_LR_FACTOR x lr + WEIGHT_DECAY_BIAS; everything else, BN
scales included, gets the full WEIGHT_DECAY).

Pass metric: UPDATE TRACKING — after N steps, export our params back to
reference names (the audited inverse mapping) and compare against the
torch model's, normalized by the total update magnitude
||after_torch - before||. The raw loss is also printed but is NOT the
criterion: at micro geometry the train-mode BN statistics (batch 2-8) and
the near-zero cosine of random features amplify fp32 conv-reorder noise
chaotically, while the parameter updates stay comparable; a real recipe
bug (wrong decay mask, momentum, lr grouping, loss sign) shows up as an
O(1) tracking ratio.

Reference ground truth: lib/modeling (GraphWrapper/SimSiam) +
lib/solver.make_optimizer, imported from /root/reference and driven like
`_train_simsiam` (tools/train_video_contrast_dis.py:468-530) — with one
intended fix: that loop never calls optimizer.zero_grad() (its moco/bank
twins do, :317/:408 — a latent reference bug that silently accumulates
gradients across steps); both sides here use fresh per-step gradients.

Recorded results (08-18, fp32 CPU, 3 steps, batch 8, S3D 16x32x32),
ours-vs-reference update deviation vs the reference against ITSELF under
a 1e-4 input perturbation (the chaos control — micro-geometry BN
statistics + ReLU boundary flips):

    simsiam  0.125 vs control 0.471
    moco     0.133 vs control 0.355   (EMA encoder fwd w/ train-mode BN,
                                       queue logits, InfoNCE, enqueue,
                                       post-step EMA momentum — all via
                                       the production engine step)
    bank     0.077 vs control 0.365   (alias-sampled negatives PINNED to
                                       one shared (B, K+1) matrix on both
                                       sides — the draw is the regime's
                                       only stochastic input and the two
                                       PRNGs cannot be synchronized;
                                       memory EMA update + renormalize,
                                       slot-0 positive, softmax-CE)
    cmc_moco 0.074 vs control 0.346   (08-20: two encoder stacks, cross-
                                       modal CMCMoCo logits q1·(k2,queue2)
                                       + q2·(k1,queue1), dual-queue
                                       enqueue, both EMAs post-step — the
                                       reference memories executed as
                                       ground truth composed per its
                                       build dispatch; see
                                       run_reference_cmc)
    cmc_bank 0.058 vs control 0.324   (08-20: one view, cross-modal CMCMem
                                       logits x1·mem2[idx] + x2·mem1[idx],
                                       ONE shared pinned idx matrix for
                                       both selects (mem_bank.py:124-130
                                       draws once), both memories
                                       EMA-updated + renormalized)

The chaos floor is ~3-6x larger than our deviation in every regime: the
training recipes are indistinguishable at this scale, and any recipe bug
(wrong decay mask, momentum, lr grouping, loss sign, EMA/queue order:
all O(1) signals) is excluded.

Longer-horizon check (08-19, moco, 8 steps, batch 16): tracking stays
tight while chaos grows — ours-vs-reference 0.107 vs control 0.322.  A
recipe bug compounds with horizon; lockstep tracking that HOLDS at 8
steps under doubled batch is much stronger evidence than the 3-step run.

Graph path (--aug: similarity adjacency + hop reweighting + GCN backprop,
GRAPH.SAMPLER=none both sides; 08-20, fp32 CPU):

    moco+graph  5 steps batch 8   0.103 vs control 0.400
    moco+graph  8 steps batch 16  0.155 vs control 0.249

both at --size 32 --aug_points 5 9: the reference's OWN geometry
constraint forces dropping base.14 at micro inputs (g_q halves channels
then MaxPool3d((1,2,2)), temporal_graph.py:76-86 — at size 32, base.14
sits at 1x1 spatial and the pool emits size 0).  The full three-point
stack needs --size >= 64, and there the metric SATURATES: the reference
against ITSELF under a 1e-4 perturbation reaches ~sqrt(2) (= fully
decorrelated updates) within 3 steps (3/5/8-step controls 1.405/1.497/
1.504; ours lands AT that floor, 1.270/1.467/1.475) — backprop through
the similarity graph at 8x8..2x2 pooled spatial is hyper-chaotic and no
implementation can track it, so the sub-saturated two-point rows above
are the informative graph-path evidence at long horizon.

Run (CPU, ~4-8 min each):
    PYTHONPATH= JAX_PLATFORMS=cpu python tools/step_parity.py --steps 3
    PYTHONPATH= JAX_PLATFORMS=cpu python tools/step_parity.py --regime moco --steps 3
    PYTHONPATH= JAX_PLATFORMS=cpu python tools/step_parity.py --regime bank --steps 3
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_ROOT = "/root/reference"

# When set (by main, from --aug_points), the reference wrapper only wraps
# these dotted stage names — lockstep twin of cfg.GRAPH.AUG_POINTS.
_AUG_STAGE_ALLOWLIST = None


def build_cfg(args):
    from video_graph_ssl_tpu.config import cfg as CFG

    c = CFG.clone()
    c.defrost()
    c.MODEL.BACKBONE = "S3D"
    c.MODEL.BACKBONE_TYPE = "3D"
    c.MODEL.AUG_FLAG = bool(args.aug)
    if args.aug:
        # Deterministic lockstep: no stochastic adjacency draw on either
        # side (torch/jax PRNGs cannot be synchronized).  The similarity
        # adjacency + hop reweighting + GCN stack still run — and train.
        c.GRAPH.SAMPLER = "none"
        if args.aug_points:
            # Same subset on both sides (the reference wrapper is filtered
            # in _patch_reference_graph via _AUG_STAGE_ALLOWLIST).  Needed
            # for micro-geometry runs: the reference's g_q REQUIRES >=2x2
            # spatial at every wrapped stage (conv halves channels, then
            # MaxPool3d((1,2,2)) — temporal_graph.py:76-86), and S3D
            # base.14 sits at size/32, so size-32 inputs must drop it.
            c.GRAPH.AUG_POINTS = tuple(args.aug_points)
    c.MODEL.DROPOUT = 0.0          # dropout off -> deterministic
    c.MODEL.PRETRAINED = False
    c.INPUT.MODALITY = "RGB"
    c.INPUT.VIDEO_LENGTH = args.frames
    if args.regime.startswith("cmc_"):
        # CMC: two-modality contrast (reference memory dispatch:
        # lib/memory/build.py:5-13 — CMCMoCo/CMCMem when
        # CROSS.MODALITY!='visual')
        c.CONTRAST.MEM_TYPE = args.regime[len("cmc_"):]
        c.CROSS.MODALITY = "diff"
    else:
        c.CONTRAST.MEM_TYPE = args.regime
    c.CONTRAST.NCE_K = 64
    c.CONTRAST.NCE_T = 0.07
    c.CONTRAST.NCE_M = 0.5
    c.CONTRAST.ALPHA = 0.999
    c.CROSS.CRITERION = "crossentropy"
    c.CROSS.FEAT_DIM = args.hid_dim
    c.SOLVER.NO_PARTIALBN = True   # partial-BN off on both sides
    c.SOLVER.USE_TRICK = False     # the shipped configs' path
    c.SOLVER.BASE_LR = args.lr
    c.SOLVER.MOMENTUM = 0.9
    c.SOLVER.WEIGHT_DECAY = args.wd
    c.SOLVER.WEIGHT_DECAY_BIAS = 0.0
    c.SOLVER.BIAS_LR_FACTOR = 2
    c.SOLVER.NESTEROV = False
    c.SOLVER.CLIP_GRADIENT = "none"
    c.TPU.COMPUTE_DTYPE = "float32"
    return c


def _patch_reference_graph():
    """Make the reference's graph-aug path constructible and deterministic.

    The shipped code cannot build the GCA variant at all:
      * ``TemporalGraphAug.__init__`` calls ``self.reset_parameter`` but the
        method is named ``reset_parameters`` (temporal_graph.py:115,123 vs
        129) — AttributeError;
      * ``build_aug_block`` (lib/ops/build.py:9-32) wraps only the LAST
        listed stage (the wrap logic sits outside the loop) and its dotted-
        name for/else re-getattrs the full dotted string — AttributeError;
        it also reads ``module.in_channels`` which inception blocks lack.
    Intended semantics installed here: every named stage M becomes
    ``Sequential(TemporalGraphAug(in_ch(M)), M)`` — matching our
    aug_points insertion (models/s3d.py).  For the lockstep run the
    RelaxedBernoulli rsample (temporal_graph.py:187-192) is the identity,
    matching GRAPH.SAMPLER='none' on our side.
    """
    from torch import nn

    import lib.ops.module_wrappers.temporal_graph as ref_tg

    ref_tg.TemporalGraphAug.reset_parameter = \
        ref_tg.TemporalGraphAug.reset_parameters
    ref_tg.TemporalGraphAug._sample_adj_with_rel_ber = \
        lambda self, adj: adj

    def fixed_build_aug_block(base_model, module_name_list, n_segments):
        if _AUG_STAGE_ALLOWLIST is not None:
            module_name_list = [m for m in module_name_list
                                if m in _AUG_STAGE_ALLOWLIST]
        for module_name in module_name_list:
            parts = module_name.split(".")
            parent = base_model
            for p in parts[:-1]:
                parent = getattr(parent, p)
            module = getattr(parent, parts[-1])
            in_channels = next(m.in_channels for m in module.modules()
                               if isinstance(m, nn.Conv3d))
            setattr(parent, parts[-1], nn.Sequential(
                ref_tg.TemporalGraphAug(in_channels=in_channels), module))
        return base_model

    import lib.modeling.visual_wrappers as vw

    vw.build_aug_block = fixed_build_aug_block

    # cfg.MODEL.AUG_FLAG is never threaded through the reference's model
    # factory (lib/modeling/build.py:17-31 builds VisualModelWrapper
    # without aug_flag, so the shipped build can never enable the paper's
    # own graph module) — force the intended aug_flag=True construction.
    import lib.modeling.build as ref_build

    class _AugVisualModelWrapper(vw.VisualModelWrapper):
        def __init__(self, *a, **kw):
            kw["aug_flag"] = True
            super().__init__(*a, **kw)

    ref_build.VisualModelWrapper = _AugVisualModelWrapper


def _np_temporal_diff(x: np.ndarray) -> np.ndarray:
    """numpy twin of models.wrappers.temporal_diff (the modality-2 stream):
    adjacent-frame differences along T, front-padded to preserve shape."""
    d = x[:, 1:] - x[:, :-1]
    return np.concatenate([d[:, :1], d], axis=1).astype(x.dtype)


def run_reference_cmc(cfg, batches, steps, perturb=0.0, seed=0,
                      fixed_neg_idx=None):
    """N CMC steps with the reference memory/criterion executed as ground
    truth, composed the way the reference's build dispatch intends
    (lib/memory/build.py:5-13 selects CMCMoCo/CMCMem when
    CROSS.MODALITY!='visual'; its tools never build the second encoder, so
    the model composition here is the natural container: one GraphWrapper
    stack per modality, the modality-2 stream being the temporal
    difference — matching our models.wrappers.CmcWrapper).

    moco: training order follows _train_moco (tools/train_video_contrast_
    dis.py:374-466) with the four-stream CMCMoCo forward (mem_moco.py:
    101-142): no-grad EMA keys k1/k2 from view 2, query passes q1/q2 from
    view 1, loss = CE(logits1) + CE(logits2), post-step EMA momentum update
    on both stacks.

    bank: _train_ins order (:292-341) with the two-stream CMCMem forward
    (mem_bank.py:107-154): one view, cross-modal logits against the OTHER
    modality's memory rows, both memories EMA-updated; the alias draw is
    PINNED to the shared ``fixed_neg_idx`` matrix (same reasoning as the
    single-modality bank regime)."""
    import torch
    from torch import nn

    sys.path.insert(0, REF_ROOT)
    from lib.modeling.build import create_visual_model as ref_create
    from lib.solver.build import make_optimizer as ref_make_optimizer

    torch.Tensor.cuda = lambda self, *a, **kw: self  # CPU ground-truth run
    from lib.memory.alias_multinomial import AliasMethod
    AliasMethod.cuda = lambda self, *a, **kw: None
    from lib.memory.build import create_contrast, create_criterion

    mem_type = str(cfg.CONTRAST.MEM_TYPE)
    n_data = batches[0][0].shape[0]

    torch.manual_seed(seed)
    container = nn.Module()
    emas = {}
    for stack in ("model_1", "model_2"):
        m, e = ref_create(cfg)
        setattr(container, stack, m)
        if mem_type == "moco":
            with torch.no_grad():
                for p1, p2 in zip(m.parameters(), e.parameters()):
                    p2.copy_(p1)
            e.eval()
            for mod in e.modules():
                if "BatchNorm" in mod.__class__.__name__:
                    mod.train()
            emas[stack] = e
    container.train()
    opt = ref_make_optimizer(cfg, container)
    contrast = create_contrast(cfg, n_data=n_data)  # CMCMoCo / CMCMem
    criterion = create_criterion(cfg, n_data=n_data)
    if mem_type == "bank":
        flat = torch.from_numpy(
            np.ascontiguousarray(fixed_neg_idx.reshape(-1))).long()
        contrast.multinomial.draw = lambda n: flat[:n].clone()

    sd0 = {k: v.detach().clone().numpy()
           for k, v in container.state_dict().items()}
    payload0 = {
        "state_dict": sd0,
        "contrast": {k: v.detach().clone().numpy()
                     for k, v in contrast.state_dict().items()},
    }
    if mem_type == "moco":
        payload0["model_ema"] = {
            f"{s}.{k}": v.detach().clone().numpy()
            for s, e in emas.items() for k, v in e.state_dict().items()}

    gp = np.random.default_rng(1234)
    alpha = float(cfg.CONTRAST.ALPHA)
    losses = []
    for i in range(steps):
        x1, x2 = batches[i]
        if perturb:
            x1 = x1 * (1 + perturb * gp.normal(size=x1.shape)
                       ).astype(np.float32)
            x2 = x2 * (1 + perturb * gp.normal(size=x2.shape)
                       ).astype(np.float32)

        def to_t(x):
            return torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))

        if mem_type == "bank":
            # one view per sample; single process, so the all_* gathers
            # are the locals themselves (mem_bank.py:144-149)
            index = torch.arange(x1.shape[0], dtype=torch.long)
            opt.zero_grad()
            f1 = container.model_1(to_t(x1))
            f2 = container.model_2(to_t(_np_temporal_diff(x1)))
            out1, out2, _labels = contrast(f1, f2, index)
            loss = criterion(out1) + criterion(out2)
        else:
            with torch.no_grad():
                k1 = emas["model_1"](to_t(x2))
                k2 = emas["model_2"](to_t(_np_temporal_diff(x2)))
            opt.zero_grad()
            q1 = container.model_1(to_t(x1))
            q2 = container.model_2(to_t(_np_temporal_diff(x1)))
            out1, out2, _labels = contrast(q1, k1, q2, k2)
            loss = criterion(out1) + criterion(out2)
        loss.backward()
        opt.step()
        if mem_type == "moco":
            with torch.no_grad():
                for stack in ("model_1", "model_2"):
                    for p1, p2 in zip(getattr(container, stack).parameters(),
                                      emas[stack].parameters()):
                        p2.mul_(alpha).add_(p1, alpha=1.0 - alpha)
        losses.append(float(loss.detach()))
    sd_after = {k: v.detach().clone().numpy()
                for k, v in container.state_dict().items()}
    return np.asarray(losses), payload0, sd_after


def run_reference(cfg, batches, steps, perturb=0.0, seed=0,
                  fixed_neg_idx=None):
    """N steps of the reference GraphWrapper(SimSiam) under its own
    make_optimizer; returns per-step losses and before/after weights.

    ``perturb`` adds relative input noise of that scale — the chaos
    CONTROL: rerunning the reference against itself with a perturbation
    matching the measured cross-implementation forward noise calibrates
    how much update deviation the micro-geometry's conditioning (batch-N
    BatchNorm statistics, ReLU boundary flips in the MLP head) produces
    for reasons other than recipe differences."""
    import torch

    sys.path.insert(0, REF_ROOT)
    if bool(cfg.MODEL.AUG_FLAG):
        _patch_reference_graph()
    from lib.modeling.build import create_visual_model as ref_create
    from lib.solver.build import make_optimizer as ref_make_optimizer

    torch.manual_seed(seed)
    model, _ema = ref_create(cfg)
    model.train()
    opt = ref_make_optimizer(cfg, model)
    # snapshot the INITIAL weights (training below mutates in place)
    sd0 = {k: v.detach().clone().numpy()
           for k, v in model.state_dict().items()}

    mem_type = str(cfg.CONTRAST.MEM_TYPE)
    payload0 = {"state_dict": sd0}
    contrast = None
    n_data = batches[0][0].shape[0]  # bank: one memory row per sample
    if mem_type == "bank":
        # cuda shims for the CPU ground-truth run (mem_bank.py:49,80;
        # alias_multinomial hardcodes .cuda() too)
        torch.Tensor.cuda = lambda self, *a, **kw: self
        from lib.memory.alias_multinomial import AliasMethod
        AliasMethod.cuda = lambda self, *a, **kw: None
        from lib.memory.build import create_contrast, create_criterion

        contrast = create_contrast(cfg, n_data=n_data)
        criterion = create_criterion(cfg, n_data=n_data)
        # PIN the alias-sampled negatives to the shared matrix: the draw
        # is the only stochastic input to the bank step, and torch/jax
        # PRNGs cannot be synchronized — both frameworks get the same
        # (B, K+1) index matrix (slot 0 is overwritten by y either way,
        # mem_bank.py:69 / memory/bank.py:57).
        flat = torch.from_numpy(
            np.ascontiguousarray(fixed_neg_idx.reshape(-1))).long()
        contrast.multinomial.draw = lambda n: flat[:n].clone()
        payload0["contrast"] = {
            k: v.detach().clone().numpy()
            for k, v in contrast.state_dict().items()}
    if mem_type == "moco":
        # reference memory/criterion hardcode .cuda(); no-op shim for the
        # CPU ground-truth run (mem_moco.py:78, criterion.py:43)
        torch.Tensor.cuda = lambda self, *a, **kw: self
        from lib.memory.build import create_contrast, create_criterion

        contrast = create_contrast(cfg, n_data=1)
        criterion = create_criterion(cfg, n_data=1)
        # EMA starts as an exact copy (_momentum_update(..., 0), :145-146);
        # eval + BN kept in train mode (set_bn_train, :381-389)
        with torch.no_grad():
            for p1, p2 in zip(model.parameters(), _ema.parameters()):
                p2.copy_(p1)
        _ema.eval()
        for m in _ema.modules():
            if "BatchNorm" in m.__class__.__name__:
                m.train()
        payload0["model_ema"] = {
            k: v.detach().clone().numpy()
            for k, v in _ema.state_dict().items()}
        payload0["contrast"] = {
            k: v.detach().clone().numpy()
            for k, v in contrast.state_dict().items()}

    gp = np.random.default_rng(1234)
    losses = []
    for i in range(steps):
        x1, x2 = batches[i]
        if perturb:
            x1 = x1 * (1 + perturb * gp.normal(size=x1.shape)
                       ).astype(np.float32)
            x2 = x2 * (1 + perturb * gp.normal(size=x2.shape)
                       ).astype(np.float32)
        xt1 = torch.from_numpy(np.transpose(x1, (0, 4, 1, 2, 3)))
        xt2 = torch.from_numpy(np.transpose(x2, (0, 4, 1, 2, 3)))
        if mem_type == "bank":
            # _train_ins order (:292-341); single process, so the
            # all_feat/all_index gathers are feat/index themselves.
            # One view per sample — the intended bank semantics (a 3D
            # backbone cannot take the dataset's channel-concat pair).
            index = torch.arange(xt1.shape[0], dtype=torch.long)
            opt.zero_grad()
            feat = model(xt1)
            out, _labels = contrast(feat, index, None, feat, index)
            loss = criterion(out)
        elif mem_type == "moco":
            # _train_moco order (:396-441); single process, so ShuffleBN is
            # the identity wrapper around the EMA forward (:189-230) and
            # the all_k gather is feat_k itself
            with torch.no_grad():
                feat_k = _ema(xt2)
            opt.zero_grad()
            feat_q = model(xt1)
            out, _labels = contrast(feat_q, feat_k, all_k=feat_k)
            loss = criterion(out)
        else:
            # _train_simsiam feeds the channel-concat pair (SimSiam.forward
            # chunks dim=1, graph_wrappers.py:57)
            opt.zero_grad()  # intended semantics (see module docstring)
            loss = model(torch.cat([xt1, xt2], dim=1))
        loss.backward()
        opt.step()
        if mem_type == "moco":
            # update momentum encoder post-step (:437-441)
            with torch.no_grad():
                a = float(cfg.CONTRAST.ALPHA)
                for p1, p2 in zip(model.parameters(), _ema.parameters()):
                    p2.mul_(a).add_(p1, alpha=1.0 - a)
        losses.append(float(loss.detach()))
    sd_after = {k: v.detach().clone().numpy()
                for k, v in model.state_dict().items()}
    return np.asarray(losses), payload0, sd_after


def run_ours(cfg, payload0, batches, steps, fixed_neg_idx=None):
    """Same N steps through the PRODUCTION engine step
    (engine.make_pretrain_step — the exact function the trainer jits,
    minus the on-device augmentation seam), starting from the torch
    model's exact initial weights/EMA/queue (ckpt_convert graft)."""
    import jax
    import jax.numpy as jnp

    from video_graph_ssl_tpu.engine import (
        create_pretrain_state,
        make_pretrain_step,
    )
    from video_graph_ssl_tpu.models import create_visual_model
    from video_graph_ssl_tpu.utils.ckpt_convert import graft_pretrain_state

    model, _ = create_visual_model(cfg)
    b, t = batches[0][0].shape[0], batches[0][0].shape[1]
    hw = batches[0][0].shape[2:4]
    # simsiam models take the views axis; moco/bank encoders take one view
    # (engine/build.py: create_pretrain_state docstring)
    mem_type = str(cfg.CONTRAST.MEM_TYPE)
    cmc = str(cfg.CROSS.MODALITY) != "visual"
    n_data = b if mem_type == "bank" else 1
    example = np.zeros(
        (b, 2, t, *hw, 3) if mem_type == "simsiam"
        else (b, t, *hw, 3), np.float32)
    state, tx = create_pretrain_state(cfg, model, example, n_data=n_data)
    state, _notes = graft_pretrain_state(state, payload0, cfg)

    if mem_type == "bank":
        # Pin the sampled negatives to the SAME matrix the reference got
        # (see run_reference) — patched before tracing, so the jitted
        # step bakes the shared indices in; slot 0 is still overwritten
        # by y exactly like memory/bank.py:57.
        from video_graph_ssl_tpu.engine import pretrain as eng

        fixed = jnp.asarray(fixed_neg_idx, jnp.int32)

        def pinned_bank_logits(bstate, x, y, key, K, T, alias=None):
            idx = fixed.at[:, 0].set(y.astype(fixed.dtype))
            w = bstate.memory[idx]
            logits = jnp.einsum("bkd,bd->bk", w, x,
                                preferred_element_type=jnp.float32) / T
            return logits, jnp.zeros((x.shape[0],), jnp.int32)

        def pinned_cmc_bank_logits(cstate, x1, x2, y, key, K, T):
            # same single idx matrix for both cross-modal selects
            # (reference: mem_bank.py:124-130 draws once)
            idx = fixed.at[:, 0].set(y.astype(fixed.dtype))
            w1 = cstate.memory_1[idx]
            w2 = cstate.memory_2[idx]
            l1 = jnp.einsum("bkd,bd->bk", w2, x1,
                            preferred_element_type=jnp.float32) / T
            l2 = jnp.einsum("bkd,bd->bk", w1, x2,
                            preferred_element_type=jnp.float32) / T
            return l1, l2, jnp.zeros((x1.shape[0],), jnp.int32)

        if cmc:
            eng.cmc_bank_logits = pinned_cmc_bank_logits
        else:
            eng.bank_logits = pinned_bank_logits

    step = jax.jit(make_pretrain_step(cfg, model, tx, n_data=n_data))
    lr = float(cfg.SOLVER.BASE_LR)

    losses = []
    for i in range(steps):
        x1, x2 = batches[i]
        batch = {"clips": jnp.asarray(np.stack([x1, x2], axis=1)),
                 "label": jnp.zeros(b, jnp.int32),
                 "index": jnp.arange(b, dtype=jnp.int32)}
        state, metrics = step(state, batch, lr)
        losses.append(float(metrics["loss"]))

    from flax import serialization

    from video_graph_ssl_tpu.utils.ckpt_convert import (
        export_cmc_pretrain_to_torch, export_pretrain_to_torch)

    p_after = serialization.to_state_dict(state.params)
    s_after = serialization.to_state_dict(state.batch_stats)
    if cmc:
        sd_after = export_cmc_pretrain_to_torch(p_after, s_after)
    else:
        sd_after = export_pretrain_to_torch(p_after, s_after,
                                            str(cfg.CONTRAST.MEM_TYPE))
    return np.asarray(losses), sd_after


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--regime",
                    choices=["simsiam", "moco", "bank", "cmc_moco",
                             "cmc_bank"],
                    default="simsiam")
    ap.add_argument("--aug", action="store_true",
                    help="MODEL.AUG_FLAG=True: lockstep through the GCA "
                         "graph path (similarity adjacency + GCN), "
                         "deterministic via GRAPH.SAMPLER=none on both "
                         "sides (see _patch_reference_graph)")
    ap.add_argument("--aug_points", nargs="*", type=int, default=[],
                    help="restrict the graph blocks to these S3D base "
                         "indices on BOTH sides (e.g. 5 9); empty = the "
                         "full reference list (5 9 14), which needs "
                         "--size >= 64")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--hid_dim", type=int, default=64)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--wd", type=float, default=1e-4)
    ap.add_argument("--tol", type=float, default=0.02,
                    help="absolute floor for the pass threshold")
    ap.add_argument("--control_eps", type=float, default=1e-4,
                    help="relative input perturbation for the reference-vs-"
                         "reference chaos control; the default sits WELL "
                         "BELOW the measured ~2e-3 cross-implementation "
                         "forward noise, making the control conservative")
    ap.add_argument("--control_factor", type=float, default=3.0,
                    help="pass if ours-vs-reference deviation <= factor x "
                         "the control deviation (or <= --tol)")
    args = ap.parse_args(argv)

    if args.aug and args.aug_points:
        global _AUG_STAGE_ALLOWLIST
        _AUG_STAGE_ALLOWLIST = {f"base.{i}" for i in args.aug_points}

    cfg = build_cfg(args)
    g = np.random.default_rng(7)
    batches = [
        (g.normal(0, 1, (args.batch, args.frames, args.size, args.size, 3)
                  ).astype(np.float32),
         g.normal(0, 1, (args.batch, args.frames, args.size, args.size, 3)
                  ).astype(np.float32))
        for _ in range(args.steps)
    ]

    # bank: one shared negative-index matrix for BOTH frameworks (the
    # alias draw is the regime's only stochastic input)
    fixed_neg_idx = g.integers(
        0, args.batch, (args.batch, int(cfg.CONTRAST.NCE_K) + 1)
    ).astype(np.int64) if args.regime.endswith("bank") else None

    if args.regime.startswith("cmc_"):
        ref_losses, payload0, ref_after = run_reference_cmc(
            cfg, batches, args.steps, fixed_neg_idx=fixed_neg_idx)
        ctl_losses, _p0c, ctl_after = run_reference_cmc(
            cfg, batches, args.steps, perturb=args.control_eps,
            fixed_neg_idx=fixed_neg_idx)
    else:
        ref_losses, payload0, ref_after = run_reference(
            cfg, batches, args.steps, fixed_neg_idx=fixed_neg_idx)
        ctl_losses, _p0c, ctl_after = run_reference(
            cfg, batches, args.steps, perturb=args.control_eps,
            fixed_neg_idx=fixed_neg_idx)
    our_losses, our_after = run_ours(cfg, payload0, batches, args.steps,
                                     fixed_neg_idx=fixed_neg_idx)
    sd0 = payload0["state_dict"]

    print(f"\n{'step':<6}{'reference':>12}{'ours':>12}{'|diff|':>12}"
          f"{'ctl |diff|':>12}")
    for i, (a, b, c) in enumerate(zip(ref_losses, our_losses, ctl_losses)):
        print(f"{i:<6}{a:>12.6f}{b:>12.6f}{abs(a - b):>12.2e}"
              f"{abs(a - c):>12.2e}")

    def tracking_ratio(after):
        # over trainable params (running stats excluded: their momentum
        # bookkeeping is covered by unit tests, and at momentum 0.001 the
        # N-step displacement is float-noise dominated)
        num = den = 0.0
        for k in after:
            if "running_" in k or "num_batches" in k:
                continue
            d = after[k].astype(np.float64) - sd0[k].astype(np.float64)
            d_ref = ref_after[k].astype(np.float64) - sd0[k].astype(np.float64)
            num += float(np.sum((d - d_ref) ** 2))
            den += float(np.sum(d_ref ** 2))
        return (num / max(den, 1e-24)) ** 0.5

    ratio_ours = tracking_ratio(our_after)
    ratio_ctl = tracking_ratio(ctl_after)
    threshold = max(args.tol, args.control_factor * ratio_ctl)
    ok = ratio_ours <= threshold
    print(f"\nupdate-tracking deviation ||d - d_ref|| / ||d_ref|| over "
          f"{args.steps} steps:")
    print(f"  ours vs reference:            {ratio_ours:.3e}")
    print(f"  reference vs itself (eps={args.control_eps:g} input "
          f"perturbation): {ratio_ctl:.3e}")
    print(f"  pass threshold max(tol={args.tol}, "
          f"{args.control_factor:g} x control) = {threshold:.3e}")
    print("STEP_PARITY_OK" if ok else "STEP_PARITY_FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
