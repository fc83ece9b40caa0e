"""SSL pretraining steps (moco / bank / simsiam), jitted and mesh-sharded.

TPU-native counterpart of the reference Trainer's hot loops
(tools/train_video_contrast_dis.py:292-530).  Each regime is ONE jitted
function over (TrainState, batch, lr):

* the batch arrives sharded over the ``data`` mesh axis; all reference
  collectives disappear into XLA — ``_global_gather`` of keys/features
  (:182-187) is just the global-view batch, DDP's gradient allreduce is the
  implicit psum of the sharded loss gradient, and ShuffleBN (:189-231) is
  superseded by global-batch BN statistics (every BN reduction spans the
  whole global batch, so no per-device stat leak exists).
* the EMA encoder, MoCo queue and memory bank are TrainState fields updated
  functionally in the same step (no ``torch.no_grad`` bookkeeping).
* the TrainState is donated: queue/bank/EMA updates are in-place in HBM.

Batch contract: ``{'clips': (B, V, T, H, W, C) float, 'label': (B,),
'index': (B,)}`` with V=2 views for moco/simsiam/bank (the reference
concatenates views on the channel dim instead,
video_contrast_dataset.py:202).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..memory.bank import (bank_logits, bank_update, cmc_bank_logits,
                           cmc_bank_update)
from ..memory.criterion import nce_criterion, nce_softmax_loss
from ..memory.moco import (cmc_moco_enqueue, cmc_moco_forward, moco_enqueue,
                           moco_logits)
from ..solver.build import set_learning_rate
from .train_state import TrainState, ema_update


def topk_accuracy(logits: jnp.ndarray, labels: jnp.ndarray,
                  ks=(1, 5)) -> Dict[str, jnp.ndarray]:
    """top-k accuracy in percent (reference: lib/evaluation/metric.py:44-67).

    Rank-counting instead of argsort: the label is in the descending
    top-k iff (#strictly-greater logits) + (#equal logits at an earlier
    index) < k — exactly a stable ``argsort(-logits)``'s placement, but
    it lowers to two fusable compare+reduce passes.  The full (B, K+1)
    sort this replaces cost ~2 ms/step at the MoCo queue width (profiled
    08-18, v5e chrome trace: ``sort`` = 1.99 ms/step at (128, 16385))."""
    pos = jnp.take_along_axis(logits, labels[:, None], axis=-1)
    idx = jnp.arange(logits.shape[-1])
    greater = jnp.sum((logits > pos).astype(jnp.int32), axis=-1)
    ties_before = jnp.sum(((logits == pos) & (idx < labels[:, None]))
                          .astype(jnp.int32), axis=-1)
    rank = greater + ties_before
    out = {}
    for k in ks:
        hit = rank < k
        out[f"top{k}"] = jnp.mean(hit.astype(jnp.float32)) * 100.0
    return out


def _apply_kwargs(state: TrainState, params, batch_stats, train: bool):
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    kw: Dict[str, Any] = dict(train=train)
    if train:
        kw["rngs"] = state.step_rngs("dropout", "graph")
        kw["mutable"] = ["batch_stats"] if batch_stats is not None else []
    return variables, kw


def _update(state: TrainState, tx, grads, new_batch_stats, lr,
            **replacements) -> TrainState:
    opt_state = set_learning_rate(state.opt_state, lr)
    updates, opt_state = tx.update(grads, opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(
        step=state.step + 1,
        params=params,
        batch_stats=new_batch_stats,
        opt_state=opt_state,
        **replacements,
    )


# --------------------------------------------------------------------------- #
# SimSiam — loss computed inside the model (reference: _train_simsiam,
# train_video_contrast_dis.py:468-530)
# --------------------------------------------------------------------------- #
def make_simsiam_step(model, tx) -> Callable:
    def step(state: TrainState, batch, lr) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            variables, kw = _apply_kwargs(state, params, state.batch_stats, True)
            loss, muts = model.apply(variables, batch["clips"], **kw)
            return loss, muts["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = _update(state, tx, grads, new_bs, lr)
        return new_state, {"loss": loss}

    return step


# --------------------------------------------------------------------------- #
# MoCo — query encoder + EMA key encoder + queue (reference: _train_moco,
# train_video_contrast_dis.py:374-466)
# --------------------------------------------------------------------------- #
def make_moco_step(model, tx, T: float, alpha: float,
                   mesh=None, shuffle_bn: bool = False) -> Callable:
    def step(state: TrainState, batch, lr) -> Tuple[TrainState, Dict]:
        x1 = batch["clips"][:, 0]
        x2 = batch["clips"][:, 1]

        # Key path: EMA params, no grad; BN stays in train mode exactly like
        # the reference's set_bn_train on the EMA model (:385-389).  Default:
        # BN reductions span the global batch (ShuffleBN replacement);
        # TPU.SHUFFLE_BN switches to per-chip BN with a global shuffle.
        if shuffle_bn:
            from ..parallel.shuffle_bn import shuffle_bn_apply

            shuffle_key = jax.random.fold_in(
                jax.random.fold_in(state.rng, state.step), 29)
            feat_k, ema_stats = shuffle_bn_apply(
                model, state.ema_params, state.ema_batch_stats, x2,
                shuffle_key, mesh,
                rngs=state.step_rngs("dropout", "graph"))
            ema_muts = {"batch_stats": ema_stats}
        else:
            variables, kw = _apply_kwargs(state, state.ema_params,
                                          state.ema_batch_stats, True)
            feat_k, ema_muts = model.apply(variables, x2, **kw)
        feat_k = jax.lax.stop_gradient(feat_k)

        def loss_fn(params):
            v, kw2 = _apply_kwargs(state, params, state.batch_stats, True)
            feat_q, muts = model.apply(v, x1, **kw2)
            logits, labels = moco_logits(feat_q, feat_k,
                                         state.contrast.queue, T)
            return nce_softmax_loss(logits), (muts["batch_stats"], logits, labels)

        (loss, (new_bs, logits, labels)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # all_k == the full (global) key batch under global-view jit
        # (reference gathers explicitly, :182-187,407).
        contrast = moco_enqueue(state.contrast, feat_k)

        new_state = _update(
            state, tx, grads, new_bs, lr,
            ema_batch_stats=ema_muts["batch_stats"],
            contrast=contrast,
        )
        # EMA after the optimizer step, mixing the UPDATED params
        # (reference: _momentum_update runs post-step, :437-440).
        new_state = new_state.replace(
            ema_params=ema_update(new_state.params, state.ema_params, alpha))
        metrics = {"loss": loss, **topk_accuracy(logits, labels)}
        return new_state, metrics

    return step


# --------------------------------------------------------------------------- #
# Instance-discrimination memory bank (reference: _train_ins,
# train_video_contrast_dis.py:292-372)
# --------------------------------------------------------------------------- #
def make_bank_step(model, tx, K: int, T: float, m: float, n_data: int,
                   criterion: str = "crossentropy") -> Callable:
    def step(state: TrainState, batch, lr) -> Tuple[TrainState, Dict]:
        x = batch["clips"][:, 0]
        index = batch["index"]
        sample_key = jax.random.fold_in(
            jax.random.fold_in(state.rng, state.step), 7)

        def loss_fn(params):
            v, kw = _apply_kwargs(state, params, state.batch_stats, True)
            feat, muts = model.apply(v, x, **kw)
            logits, labels = bank_logits(state.contrast, feat, index,
                                         sample_key, K, T)
            if criterion == "NCE":
                # Reference feeds the raw (dot/T) scores straight into
                # NCECriterion (mem_bank.py:30-40 + criterion.py:8-31).
                loss = nce_criterion(logits, n_data)
            else:
                loss = nce_softmax_loss(logits)
            return loss, (muts["batch_stats"], feat, logits, labels)

        (loss, (new_bs, feat, logits, labels)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # Global-view feat/index == the reference's all_gathered versions
        # (:319-320, mem_bank.py:82-83).
        contrast = bank_update(state.contrast, feat, index, m)
        new_state = _update(state, tx, grads, new_bs, lr, contrast=contrast)
        metrics = {"loss": loss, **topk_accuracy(logits, labels)}
        return new_state, metrics

    return step


# --------------------------------------------------------------------------- #
# CMC (CROSS.MODALITY != 'visual'): two-modality contrast.  The reference
# ships the CMC memories/criteria (mem_moco.py:91-142, mem_bank.py:93-154)
# but its tools never wire them; here both regimes run end-to-end with the
# RGB + temporal-difference modality pair (models.wrappers.CmcWrapper).
# --------------------------------------------------------------------------- #
def make_cmc_moco_step(model, tx, T: float, alpha: float) -> Callable:
    """Four-stream CMC MoCo: q1/q2 from view 1 with grads, k1/k2 from view 2
    via the EMA encoders; each modality scored against the OTHER modality's
    keys+queue (reference: CMCMoCo.forward, mem_moco.py:101-142)."""
    def step(state: TrainState, batch, lr) -> Tuple[TrainState, Dict]:
        x1 = batch["clips"][:, 0]
        x2 = batch["clips"][:, 1]

        variables, kw = _apply_kwargs(state, state.ema_params,
                                      state.ema_batch_stats, True)
        (k1, k2), ema_muts = model.apply(variables, x2, **kw)
        k1 = jax.lax.stop_gradient(k1)
        k2 = jax.lax.stop_gradient(k2)

        def loss_fn(params):
            v, kw2 = _apply_kwargs(state, params, state.batch_stats, True)
            (q1, q2), muts = model.apply(v, x1, **kw2)
            l1, l2, labels = cmc_moco_forward(state.contrast, q1, k1, q2,
                                              k2, T)
            loss = nce_softmax_loss(l1) + nce_softmax_loss(l2)
            return loss, (muts["batch_stats"], l1, l2, labels)

        (loss, (new_bs, l1, l2, labels)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        contrast = cmc_moco_enqueue(state.contrast, k1, k2)
        new_state = _update(
            state, tx, grads, new_bs, lr,
            ema_batch_stats=ema_muts["batch_stats"],
            contrast=contrast,
        )
        new_state = new_state.replace(
            ema_params=ema_update(new_state.params, state.ema_params, alpha))
        # top-k over the modality-1 stream (reference logs one stream too)
        metrics = {"loss": loss, **topk_accuracy(l1, labels)}
        return new_state, metrics

    return step


def make_cmc_bank_step(model, tx, K: int, T: float, m: float, n_data: int,
                       criterion: str = "crossentropy") -> Callable:
    """Two-stream CMC bank NCE: each modality's features scored against the
    other modality's memory rows (reference: CMCMem.forward,
    mem_bank.py:107-141); both memories EMA-updated with the batch."""
    def step(state: TrainState, batch, lr) -> Tuple[TrainState, Dict]:
        x = batch["clips"][:, 0]
        index = batch["index"]
        sample_key = jax.random.fold_in(
            jax.random.fold_in(state.rng, state.step), 7)

        def loss_fn(params):
            v, kw = _apply_kwargs(state, params, state.batch_stats, True)
            (f1, f2), muts = model.apply(v, x, **kw)
            l1, l2, labels = cmc_bank_logits(state.contrast, f1, f2, index,
                                             sample_key, K, T)
            if criterion == "NCE":
                loss = nce_criterion(l1, n_data) + nce_criterion(l2, n_data)
            else:
                loss = nce_softmax_loss(l1) + nce_softmax_loss(l2)
            return loss, (muts["batch_stats"], f1, f2, l1, labels)

        (loss, (new_bs, f1, f2, l1, labels)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        contrast = cmc_bank_update(state.contrast, f1, f2, index, m)
        new_state = _update(state, tx, grads, new_bs, lr, contrast=contrast)
        metrics = {"loss": loss, **topk_accuracy(l1, labels)}
        return new_state, metrics

    return step


def make_fused_pretrain_step(cfg, model, tx, n_data: int = 0,
                             mesh=None) -> Callable:
    """Pretrain step with the SSL augmentation chain fused into the same
    jitted program: raw uint8 canvas clips in, updated state out.  One XLA
    program per step — preprocessing, both encoder passes, loss, optimizer,
    and queue/bank update all fuse and overlap (the reference pays a
    separate Python/cv2 pipeline per batch, consistency_transforms.py)."""
    from ..data.transforms_device import make_batch_augment_fn

    inner = make_pretrain_step(cfg, model, tx, n_data, mesh=mesh)
    augment = make_batch_augment_fn(cfg, "ssl")

    def step(state: TrainState, raw_batch, lr):
        key = jax.random.fold_in(
            jax.random.fold_in(state.rng, state.step), 13)
        clips = augment(key, raw_batch["clips"])
        batch = dict(raw_batch, clips=clips)
        return inner(state, batch, lr)

    return step


def make_pretrain_step(cfg, model, tx, n_data: int = 0,
                       mesh=None) -> Callable:
    """Dispatch on CONTRAST.MEM_TYPE (reference: train dispatch,
    train_video_contrast_dis.py:259-268)."""
    mem_type = cfg.CONTRAST.MEM_TYPE
    if cfg.CROSS.MODALITY != "visual":
        # CMC regimes (reference memory dispatch: lib/memory/build.py:5-13)
        if mem_type == "moco":
            return make_cmc_moco_step(model, tx, float(cfg.CONTRAST.NCE_T),
                                      float(cfg.CONTRAST.ALPHA))
        if mem_type == "bank":
            return make_cmc_bank_step(
                model, tx, K=int(cfg.CONTRAST.NCE_K),
                T=float(cfg.CONTRAST.NCE_T), m=float(cfg.CONTRAST.NCE_M),
                n_data=int(n_data), criterion=cfg.CROSS.CRITERION)
        raise NotImplementedError(
            f"CMC (CROSS.MODALITY={cfg.CROSS.MODALITY!r}) supports "
            f"moco/bank, not {mem_type!r}")
    if mem_type == "simsiam":
        return make_simsiam_step(model, tx)
    if mem_type == "moco":
        shuffle_bn = bool(cfg.TPU.SHUFFLE_BN)
        if shuffle_bn and mesh is None:
            raise ValueError("TPU.SHUFFLE_BN requires passing the mesh to "
                             "make_pretrain_step")
        return make_moco_step(model, tx, float(cfg.CONTRAST.NCE_T),
                              float(cfg.CONTRAST.ALPHA),
                              mesh=mesh, shuffle_bn=shuffle_bn)
    if mem_type == "bank":
        return make_bank_step(
            model, tx,
            K=int(cfg.CONTRAST.NCE_K), T=float(cfg.CONTRAST.NCE_T),
            m=float(cfg.CONTRAST.NCE_M), n_data=int(n_data),
            criterion=cfg.CROSS.CRITERION,
        )
    raise NotImplementedError(f"Unknown Contrast type {mem_type}!")
