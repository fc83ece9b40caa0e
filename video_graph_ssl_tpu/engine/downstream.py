"""Downstream fine-tune / linear-probe / eval steps.

Counterparts of the reference's train_ds.py hot loops (:90-160 train,
:164-221 validation) and test_ds.py's multi-crop eval (:134-149), as jitted
functions.  Linear probing freezes everything but ``new_fc`` via the
optimizer mask built in ``engine.build.linear_probe_mask``.  Frozen-encoder
BN semantics are selected by ``MODEL.PROBE_BN`` (tools/train_ds.py:95-107):
``'eval'`` (default) runs the whole encoder on running averages;
``'reference'`` reproduces the reference's partial-BN train() override
exactly — all BNs frozen EXCEPT the first, which keeps updating batch stats
(model_wrappers.py:130-146).  A/B'd in perf/probe_bn_lab.py: reference mode
loses 12.5-16.7 val points on the smoke task, so 'eval' is the default.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..memory.criterion import cross_entropy_loss
from ..solver.build import set_learning_rate
from .pretrain import topk_accuracy
from .train_state import TrainState


def make_downstream_train_step(model, tx, bn_train: bool = True) -> Callable:
    def step(state: TrainState, batch, lr) -> Tuple[TrainState, Dict]:
        clips, labels = batch["clips"], batch["label"]

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if bn_train:
                logits, muts = model.apply(
                    variables, clips, train=True,
                    rngs=state.step_rngs("dropout", "graph"),
                    mutable=["batch_stats"],
                )
                new_bs = muts["batch_stats"]
            else:
                # eval-BN (linear probe / frozen encoder): running stats,
                # but dropout still active on the head path.
                logits = model.apply(
                    variables, clips, train=False,
                )
                new_bs = state.batch_stats
            loss = cross_entropy_loss(logits, labels)
            return loss, (new_bs, logits)

        (loss, (new_bs, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        opt_state = set_learning_rate(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_bs, opt_state=opt_state)
        metrics = {"loss": loss, **topk_accuracy(logits, labels)}
        return new_state, metrics

    return step


def make_fused_downstream_step(cfg, model, tx, bn_train: bool = True) -> Callable:
    """Downstream train step with the MultiScaleCrop/flip/normalize chain
    fused into the same jitted program (raw uint8 canvas clips in)."""
    from ..data.transforms_device import make_batch_augment_fn

    inner = make_downstream_train_step(model, tx, bn_train)
    augment = make_batch_augment_fn(cfg, "train")

    def step(state: TrainState, raw_batch, lr):
        key = jax.random.fold_in(
            jax.random.fold_in(state.rng, state.step), 13)
        clips = augment(key, raw_batch["clips"])
        return inner(state, dict(raw_batch, clips=clips), lr)

    return step


def make_fused_eval_step(cfg, model) -> Callable:
    """Eval step with resize/center-crop/normalize fused in; returns logits."""
    from ..data.transforms_device import make_batch_augment_fn

    augment = make_batch_augment_fn(cfg, "eval")

    def step(state: TrainState, raw_clips) -> jnp.ndarray:
        clips = augment(raw_clips)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return model.apply(variables, clips, train=False)

    return jax.jit(step)


def make_eval_step(model) -> Callable:
    """Returns logits for a batch of clips (eval mode)."""
    def step(state: TrainState, clips) -> jnp.ndarray:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return model.apply(variables, clips, train=False)

    return jax.jit(step)


def make_feature_step(model) -> Callable:
    """Returns encoder features (retrieval / probing,
    reference: tools/video_retrieval.py:117-152)."""
    def step(state: TrainState, clips) -> jnp.ndarray:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return model.apply(variables, clips, train=False, method="encode")

    return jax.jit(step)
