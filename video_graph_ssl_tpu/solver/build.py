"""Optimizer + LR schedule construction on optax.

Counterpart of lib/solver/build.py:24-59 (``make_optimizer``: bias params get
lr×BIAS_LR_FACTOR and WEIGHT_DECAY_BIAS; SGD(momentum, nesterov) or a named
optimizer) and lib/solver/lr_scheduler.py:8-69 (``WarmupMultiStepLR``:
constant/linear warmup composed with step/poly/cos decay, stepped per
epoch).

TPU-native shape: the schedule is a pure function ``epoch -> lr`` evaluated
host-side; the lr enters the jitted train step as a traced scalar argument,
so changing it never recompiles.  Per-group behavior (bias lr factor,
per-group weight decay, frozen masks for linear probing / partial BN) is
expressed with optax masks over the param pytree instead of torch param
groups.
"""

from __future__ import annotations

import math
from bisect import bisect_right
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


# --------------------------------------------------------------------------- #
# Param labeling
# --------------------------------------------------------------------------- #
def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def label_params(params) -> Any:
    """Label every leaf as 'bias' | 'weight' by its tree path — EXACTLY the
    reference's non-trick grouping (lib/solver/build.py:36-47: any param
    whose torch name contains "bias" gets BIAS_LR_FACTOR + WEIGHT_DECAY_BIAS;
    everything else — including BatchNorm scales, torch-named ".weight" —
    gets the full WEIGHT_DECAY). All shipped configs run USE_TRICK=False, so
    this is the grouping the reference actually trains with; the
    BN-decay_mult=0 policy exists only on the USE_TRICK path
    (get_optim_policies, visual_wrappers.py:205-206 — see
    label_params_trick)."""
    def classify(path, leaf):
        comps = [str(getattr(p, "key", getattr(p, "idx", p))).lower()
                 for p in path]
        # flax BatchNorm 'scale' <-> torch BN '.weight'; flax 'bias' <->
        # torch '.bias' for Conv/Dense/BN alike
        if comps and comps[-1] == "bias":
            return "bias"
        return "weight"

    return jax.tree_util.tree_map_with_path(classify, params)


def _mask_for(labels, wanted) -> Any:
    return jax.tree_util.tree_map(lambda l: l in wanted, labels)


def label_params_trick(params, modality: str = "RGB") -> Any:
    """TSN 'trick' policy labels (reference: get_optim_policies,
    visual_wrappers.py:146-211): the network's first conv kernel/bias get
    their own groups, BN affine its own, fc (Dense) weights/biases their
    own, everything else 'normal'."""
    # identify the first conv kernel: rank>=4 kernel with 3 input channels
    # (pytree order is alphabetical, so find it structurally)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    first_conv_prefix = None
    for path, leaf in flat:
        names = [str(getattr(p, "key", "")) for p in path]
        if (names and names[-1] == "kernel" and hasattr(leaf, "ndim")
                and leaf.ndim >= 4 and leaf.shape[-2] in (2, 3)):
            first_conv_prefix = tuple(names[:-1])
            break

    def classify(path, leaf):
        names = [str(getattr(p, "key", "")).lower() for p in path]
        if first_conv_prefix is not None and \
                tuple(str(getattr(p, "key", "")) for p in path[:-1]) == \
                first_conv_prefix:
            return ("first_conv_bias" if names[-1] == "bias"
                    else "first_conv_weight")
        if any(c == "bn" or c.startswith("bn_") or "batchnorm" in c
               or (c.startswith("bn") and c[2:].isdigit()) for c in names):
            return "bn"
        if names[-1] == "scale":
            return "bn"
        is_dense = hasattr(leaf, "ndim") and (
            leaf.ndim == 2 or (leaf.ndim == 1 and names[-1] == "bias"))
        if any(c in ("fc", "new_fc") for c in names):
            return "fc_bias" if names[-1] == "bias" else "fc_weight"
        if names[-1] == "bias":
            return "normal_bias"
        return "normal_weight"

    return jax.tree_util.tree_map_with_path(classify, params)


# reference policy table (visual_wrappers.py:196-211); Flow boosts the
# first conv's lr
_TRICK_POLICIES = {
    "first_conv_weight": {"lr_mult_rgb": 1.0, "lr_mult_flow": 5.0,
                          "decay_mult": 1.0},
    "first_conv_bias": {"lr_mult_rgb": 2.0, "lr_mult_flow": 10.0,
                        "decay_mult": 0.0},
    "normal_weight": {"lr_mult_rgb": 1.0, "lr_mult_flow": 1.0,
                      "decay_mult": 1.0},
    "normal_bias": {"lr_mult_rgb": 2.0, "lr_mult_flow": 2.0,
                    "decay_mult": 0.0},
    "bn": {"lr_mult_rgb": 1.0, "lr_mult_flow": 1.0, "decay_mult": 0.0},
    "fc_weight": {"lr_mult_rgb": 5.0, "lr_mult_flow": 5.0, "decay_mult": 1.0},
    "fc_bias": {"lr_mult_rgb": 10.0, "lr_mult_flow": 10.0, "decay_mult": 0.0},
}


def make_optimizer(
    cfg,
    params,
    trainable_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Build the optax chain for the config.

    ``trainable_mask``: optional bool pytree; False leaves get zero updates
    (linear-probe freezing, reference train_ds.py:81-84).  The learning rate
    is injected per step via ``optax.inject_hyperparams`` under the name
    ``learning_rate``.
    """
    wd = float(cfg.SOLVER.WEIGHT_DECAY)
    wd_bias = float(cfg.SOLVER.WEIGHT_DECAY_BIAS)
    bias_factor = float(cfg.SOLVER.BIAS_LR_FACTOR)
    name = cfg.SOLVER.OPTIMIZER_NAME

    chain = []
    if bool(cfg.SOLVER.USE_TRICK):
        # TSN trick policies (reference: create_optimizer + get_optim_policies,
        # lib/solver/build.py:6-21 / visual_wrappers.py:146-211): per-group
        # lr_mult as a masked grad scale (linear in SGD => == lr scale) and
        # per-group decay_mult on the weight decay.
        labels = label_params_trick(params, cfg.INPUT.MODALITY)
        lr_key = ("lr_mult_flow" if cfg.INPUT.MODALITY == "Flow"
                  else "lr_mult_rgb")
        for group, pol in _TRICK_POLICIES.items():
            mask = _mask_for(labels, (group,))
            if wd and pol["decay_mult"]:
                chain.append(optax.masked(
                    optax.add_decayed_weights(wd * pol["decay_mult"]), mask))
            if pol[lr_key] != 1.0:
                chain.append(optax.masked(optax.scale(pol[lr_key]), mask))
    else:
        labels = label_params(params)
        # Per-group weight decay: weights get WEIGHT_DECAY; biases get
        # WEIGHT_DECAY_BIAS; BN params get none (decay_mult=0 policy).
        if wd:
            chain.append(optax.masked(optax.add_decayed_weights(wd),
                                      _mask_for(labels, ("weight",))))
        if wd_bias:
            chain.append(optax.masked(optax.add_decayed_weights(wd_bias),
                                      _mask_for(labels, ("bias",))))
        # Bias lr factor: with SGD the update is linear in the gradient, so
        # scaling bias grads ahead of momentum == scaling their lr.
        if bias_factor != 1.0:
            chain.append(optax.masked(optax.scale(bias_factor),
                                      _mask_for(labels, ("bias",))))

    if name == "SGD":
        momentum = float(cfg.SOLVER.MOMENTUM)
        chain.append(optax.trace(decay=momentum,
                                 nesterov=bool(cfg.SOLVER.NESTEROV)))
    elif name in ("Adam", "AdamW"):
        chain.append(optax.scale_by_adam())
    elif name == "LARS":
        # TPU-native extension for large-batch pretraining.
        chain.append(optax.scale_by_trust_ratio())
        chain.append(optax.trace(decay=float(cfg.SOLVER.MOMENTUM)))
    else:
        raise ValueError(f"Unknown optimizer: {name}")

    clip = cfg.SOLVER.CLIP_GRADIENT
    if isinstance(clip, (int, float)) and clip and clip != "none":
        chain.insert(0, optax.clip_by_global_norm(float(clip)))

    def build(learning_rate: float):
        tx = optax.chain(*chain, optax.scale(-learning_rate))
        return tx

    tx = optax.inject_hyperparams(build)(
        learning_rate=float(cfg.SOLVER.BASE_LR)
    )
    if trainable_mask is not None:
        # Zero the FINAL updates of frozen leaves (after weight decay etc.),
        # so frozen params are bit-identical across steps
        # (reference: requires_grad=False, train_ds.py:81-84).
        tx = optax.chain(
            tx,
            optax.masked(optax.set_to_zero(),
                         jax.tree_util.tree_map(lambda t: not t,
                                                trainable_mask)),
        )
    return tx


# --------------------------------------------------------------------------- #
# LR schedules
# --------------------------------------------------------------------------- #
def make_lr_scheduler(cfg) -> Callable[[int], float]:
    """epoch -> lr, matching WarmupMultiStepLR semantics exactly
    (reference: lr_scheduler.py:40-69)."""
    base_lr = float(cfg.SOLVER.BASE_LR)
    mode = cfg.SOLVER.LR_SCHEDULER
    milestones = list(cfg.SOLVER.STEPS)
    gamma = float(cfg.SOLVER.GAMMA)
    warmup_factor = float(cfg.SOLVER.WARMUP_FACTOR)
    warmup_iters = int(cfg.SOLVER.WARMUP_ITERS)
    warmup_method = cfg.SOLVER.WARMUP_METHOD
    max_epochs = int(cfg.SOLVER.MAX_EPOCHS)
    lr_step = int(cfg.SOLVER.LR_STEP)

    def lr_at(epoch: int) -> float:
        wf = 1.0
        if epoch < warmup_iters:
            if warmup_method == "constant":
                wf = warmup_factor
            elif warmup_method == "linear":
                alpha = float(epoch) / warmup_iters
                wf = warmup_factor * (1 - alpha) + alpha
            else:
                raise ValueError(f"Unknown warmup method: {warmup_method}")
        if mode == "step":
            if milestones:
                factor = gamma ** bisect_right(milestones, epoch)
            else:
                factor = gamma ** (epoch // lr_step)
        elif mode == "poly":
            factor = (1.0 - float(epoch) / max_epochs) ** 0.9
        elif mode == "cos":
            factor = 0.5 * (1.0 + math.cos(float(epoch) / max_epochs * math.pi))
        else:
            raise NotImplementedError(f"Unsupported scheduler: {mode}")
        return base_lr * wf * factor

    return lr_at


def make_iter_lr_scheduler(cfg, iters_per_epoch: int) -> Callable[[int], float]:
    """Iteration-level schedule — counterpart of the reference's
    ``lib/solver/lr_helper.py`` ``LR_Scheduler`` (:11-75): cos/poly/step
    decay over total iterations with iteration-granular linear warmup.
    (The reference tools step per epoch; this is the finer-grained option.)
    """
    base_lr = float(cfg.SOLVER.BASE_LR)
    mode = cfg.SOLVER.LR_SCHEDULER
    total_iters = int(cfg.SOLVER.MAX_EPOCHS) * int(iters_per_epoch)
    warmup_iters = int(cfg.SOLVER.WARMUP_ITERS) * int(iters_per_epoch)
    lr_step = int(cfg.SOLVER.LR_STEP)
    gamma = float(cfg.SOLVER.GAMMA)

    def lr_at(it: int) -> float:
        if warmup_iters and it < warmup_iters:
            return base_lr * (it + 1) / warmup_iters
        if mode == "cos":
            return 0.5 * base_lr * (
                1.0 + math.cos(math.pi * it / total_iters))
        if mode == "poly":
            return base_lr * (1.0 - float(it) / total_iters) ** 0.9
        if mode == "step":
            return base_lr * gamma ** (it // (lr_step * iters_per_epoch))
        raise NotImplementedError(f"Unsupported scheduler: {mode}")

    return lr_at


def set_learning_rate(opt_state, lr: float):
    """Write the scheduled lr into an inject_hyperparams state.

    Keys on ``optax.InjectHyperparamsState`` (falling back to duck typing)
    and searches the whole state tree recursively, so it is robust to any
    chain nesting around the injected transformation."""
    inject_cls = getattr(optax, "InjectHyperparamsState", None)
    hits = []

    def visit(state):
        is_inject = (inject_cls is not None and isinstance(state, inject_cls)) \
            or (hasattr(state, "hyperparams")
                and isinstance(getattr(state, "hyperparams"), dict))
        if is_inject and "learning_rate" in state.hyperparams:
            state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
            hits.append(state)
            return
        if isinstance(state, (tuple, list)):
            for child in state:
                visit(child)

    visit(opt_state)
    if not hits:
        raise ValueError(
            "Could not locate learning_rate hyperparam in opt state")
    return opt_state


# --------------------------------------------------------------------------- #
# lr_spaces family (reference lib/solver/lr_helper.py:77-206)
# --------------------------------------------------------------------------- #
def _log_space(epochs: int, start_lr: float = 0.03, end_lr: float = 5e-4,
               **_):
    """LogScheduler (lr_helper.py:94-102)."""
    import numpy as np
    return np.logspace(math.log10(start_lr), math.log10(end_lr), epochs)


def _step_space(epochs: int, start_lr: float = 0.01, end_lr: float = None,
                step: int = 10, mult: float = 0.1, **_):
    """StepScheduler (lr_helper.py:105-117) incl. the end_lr→mult/start_lr
    back-solve used for warmup composition."""
    import numpy as np
    if end_lr is not None:
        if start_lr is None:
            start_lr = end_lr / (mult ** (epochs // step))
        else:
            mult = math.pow(end_lr / start_lr, 1.0 / (epochs // step))
    return start_lr * (mult ** (np.arange(epochs) // step))


def _multi_step_space(epochs: int, start_lr: float = 0.01,
                      end_lr: float = None, steps=(10, 20, 30, 40),
                      mult: float = 0.5, **_):
    """MultiStepScheduler (lr_helper.py:120-141)."""
    import numpy as np
    steps = list(steps)
    if end_lr is not None:
        if start_lr is None:
            start_lr = end_lr / (mult ** len(steps))
        else:
            mult = math.pow(end_lr / start_lr, 1.0 / len(steps))
    lr = np.empty(epochs, np.float64)
    lr[0] = start_lr
    for i in range(1, epochs):
        lr[i] = lr[i - 1] * (mult if i in steps else 1.0)
    return lr


def _linear_space(epochs: int, start_lr: float = 0.01, end_lr: float = 0.005,
                  **_):
    """LinearStepScheduler (lr_helper.py:144-151)."""
    import numpy as np
    return np.linspace(start_lr, end_lr, epochs)


def _cos_space(epochs: int, start_lr: float = 0.01, end_lr: float = 0.005,
               **_):
    """CosStepScheduler (lr_helper.py:154-165)."""
    import numpy as np
    idx = np.arange(epochs, dtype=np.float64)
    return end_lr + (start_lr - end_lr) * (1.0 + np.cos(idx * math.pi / epochs)) * 0.5


LR_SPACES = {
    "log": _log_space,
    "step": _step_space,
    "multi-step": _multi_step_space,
    "linear": _linear_space,
    "cos": _cos_space,
}


def build_lr_spaces(spec: dict, epochs: int = 50):
    """Epoch-indexed lr array — functional port of the reference's
    ``build_lr_scheduler`` (lr_helper.py:186-206): a named lr space,
    optionally prefixed by a warmup space consuming ``spec['warmup']['epoch']``
    of the budget.  Returns a numpy array of length ``epochs``; index with
    the epoch (the torch version's ``get_cur_lr``)."""
    import numpy as np
    spec = dict(spec)
    if "warmup" in spec:
        wspec = dict(spec.pop("warmup"))
        wepochs = int(wspec.pop("epoch"))
        warm = build_lr_spaces(wspec, wepochs)
        rest = build_lr_spaces(spec, epochs - wepochs)
        return np.concatenate([warm, rest])
    kind = spec.pop("type", "log")
    if kind not in LR_SPACES:
        raise ValueError(f'Unknown type of LR Scheduler "{kind}"')
    return np.asarray(LR_SPACES[kind](epochs, **spec), np.float64)
