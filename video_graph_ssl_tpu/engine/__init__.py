"""Engine: functional train state + jitted train/eval steps."""

from .build import (
    compiler_options_from_cfg,
    create_downstream_state,
    create_pretrain_state,
    jit_train_step,
    linear_probe_mask,
)
from .downstream import (
    make_downstream_train_step,
    make_eval_step,
    make_feature_step,
    make_fused_downstream_step,
    make_fused_eval_step,
)
from .pretrain import (
    make_bank_step,
    make_fused_pretrain_step,
    make_moco_step,
    make_pretrain_step,
    make_simsiam_step,
    topk_accuracy,
)
from .train_state import TrainState, ema_update

__all__ = [
    "TrainState",
    "ema_update",
    "create_pretrain_state",
    "create_downstream_state",
    "compiler_options_from_cfg",
    "jit_train_step",
    "linear_probe_mask",
    "make_pretrain_step",
    "make_fused_pretrain_step",
    "make_simsiam_step",
    "make_moco_step",
    "make_bank_step",
    "make_downstream_train_step",
    "make_fused_downstream_step",
    "make_fused_eval_step",
    "make_eval_step",
    "make_feature_step",
    "topk_accuracy",
]
