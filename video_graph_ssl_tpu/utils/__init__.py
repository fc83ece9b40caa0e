"""Utils: checkpointing, experiment dirs, metrics, telemetry.

Exports mirror lib/utils/__init__.py (Saver, TensorboardSummary,
creat_saver) plus the functional checkpoint API.  Note: the reference's
``train_ds.py:20`` imports a ``creat_criterion`` that was never defined
(latent ImportError, SURVEY.md §4) — criteria live in ``memory.build`` here.
"""

from .checkpoint import (
    load_checkpoint_any,
    load_checkpoint_orbax,
    load_checkpoint_state,
    load_params_only,
    save_checkpoint_orbax,
    save_checkpoint_state,
    transfer_encoder_params,
    wait_for_async_checkpoints,
)
from .inflate import inflate_first_conv
from .meters import AverageMeter, accuracy, average_precision, mean_average_precision
from .saver import Saver
from .summary import TensorboardSummary, creat_saver

__all__ = [
    "Saver",
    "TensorboardSummary",
    "creat_saver",
    "AverageMeter",
    "inflate_first_conv",
    "accuracy",
    "average_precision",
    "mean_average_precision",
    "save_checkpoint_state",
    "load_checkpoint_state",
    "save_checkpoint_orbax",
    "load_checkpoint_orbax",
    "load_checkpoint_any",
    "wait_for_async_checkpoints",
    "load_params_only",
    "transfer_encoder_params",
]
