"""Solver: optax optimizers and LR schedules.

Mirrors lib/solver/__init__.py exports (make_optimizer, make_lr_scheduler,
create_optimizer).
"""

from .build import (build_lr_spaces, label_params, make_iter_lr_scheduler,
                    make_lr_scheduler, make_optimizer, set_learning_rate)

# The reference's `create_optimizer` (lib/solver/build.py:6-21) differs from
# `make_optimizer` only in torch param-group plumbing; functionally identical
# here.
create_optimizer = make_optimizer

__all__ = [
    "make_optimizer",
    "make_lr_scheduler",
    "make_iter_lr_scheduler",
    "create_optimizer",
    "set_learning_rate",
    "label_params",
    "build_lr_spaces",
]
