"""Factories for contrast memories and criteria.

Counterpart of lib/memory/build.py:5-32: ``create_contrast`` maps MEM_TYPE
('bank'/'moco'/'simsiam') to an initial functional state (None for simsiam),
``create_criterion`` maps CROSS.CRITERION to a loss callable.  The reference
also has a typo'd error path (``cfg.cfg.``, build.py:30) — fixed here.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax

from .bank import init_bank, init_cmc_bank
from .criterion import nce_criterion, nce_softmax_loss
from .moco import init_cmc_moco, init_moco


def create_contrast(cfg, n_data: int, feat_dim: Optional[int] = None,
                    key: Optional[jax.Array] = None):
    """Initial contrast-memory state for the configured regime.

    Returns a MocoState / BankState / None (simsiam needs no memory,
    reference: build.py:5-19).
    """
    mem_type = cfg.CONTRAST.MEM_TYPE
    dim = int(feat_dim if feat_dim is not None else cfg.CROSS.FEAT_DIM)
    if key is None:
        key = jax.random.key(int(cfg.MODEL.SEED))
    cmc = cfg.CROSS.MODALITY != "visual"
    # reference: RGBMem/RGBMoCo vs CMCMem/CMCMoCo on CROSS.MODALITY
    # (lib/memory/build.py:5-13)
    if mem_type == "moco":
        init = init_cmc_moco if cmc else init_moco
        return init(key, int(cfg.CONTRAST.NCE_K), dim)
    if mem_type == "bank":
        init = init_cmc_bank if cmc else init_bank
        return init(key, int(n_data), dim)
    if mem_type == "simsiam":
        return None
    raise ValueError(f"Unknown CONTRAST.MEM_TYPE: {mem_type}")


def create_criterion(cfg, n_data: int) -> Callable:
    """Loss callable for the configured criterion
    (reference: build.py:21-32)."""
    name = cfg.CROSS.CRITERION
    if name == "crossentropy":
        return lambda logits, labels=None: nce_softmax_loss(logits)
    if name == "NCE":
        return partial(nce_criterion, n_data=int(n_data))
    if name == "simsiam_d":
        from .criterion import simsiam_d
        return simsiam_d
    raise ValueError(f"Unknown CROSS.CRITERION: {name}")
