"""Contrastive memories (MoCo queue, instance bank) and loss criteria."""

from .bank import (
    AliasTables,
    BankState,
    CmcBankState,
    bank_logits,
    bank_update,
    cmc_bank_logits,
    cmc_bank_update,
    init_bank,
    init_cmc_bank,
)
from .build import create_contrast, create_criterion
from .criterion import cross_entropy_loss, nce_criterion, nce_softmax_loss, simsiam_d
from .moco import (
    CmcMocoState,
    MocoState,
    cmc_moco_enqueue,
    cmc_moco_forward,
    init_cmc_moco,
    init_moco,
    moco_enqueue,
    moco_logits,
)

__all__ = [
    "AliasTables", "BankState", "CmcBankState", "MocoState", "CmcMocoState",
    "bank_logits", "bank_update", "cmc_bank_logits", "cmc_bank_update",
    "init_bank", "init_cmc_bank", "init_moco", "init_cmc_moco",
    "moco_logits", "moco_enqueue", "cmc_moco_forward", "cmc_moco_enqueue",
    "create_contrast", "create_criterion",
    "nce_softmax_loss", "nce_criterion", "cross_entropy_loss", "simsiam_d",
]
