"""Train-state construction for pretraining and downstream training."""

from __future__ import annotations

import copy
import warnings
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..memory.build import create_contrast
from ..solver.build import make_optimizer
from .train_state import TrainState


def _init_model(cfg, model, example_clips) -> Tuple[Any, Any]:
    key = jax.random.key(int(cfg.MODEL.SEED))
    kp, kd, kg = jax.random.split(key, 3)
    # jit the whole init: eager per-op dispatch of hundreds of param
    # initializers is pathologically slow on remote TPU backends.
    init_fn = jax.jit(lambda rngs, x: model.init(rngs, x, train=False))
    variables = init_fn({"params": kp, "dropout": kd, "graph": kg},
                        example_clips)
    return variables["params"], variables.get("batch_stats", {})


def create_pretrain_state(
    cfg, model, example_clips, n_data: int,
    trainable_mask: Optional[Any] = None,
) -> Tuple[TrainState, Any]:
    """Initialize the SSL TrainState + optax transformation.

    ``example_clips``: one (possibly tiny) batch with the model's input
    shape — ``(B, 2, T, H, W, C)`` for simsiam (views inside the model),
    ``(B, T, H, W, C)`` for moco/bank.

    Replaces the reference's parse_trainer device setup + `_broadcast_memory`
    (train_video_contrast_dis.py:78-121,233-242): under a mesh, replicated
    init makes every chip start from identical state without any broadcast.
    """
    mem_type = cfg.CONTRAST.MEM_TYPE
    params, batch_stats = _init_model(cfg, model, example_clips)
    tx = make_optimizer(cfg, params, trainable_mask)
    opt_state = tx.init(params)

    key = jax.random.key(int(cfg.MODEL.SEED) + 1)
    contrast = create_contrast(cfg, n_data, feat_dim=int(cfg.CROSS.FEAT_DIM),
                               key=key)

    ema_params = ema_bs = None
    if mem_type == "moco":
        # The EMA encoder starts as an exact copy (reference: build.py:16-32
        # creates a second full model with the same init via seed reuse).
        ema_params = jax.tree_util.tree_map(jnp.copy, params)
        ema_bs = jax.tree_util.tree_map(jnp.copy, batch_stats)

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        rng=jax.random.key(int(cfg.MODEL.SEED) + 2),
        ema_params=ema_params,
        ema_batch_stats=ema_bs,
        contrast=contrast,
    )
    return state, tx


def compiler_options_from_cfg(cfg) -> Optional[dict]:
    """``cfg.TPU.COMPILER_OPTIONS`` flat (key, value, ...) pairs → the dict
    ``jax.jit(compiler_options=...)`` accepts, or None when unset.

    These overrides travel INSIDE the compile request
    (``env_option_overrides``), so they are parsed by the compiler that
    actually builds the program — including a remote/relayed TPU server
    where local ``XLA_FLAGS`` never arrive (perf/xla_flag_sweep.py measured
    that dead end; perf/compiler_options_sweep.py measures candidates).
    Values: ``true``/``false`` in any case become real bools; everything
    else is passed as a string (XLA parses ints/floats itself).
    """
    flat = tuple(cfg.TPU.COMPILER_OPTIONS)
    if not flat:
        return None
    if len(flat) % 2:
        raise ValueError(
            f"TPU.COMPILER_OPTIONS must be flat key/value pairs, got {flat}")
    opts = {}
    for k, v in zip(flat[::2], flat[1::2]):
        sv = str(v)
        opts[str(k)] = (sv.lower() == "true") if sv.lower() in (
            "true", "false") else sv
    # TPU-specific overrides are rejected as unknown options by the CPU/GPU
    # compilers, so a YAML tuned for the chip would crash every CPU test and
    # smoke run.  They are meaningless off-TPU anyway — drop every known
    # TPU-only family (loudly).  Generic DebugOptions keys (xla_latency_*,
    # xla_gpu-agnostic scheduler knobs, ...) pass through untouched; an
    # unknown non-TPU key that still crashes off-TPU is a config error the
    # compiler reports itself.
    _TPU_ONLY_PREFIXES = ("xla_tpu_", "xla_sc_", "xla_jf_", "xla_sparse_core_")
    if opts and jax.default_backend() != "tpu":
        dropped = sorted(
            k for k in opts if k.startswith(_TPU_ONLY_PREFIXES))
        for k in dropped:
            del opts[k]
        if dropped:
            warnings.warn(
                "TPU.COMPILER_OPTIONS: dropping TPU-only options on the "
                f"{jax.default_backend()} backend: {dropped}",
                stacklevel=2)
    return opts or None


def jit_train_step(cfg, step_fn):
    """jit a donated-state train step with the cfg's compiler options."""
    return jax.jit(step_fn, donate_argnums=0,
                   compiler_options=compiler_options_from_cfg(cfg))


def linear_probe_mask(params) -> Any:
    """True only for the ``new_fc`` head — the linear-probe freeze
    (reference: tools/train_ds.py:81-84)."""
    def mask(path, leaf):
        return any(str(getattr(p, "key", "")) == "new_fc" for p in path)
    return jax.tree_util.tree_map_with_path(mask, params)


def create_downstream_state(cfg, model, example_clips) -> Tuple[TrainState, Any]:
    """Initialize the downstream (fine-tune / linear-probe) TrainState."""
    params, batch_stats = _init_model(cfg, model, example_clips)
    mask = linear_probe_mask(params) if cfg.MODEL.LINEAR_PROBE else None
    tx = make_optimizer(cfg, params, mask)
    opt_state = tx.init(params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        rng=jax.random.key(int(cfg.MODEL.SEED) + 2),
    )
    return state, tx
