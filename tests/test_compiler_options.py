"""TPU.COMPILER_OPTIONS: per-step XLA compile-option overrides.

These ride inside the compile request (``env_option_overrides``) so they
reach the compiler that actually builds the program — including remote
TPU servers where local ``XLA_FLAGS`` never arrive (the measured dead end
in perf/xla_flag_sweep.py).  No reference counterpart (the reference has
no compiler-tuning surface at all); this is the TPU-native replacement
for "set NCCL/cuDNN env knobs on the worker".
"""

import jax
import jax.numpy as jnp
import pytest

from video_graph_ssl_tpu.config import cfg as CFG
from video_graph_ssl_tpu.engine import (
    compiler_options_from_cfg,
    jit_train_step,
)


def _cfg(opts):
    cfg = CFG.clone()
    cfg.TPU.COMPILER_OPTIONS = opts
    return cfg


def test_parse_empty_is_none():
    assert compiler_options_from_cfg(_cfg(())) is None


def test_parse_pairs_and_bools():
    cfg = _cfg(("xla_foo", "98304", "xla_bar", "true", "xla_baz", "False"))
    assert compiler_options_from_cfg(cfg) == {
        "xla_foo": "98304", "xla_bar": True, "xla_baz": False}


def test_tpu_only_options_dropped_off_tpu():
    """``xla_tpu_*`` overrides are rejected as unknown by the CPU compiler,
    so a chip-tuned YAML must still run on the CPU backend: the TPU-prefixed
    keys are dropped (with a warning), generic keys pass through."""
    if jax.default_backend() == "tpu":
        pytest.skip("gating only applies off-TPU")
    cfg = _cfg(("xla_tpu_scoped_vmem_limit_kib", "98304",
                "xla_llvm_enable_invariant_load_metadata", "true"))
    with pytest.warns(UserWarning, match="xla_tpu_scoped_vmem_limit_kib"):
        opts = compiler_options_from_cfg(cfg)
    assert opts == {"xla_llvm_enable_invariant_load_metadata": True}

    only_tpu = _cfg(("xla_tpu_scoped_vmem_limit_kib", "98304"))
    with pytest.warns(UserWarning):
        assert compiler_options_from_cfg(only_tpu) is None


def test_parse_odd_length_raises():
    with pytest.raises(ValueError):
        compiler_options_from_cfg(_cfg(("xla_foo",)))


def test_jit_train_step_applies_options():
    """End-to-end: a benign DebugOptions override compiles and runs; a
    nonexistent option is rejected by the compiler (proving the options
    actually reach it rather than being dropped)."""
    cfg = _cfg(("xla_llvm_enable_invariant_load_metadata", "true"))
    step = jit_train_step(cfg, lambda s, x: (s + x.sum(), x.sum()))
    s, m = step(jnp.zeros(()), jnp.ones(4))
    assert float(s) == 4.0 and float(m) == 4.0

    bad = jit_train_step(_cfg(("xla_no_such_option_xyz", "1")),
                         lambda s, x: (s, x))
    with pytest.raises(Exception, match="xla_no_such_option_xyz"):
        bad(jnp.zeros(()), jnp.ones(4))
