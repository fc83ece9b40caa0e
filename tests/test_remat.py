"""Remat knobs (TPU.REMAT / TPU.REMAT_POLICY) are value-preserving.

jax.checkpoint only changes WHAT the backward stores vs recomputes —
forward values and gradients must be bit-comparable across
remat=False / block remat / the 'conv_saved' policy (keep conv outputs,
recompute BN/ReLU; layers.ConvBN tags conv outputs with
``checkpoint_name('conv_out')``).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _s3d(remat):
    from video_graph_ssl_tpu.models.s3d import S3D

    return S3D(remat=remat, dtype=jnp.float32)


@pytest.fixture(scope="module")
def s3d_min_batch():
    g = np.random.default_rng(0)
    # minimum legal S3D input: T=8, 32x32
    return jnp.asarray(g.normal(size=(1, 8, 32, 32, 3)).astype(np.float32))


def _fwd_and_grads(remat, x):
    model = _s3d(remat)
    variables = jax.jit(lambda x: model.init(jax.random.PRNGKey(0), x,
                                             train=True))(x)

    def loss_fn(params, x):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.sum(out * out)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"], x)
    return float(loss), grads


@pytest.mark.slow
def test_remat_policies_value_preserving(s3d_min_batch):
    x = s3d_min_batch
    base_loss, base_grads = _fwd_and_grads(False, x)
    for remat in (True, "conv_saved"):
        loss, grads = _fwd_and_grads(remat, x)
        assert abs(loss - base_loss) <= 1e-5 * max(1.0, abs(base_loss)), (
            remat, loss, base_loss)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            grads, base_grads)


def test_conv_saved_policy_rejected_off_family():
    from video_graph_ssl_tpu.config import cfg as CFG
    from video_graph_ssl_tpu.models.build import _resolve_remat

    cfg = CFG.clone()
    cfg.TPU.REMAT = True
    cfg.TPU.REMAT_POLICY = "conv_saved"
    assert _resolve_remat(cfg, "S3D") == "conv_saved"
    with pytest.raises(ValueError):
        _resolve_remat(cfg, "I3D")
    cfg.TPU.REMAT_POLICY = "block"
    assert _resolve_remat(cfg, "I3D") is True
    cfg.TPU.REMAT = False
    assert _resolve_remat(cfg, "I3D") is False
