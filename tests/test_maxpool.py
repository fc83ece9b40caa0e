"""max_pool_3d: shifted-maximum chain vs reduce_window reference.

The model path avoids lax.reduce_window for stride-1 pools (XLA's
SelectAndScatter gradient was profiled at 26 ms/step across S3D's 11
inception pool branches — see models/layers.py:max_pool_3d).  Forward
must be bit-exact against the reference lowering for every kernel/stride/
padding combination the backbones use; gradients must match wherever the
window max is unique (ties are a subgradient choice and may differ).
"""

import numpy as np
import jax
import jax.numpy as jnp

from video_graph_ssl_tpu.models.layers import max_pool_3d, max_pool_3d_ref

CASES = [
    (3, 1, 1),            # inception block branch pool
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),    # pool_7
    ((2, 2, 2), (2, 2, 2), (0, 0, 0)),    # pool_13
    ((1, 3, 3), (1, 2, 2), (0, 1, 1)),    # stem pools
    ((2, 2, 2), 1, 0),    # even kernel, no padding
]


def test_forward_bit_exact(rng):
    for k, s, p in CASES:
        x = jnp.asarray(rng.standard_normal((2, 6, 9, 9, 8)), jnp.float32)
        a = jax.jit(lambda v: max_pool_3d(v, k, s, p))(x)
        b = jax.jit(lambda v: max_pool_3d_ref(v, k, s, p))(x)
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_matches_on_unique_maxima(rng):
    # continuous random floats: ties have probability ~0, so the chain's
    # split-at-ties subgradient coincides with SelectAndScatter's argmax
    for k, s, p in CASES:
        x = jnp.asarray(rng.standard_normal((2, 5, 8, 8, 4)), jnp.float32)
        g1 = jax.jit(jax.grad(
            lambda v: jnp.sum(max_pool_3d(v, k, s, p) ** 2)))(x)
        g2 = jax.jit(jax.grad(
            lambda v: jnp.sum(max_pool_3d_ref(v, k, s, p) ** 2)))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-6, atol=1e-6)


def test_grad_ties_split_is_valid_subgradient():
    # constant input: every window ties everywhere; the chain splits the
    # incoming gradient among argmaxes, so the TOTAL gradient mass is
    # conserved (sum dx == sum dy for a linear readout)
    x = jnp.ones((1, 4, 4, 4, 2), jnp.float32)
    g = jax.jit(jax.grad(lambda v: jnp.sum(max_pool_3d(v, 3, 1, 1))))(x)
    y = max_pool_3d(x, 3, 1, 1)
    np.testing.assert_allclose(float(jnp.sum(g)), float(y.size), rtol=1e-6)


# --------------------------------------------------------------------------- #
# Strided pools: Pallas two-pass backward (ops/pallas/maxpool_kernel.py)
# --------------------------------------------------------------------------- #

requires_tpu = __import__("pytest").mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="Mosaic strided-pool backward kernel (TPU only)")

STRIDED_CASES = [
    ((1, 3, 3), (1, 2, 2), (0, 1, 1)),   # pool_1 / pool_4
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),   # pool_7
    ((2, 2, 2), (2, 2, 2), (0, 0, 0)),   # pool_13
    ((3, 3, 3), (2, 2, 2), (1, 1, 1)),   # ragged shapes (below)
]


@requires_tpu
def test_strided_pallas_backward_exact_fp32(rng):
    from video_graph_ssl_tpu.ops.pallas.maxpool_kernel import (
        max_pool3d_strided)

    shapes = [(2, 4, 12, 12, 8), (2, 4, 12, 12, 8), (2, 4, 12, 12, 8),
              (2, 5, 9, 9, 16)]
    for (k, s, p), shape in zip(STRIDED_CASES, shapes):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        g1 = jax.jit(jax.grad(
            lambda v: jnp.sum(jnp.sin(max_pool3d_strided(v, k, s, p)))))(x)
        g2 = jax.jit(jax.grad(
            lambda v: jnp.sum(jnp.sin(max_pool_3d_ref(v, k, s, p)))))(x)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


@requires_tpu
def test_strided_pallas_backward_tie_routing_matches_torch(rng):
    """bf16 inputs tie under rounding; the kernel routes each output's
    gradient to the FIRST argmax in window scan order — torch's
    convention.  Checked with a ones cotangent so dtype noise vanishes."""
    torch = __import__("pytest").importorskip("torch")
    from video_graph_ssl_tpu.ops.pallas.maxpool_kernel import (
        max_pool3d_strided)

    shapes = [(2, 4, 12, 12, 8), (2, 4, 12, 12, 8), (2, 4, 12, 12, 8),
              (2, 5, 9, 9, 16)]
    for (k, s, p), shape in zip(STRIDED_CASES, shapes):
        xb = jnp.asarray(rng.standard_normal(shape),
                         jnp.float32).astype(jnp.bfloat16)
        y, vjp = jax.vjp(lambda v: max_pool3d_strided(v, k, s, p), xb)
        ours = np.asarray(jax.jit(lambda: vjp(jnp.ones_like(y))[0])(),
                          np.float32)
        xt = torch.tensor(
            np.transpose(np.asarray(xb, np.float32), (0, 4, 1, 2, 3)),
            requires_grad=True)
        yt = torch.nn.functional.max_pool3d(xt, k, s, p)
        yt.backward(torch.ones_like(yt))
        ref = np.transpose(xt.grad.numpy(), (0, 2, 3, 4, 1))
        np.testing.assert_array_equal(ours, ref)
