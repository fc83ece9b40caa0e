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
