"""Fused SepConv train-mode custom VJP: gradients match jax.grad exactly.

The 3-sweep recompute backward (ops/fused_sepconv.py; the TPU hot-path
design for the reference's SepConv3d pair, s3d_1.py:50-69) must produce
the same (dx, dWs, dWt, dgamma1, dbeta1, dgamma2, dbeta2) as automatic
differentiation of the plain forward — including differentiating THROUGH
the train-mode batch statistics.  The Pallas kernels are pinned against
the same oracle in interpret mode.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, H, W, C, F = 2, 4, 6, 6, 5, 7


def _inputs(seed=0):
    import jax.numpy as jnp

    r = np.random.default_rng(seed)
    x = jnp.asarray(r.standard_normal((B, T, H, W, C)), jnp.float32)
    ws = jnp.asarray(0.3 * r.standard_normal((1, 3, 3, C, F)), jnp.float32)
    wt = jnp.asarray(0.3 * r.standard_normal((3, 1, 1, F, F)), jnp.float32)
    g1 = jnp.asarray(1.0 + 0.1 * r.standard_normal(F), jnp.float32)
    b1 = jnp.asarray(0.1 * r.standard_normal(F), jnp.float32)
    g2 = jnp.asarray(1.0 + 0.1 * r.standard_normal(F), jnp.float32)
    b2 = jnp.asarray(0.1 * r.standard_normal(F), jnp.float32)
    wloss = jnp.asarray(r.standard_normal((B, T, H, W, F)), jnp.float32)
    return (x, ws, wt, g1, b1, g2, b2), wloss


def test_forward_matches_plain_core():
    import jax.numpy as jnp
    from video_graph_ssl_tpu.ops.fused_sepconv import (fused_sepconv_train,
                                                       sepconv_fwd_core)

    args, _ = _inputs()
    out_f, stats_f = fused_sepconv_train(*args, jnp.float32)
    out_p, stats_p = sepconv_fwd_core(*args, jnp.float32)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=0, atol=0)
    for a, b in zip(stats_f, stats_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_gradients_match_autodiff():
    import jax
    import jax.numpy as jnp
    from video_graph_ssl_tpu.ops.fused_sepconv import (fused_sepconv_train,
                                                       sepconv_fwd_core)

    args, wloss = _inputs()

    def loss_plain(*a):
        out, _ = sepconv_fwd_core(*a, jnp.float32)
        return jnp.sum(out * wloss)

    def loss_fused(*a):
        out, _ = fused_sepconv_train(*a, jnp.float32)
        return jnp.sum(out * wloss)

    g_plain = jax.grad(loss_plain, argnums=tuple(range(7)))(*args)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    names = ["dx", "dWs", "dWt", "dg1", "db1", "dg2", "db2"]
    for n, a, b in zip(names, g_plain, g_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=n)


def test_pallas_kernels_match_reference_interpret():
    """The 3 Pallas sweeps == _bwd_reference, elementwise (interpret mode)."""
    import jax
    import jax.numpy as jnp
    from video_graph_ssl_tpu.ops.fused_sepconv import (_bwd_reference,
                                                       sepconv_fwd_core)
    from video_graph_ssl_tpu.ops.pallas.sepconv_bwd import (
        fits_vmem, sepconv_bwd_pallas)

    args, wloss = _inputs(1)
    x, ws, wt, g1, b1, g2, b2 = args
    assert fits_vmem(x.shape, ws.shape[-1])
    out, (mu1, var1, mu2, var2) = sepconv_fwd_core(*args, jnp.float32)
    g = wloss  # treat as the incoming cotangent directly

    want = _bwd_reference(
        (x, ws, wt, g1, b1, g2, b2, mu1, var1, mu2, var2, jnp.float32), g)
    got = sepconv_bwd_pallas(x, ws, wt, g1, b1, g2, b2,
                             mu1, var1, mu2, var2, g, jnp.float32,
                             interpret=True)
    names = ["dx", "dWs", "dWt", "dg1", "db1", "dg2", "db2"]
    for n, a, b in zip(names, want, got):
        assert a.shape == b.shape, (n, a.shape, b.shape)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5, err_msg=n)


def _tree_cmp(a, b, tol=0.0):
    import jax

    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (p, va), (_, vb) in zip(la, lb):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=tol, atol=tol, err_msg=str(p))


def test_sepconv_module_fused_matches_standard():
    """SepConv3d(fused_bwd=True): same variables, forward, stats, grads."""
    import jax
    import jax.numpy as jnp
    from video_graph_ssl_tpu.models.layers import SepConv3d

    r = np.random.default_rng(2)
    x = jnp.asarray(r.standard_normal((2, 4, 8, 8, 12)), jnp.float32)
    kw = dict(dtype=jnp.float32, param_dtype=jnp.float32)
    m_s = SepConv3d(16, 3, 1, 1, fused_bwd=False, **kw)
    m_f = SepConv3d(16, 3, 1, 1, fused_bwd=True, **kw)
    vs = jax.jit(m_s.init)(jax.random.key(5), x)
    vf = jax.jit(m_f.init)(jax.random.key(5), x)
    _tree_cmp(vs, vf)

    # train forward + running-stat updates
    y_s, mu_s = m_s.apply(vs, x, True, mutable=["batch_stats"])
    y_f, mu_f = m_f.apply(vs, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_s),
                               rtol=1e-5, atol=1e-5)
    _tree_cmp(mu_s, mu_f, tol=1e-6)

    # eval forward
    y_s = m_s.apply(vs, x, False)
    y_f = m_f.apply(vs, x, False)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_s),
                               rtol=1e-5, atol=1e-5)

    # parameter + input grads through the train step
    wloss = jnp.asarray(r.standard_normal(np.asarray(y_s).shape), jnp.float32)

    def loss(mod, params, xx):
        out, _ = mod.apply({"params": params,
                            "batch_stats": vs["batch_stats"]},
                           xx, True, mutable=["batch_stats"])
        return jnp.sum(out * wloss)

    gs = jax.grad(loss, argnums=(1, 2))(m_s, vs["params"], x)
    gf = jax.grad(loss, argnums=(1, 2))(m_f, vs["params"], x)
    _tree_cmp(gs[0], gf[0], tol=2e-4)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gs[1]),
                               rtol=2e-4, atol=2e-4)


def test_s3d_fused_flag_checkpoint_compatible():
    """One S3D tree evaluates identically with fused_sepconv on/off."""
    import jax
    import jax.numpy as jnp
    from video_graph_ssl_tpu.models.s3d import S3D

    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((1, 8, 32, 32, 3)),
        jnp.float32)
    kw = dict(num_classes=None, dtype=jnp.float32, param_dtype=jnp.float32)
    m_s = S3D(fused_sepconv=False, **kw)
    m_f = S3D(fused_sepconv=True, **kw)
    v = jax.jit(m_s.init)({"params": jax.random.key(0)}, x)
    y_s = jax.jit(lambda v, x: m_s.apply(v, x, train=False))(v, x)
    y_f = jax.jit(lambda v, x: m_f.apply(v, x, train=False))(v, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_s),
                               rtol=2e-5, atol=2e-5)


def test_pallas_tiled_matches_untiled_interpret():
    """Forced H-slab tiling (halo recompute path) == single-tile result."""
    import jax.numpy as jnp
    from video_graph_ssl_tpu.ops.fused_sepconv import sepconv_fwd_core
    from video_graph_ssl_tpu.ops.pallas.sepconv_bwd import sepconv_bwd_pallas

    args, wloss = _inputs(3)
    x, ws, wt, g1, b1, g2, b2 = args
    _, (mu1, var1, mu2, var2) = sepconv_fwd_core(*args, jnp.float32)
    kw = dict(dtype=jnp.float32, interpret=True)
    want = sepconv_bwd_pallas(x, ws, wt, g1, b1, g2, b2,
                              mu1, var1, mu2, var2, wloss, h_tile=H, **kw)
    got = sepconv_bwd_pallas(x, ws, wt, g1, b1, g2, b2,
                             mu1, var1, mu2, var2, wloss, h_tile=2, **kw)
    for i, (a, b) in enumerate(zip(want, got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5, err_msg=str(i))


def test_plan_tiles_known_shapes():
    """Bench-geometry stages at the SUBLANE-PADDED width the kernels run
    at: 4b..5c fit resident untiled; 3b (28->32 pad) and stem_3 overflow
    the resident budget and fall to the grid variant."""
    from video_graph_ssl_tpu.ops.fused_sepconv import pallas_covered
    from video_graph_ssl_tpu.ops.pallas.sepconv_bwd import plan_tiles

    assert plan_tiles((128, 4, 14, 14, 96), 208) == 14     # mixed_4b b1
    assert plan_tiles((128, 8, 28, 28, 96), 128) is None   # mixed_3b b1
    assert pallas_covered((128, 8, 28, 28, 96), 128) == "grid"
    assert plan_tiles((128, 8, 56, 56, 64), 192) is None   # stem_3


def test_stats_outputs_carry_no_gradient():
    import jax
    import jax.numpy as jnp
    from video_graph_ssl_tpu.ops.fused_sepconv import fused_sepconv_train

    args, _ = _inputs()

    def loss(*a):
        _, stats = fused_sepconv_train(*a, jnp.float32)
        return sum(jnp.sum(s) for s in stats)

    g = jax.grad(loss)(*args)
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_pallas_grid_matches_reference_interpret():
    """Manual-DMA H-slab grid kernels == _bwd_reference (interpret mode).

    ht=2 over H=6 exercises first/middle/last slabs: image-edge x rows
    zero-filled in the slab, dz1 halo reads from the H-padded buffer,
    and the dy1 halo mask at both image edges."""
    import jax.numpy as jnp
    from video_graph_ssl_tpu.ops.fused_sepconv import (_bwd_reference,
                                                       sepconv_fwd_core)
    from video_graph_ssl_tpu.ops.pallas.sepconv_bwd_grid import (
        sepconv_bwd_pallas_grid)

    args, wloss = _inputs(4)
    x, ws, wt, g1, b1, g2, b2 = args
    _, (mu1, var1, mu2, var2) = sepconv_fwd_core(*args, jnp.float32)
    want = _bwd_reference(
        (x, ws, wt, g1, b1, g2, b2, mu1, var1, mu2, var2, jnp.float32),
        wloss)
    names = ["dx", "dWs", "dWt", "dg1", "db1", "dg2", "db2"]
    for ht in (2, 3, 6):
        got = sepconv_bwd_pallas_grid(x, ws, wt, g1, b1, g2, b2,
                                      mu1, var1, mu2, var2, wloss,
                                      jnp.float32, interpret=True,
                                      h_tile=ht)
        for n, a, b in zip(names, want, got):
            assert a.shape == b.shape, (n, a.shape, b.shape)
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"ht={ht} {n}")


def test_plan_grid_covers_bench_stem_and_3c():
    """The two SepConvs the resident kernels cannot hold (stem_3 and
    mixed_3c branch1 at the bench 112x112 geometry) get a grid plan."""
    from video_graph_ssl_tpu.ops.fused_sepconv import pallas_covered
    from video_graph_ssl_tpu.ops.pallas.sepconv_bwd import plan_tiles
    from video_graph_ssl_tpu.ops.pallas.sepconv_bwd_grid import plan_grid

    for shape, f in [((256, 8, 28, 28, 64), 192),    # stem_3
                     ((256, 8, 28, 28, 128), 192)]:  # mixed_3c b1
        assert plan_tiles(shape, f) is None
        ht = plan_grid(shape, f)
        assert ht is not None and shape[2] % ht == 0
        assert pallas_covered(shape, f) == "grid"
    # resident coverage stays preferred where it fits
    assert pallas_covered((256, 8, 14, 14, 96), 208) == "resident"
