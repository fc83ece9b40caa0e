#!/usr/bin/env python
"""Experiments: fixed-order fused jitter chain + fast hue."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def timeit(fn, sync, iters=20, warmup=3):
    for _ in range(warmup): out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters

def main():
    import jax, jax.numpy as jnp
    from video_graph_ssl_tpu.data import transforms_device as td

    B, V, T, HW = 128, 2, 16, 112
    g = np.random.default_rng(0)
    x = jnp.asarray(g.normal(128, 40, (B*V, T, 3, HW, HW)).astype(np.float32)).astype(jnp.bfloat16)
    float(jnp.sum(x[0,0,0,0]).astype(jnp.float32))
    key = jax.random.key(0)
    def sync(o): float(jnp.sum(o[0,0,0,0]).astype(jnp.float32))

    # ---- fast hue: 1 reciprocal, pixel-scale (no /255), bf16 in/out ----
    def hue_fast(clip, shift):
        # clip: (..., 3, H, W) in [0,255]; fp32 internals for the wrap math
        x = clip.astype(jnp.float32)
        r, g_, b = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
        maxc = jnp.maximum(jnp.maximum(r, g_), b)
        minc = jnp.minimum(jnp.minimum(r, g_), b)
        delta = maxc - minc
        inv = 1.0 / jnp.maximum(delta, 1e-6)
        rc, gc, bc = (maxc-r)*inv, (maxc-g_)*inv, (maxc-b)*inv
        h = jnp.where(r == maxc, bc - gc,
             jnp.where(g_ == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
        h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)
        h = (h + shift) % 1.0
        i = jnp.floor(h * 6.0)
        f = h * 6.0 - i
        i = i.astype(jnp.int32) % 6
        # p,q,t without divides: p = maxc-delta, q = maxc-delta*f, t = maxc-delta*(1-f)
        p = maxc - delta
        q = maxc - delta * f
        t = maxc - delta * (1.0 - f)
        v = maxc
        def sel(c0,c1,c2,c3,c4,c5):
            return jnp.where(i==0,c0,jnp.where(i==1,c1,jnp.where(i==2,c2,
                   jnp.where(i==3,c3,jnp.where(i==4,c4,c5)))))
        out = jnp.stack([sel(v,q,p,p,t,v), sel(t,v,v,q,p,p), sel(p,p,t,v,v,q)], axis=-3)
        return out.astype(clip.dtype)

    tests = {}
    tests["hue_old"] = jax.jit(lambda x: td._hue_cf(x.reshape(B*V*T, 3, HW, HW), 0.05).reshape(x.shape))
    tests["hue_fast"] = jax.jit(lambda x: hue_fast(x, 0.05))

    # fixed-order chain, fused, per-clip factors (vmap over clips)
    def chain_fixed(k, clip):  # clip: (T, 3, H, W)
        kb, kc, ks, kh = jax.random.split(k, 4)
        fb = jax.random.uniform(kb, (), minval=0.6, maxval=1.4)
        fc = jax.random.uniform(kc, (), minval=0.6, maxval=1.4)
        fs = jax.random.uniform(ks, (), minval=0.6, maxval=1.4)
        fh = jax.random.uniform(kh, (), minval=-0.1, maxval=0.1)
        c = jnp.clip(clip * fb, 0, 255).astype(clip.dtype)
        m = jnp.mean(td._gray_cf(c, False).astype(jnp.float32), axis=(-3,-2,-1), keepdims=True)
        c = jnp.clip(c * fc + (m*(1-fc)).astype(c.dtype), 0, 255).astype(clip.dtype)
        c = jnp.clip(c * fs + td._gray_cf(c) * (1-fs), 0, 255).astype(clip.dtype)
        c = hue_fast(c.swapaxes(0,0), fh)  # (T,3,H,W)
        return c
    def batched_chain(key, xx):
        keys = jax.random.split(key, xx.shape[0])
        return jax.vmap(chain_fixed)(keys, xx)
    tests["chain_fixed"] = jax.jit(batched_chain)

    # old switch chain for comparison
    order = jnp.asarray([0,1,2,3])
    def old_chain(key, xx):
        keys = jax.random.split(key, xx.shape[0])
        return jax.vmap(lambda k,c: td._color_jitter_cf(k, c, order))(keys, xx)
    tests["chain_switch"] = jax.jit(old_chain)

    for name, fn in tests.items():
        if name.startswith("hue"):
            dt = timeit(lambda f=fn: f(x), sync)
        else:
            dt = timeit(lambda f=fn: f(key, x), sync)
        print(f"{name:14s} {dt*1e3:8.2f} ms")

main()
