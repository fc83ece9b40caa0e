#!/usr/bin/env python
"""Prototype: full redesigned ssl_augment_cf with per-group jitter order."""
import os, sys, time, itertools
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
    from functools import partial
    from video_graph_ssl_tpu.data import transforms_device as td

    B, V, T, S = 128, 2, 16, 128
    OUT = (112, 112)
    mean = (0.485, 0.456, 0.406); std = (0.229, 0.224, 0.225)
    cd = jnp.bfloat16

    g = np.random.default_rng(0)
    raw = jnp.asarray(g.integers(0, 256, (B, V, T, S, S, 3), dtype=np.uint8))
    key = jax.random.key(0)
    def sync(o): float(jnp.sum(o.reshape(-1)[:4]).astype(jnp.float32))

    def hue_u6(clip, shift, internal):
        xx = clip.astype(internal)
        r, g_, b = xx[..., 0, :, :], xx[..., 1, :, :], xx[..., 2, :, :]
        mx = jnp.maximum(jnp.maximum(r, g_), b)
        mn = jnp.minimum(jnp.minimum(r, g_), b)
        d = mx - mn
        inv = 1.0 / jnp.maximum(d, jnp.asarray(1e-6, internal))
        u = jnp.where(r == mx, (g_ - b) * inv,
            jnp.where(g_ == mx, 2.0 + (b - r) * inv, 4.0 + (r - g_) * inv))
        u = u + 6.0 * shift
        u = jnp.where(u < 0.0, u + 6.0, u)
        u = jnp.where(u >= 6.0, u - 6.0, u)
        i = jnp.floor(u); f = u - i
        p = mx - d; q = mx - d * f; t = mx - d * (1.0 - f)
        i = i.astype(jnp.int32)
        def sel(c0,c1,c2,c3,c4,c5):
            return jnp.where(i==0,c0,jnp.where(i==1,c1,jnp.where(i==2,c2,
                   jnp.where(i==3,c3,jnp.where(i==4,c4,c5)))))
        out = jnp.stack([sel(mx,q,p,p,t,mx), sel(t,mx,mx,q,p,p), sel(p,p,t,mx,mx,q)], axis=-3)
        return out.astype(clip.dtype)

    PERMS = list(itertools.permutations(range(4)))

    def jitter_branch(perm, clip, fb, fc, fs, fh, internal=None):
        ops = {
          0: lambda c: jnp.clip(c * fb, 0, 255).astype(c.dtype),
          1: lambda c: jnp.clip(c * fc + (jnp.mean(td._gray_cf(c, False).astype(jnp.float32),
                 axis=(-3,-2,-1), keepdims=True) * (1-fc)).astype(c.dtype), 0, 255).astype(c.dtype),
          2: lambda c: jnp.clip(c * fs + td._gray_cf(c) * (1-fs), 0, 255).astype(c.dtype),
          3: lambda c: hue_u6(c, fh, internal),
        }
        for o in perm: clip = ops[o](clip)
        return clip

    def per_clip(k, clip, perm_id, internal):
        # clip: (T, S, S, 3) uint8
        keys = jax.random.split(k, 7)
        x = jnp.transpose(clip, (0, 3, 1, 2)).astype(cd)
        x = td._rrc_cf(keys[0], x, OUT)
        kb, kc, ks, kh = jax.random.split(keys[1], 4)
        fb = jax.random.uniform(kb, (), minval=0.6, maxval=1.4)
        fc = jax.random.uniform(kc, (), minval=0.6, maxval=1.4)
        fs = jax.random.uniform(ks, (), minval=0.6, maxval=1.4)
        fh = jax.random.uniform(kh, (), minval=-0.1, maxval=0.1)
        branches = [partial(jitter_branch, p, internal=internal) for p in PERMS]
        jit_x = jax.lax.switch(perm_id, branches, x, fb, fc, fs, fh)
        x = jnp.where(jax.random.uniform(keys[2]) < 0.8, jit_x, x)
        x = jnp.where(jax.random.uniform(keys[3]) < 0.2, td._gray_cf(x), x)
        blurred = td._blur_cf(keys[4], x)
        x = jnp.where(jax.random.uniform(keys[5]) < 0.5, blurred, x)
        x = jnp.where(jax.random.uniform(keys[6]) < 0.5, x[..., ::-1], x)
        m = jnp.asarray(mean, jnp.float32).reshape(1, 3, 1, 1) * 255.0
        s = jnp.asarray(std, jnp.float32).reshape(1, 3, 1, 1) * 255.0
        x = ((x - m) / s).astype(cd)
        return jnp.transpose(x, (0, 2, 3, 1))

    def batch_fn(key, clips, n_groups=8):
        b, v = clips.shape[0], clips.shape[1]
        n = b * v
        flat = clips.reshape(n, *clips.shape[2:])
        kperm, key = jax.random.split(key)
        perm_ids = jax.random.randint(kperm, (n_groups,), 0, len(PERMS))
        keys = jax.random.split(key, n)
        gsz = n // n_groups
        flat = flat.reshape(n_groups, gsz, *flat.shape[1:])
        keysg = keys.reshape(n_groups, gsz)
        def group(args):
            xg, kg, pid = args
            return jax.vmap(lambda k, c: per_clip(k, c, pid, cd))(kg, xg)
        out = jax.lax.map(group, (flat, keysg, perm_ids))
        return out.reshape(b, v, *out.shape[2:])

    fn = jax.jit(partial(batch_fn, n_groups=8))
    print(f"new_chain_g8   {timeit(lambda: fn(key, raw), sync)*1e3:8.2f} ms")
    fn1 = jax.jit(partial(batch_fn, n_groups=1))
    print(f"new_chain_g1   {timeit(lambda: fn1(key, raw), sync)*1e3:8.2f} ms")
    fn32 = jax.jit(partial(batch_fn, n_groups=32))
    print(f"new_chain_g32  {timeit(lambda: fn32(key, raw), sync)*1e3:8.2f} ms")

main()
