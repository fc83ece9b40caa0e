#!/usr/bin/env python
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
    N = 256
    g = np.random.default_rng(0)
    x8 = jnp.asarray(g.integers(0, 256, (N, 16, 3, 112, 112), dtype=np.uint8))
    xb = (x8.astype(jnp.bfloat16))
    float(jnp.sum(xb[0,0,0,0]).astype(jnp.float32))
    key = jax.random.key(0)

    def sync(o): float(jnp.sum(o[0,0,0,0]).astype(jnp.float32))

    tests = {}
    tests["copy_x2"] = jax.jit(lambda x: x * 2)
    def chain5(x):
        x = x * 1.1; x = jnp.clip(x, 0, 255); x = x + 3; x = x * 0.5
        return jnp.maximum(x, 0)
    tests["chain5"] = jax.jit(chain5)
    tests["flip_lane"] = jax.jit(lambda x: x[..., ::-1])
    tests["flip_sublane"] = jax.jit(lambda x: x[..., ::-1, :])
    def gray(x):
        gr = 0.299*x[:,:,0]+0.587*x[:,:,1]+0.114*x[:,:,2]
        return jnp.broadcast_to(gr[:,:,None], x.shape).astype(x.dtype)
    tests["gray"] = jax.jit(gray)
    def sel_where(x):
        i = (x > 128).astype(jnp.int32) % 6
        return jnp.where(i==0, x, jnp.where(i==1, x*2, jnp.where(i==2, x*3,
               jnp.where(i==3, x*4, jnp.where(i==4, x*5, x*6)))))
    tests["where6"] = jax.jit(sel_where)
    def mod_f32(x):
        y = x.astype(jnp.float32)
        return ((y / 6.0) % 1.0).astype(x.dtype)
    tests["mod_f32"] = jax.jit(mod_f32)
    def per_frame_mean_blend(x):
        m = jnp.mean(x.astype(jnp.float32), axis=(-3,-2,-1), keepdims=True)
        return (x*0.7 + m.astype(x.dtype)*0.3)
    tests["mean_blend"] = jax.jit(per_frame_mean_blend)

    for name, fn in tests.items():
        dt = timeit(lambda f=fn: f(xb), sync)
        print(f"{name:14s} {dt*1e3:8.2f} ms")

    # uint8 -> bf16 conversion pass
    conv = jax.jit(lambda x: x.astype(jnp.bfloat16) * 2)
    print(f"{'u8_to_bf16':14s} {timeit(lambda: conv(x8), sync)*1e3:8.2f} ms")

main()
