#!/usr/bin/env python
"""Decompose the fused MoCo step (109.8 ms @ bs=128) into its parts.

Variants (select with --variants, each timed value-fetch style):
  full        aug + key fwd + query f+b + queue + opt + EMA   (= bench.py)
  no_aug      same minus the on-device augmentation chain
  no_key      aug + query f+b vs a CONSTANT key batch + opt/queue/EMA
  fb_only     query forward+backward only (const key, no updates)
  fwd_only    query forward only
  key_only    key (EMA) forward only
  aug_only    the augmentation chain alone

Differences between rows locate the time: aug = full - no_aug,
key fwd = no_aug - no_key, opt+queue+EMA = no_key - fb_only - aug_only.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants", nargs="*",
                    default=["full", "no_aug", "no_key", "fb_only",
                             "fwd_only", "key_only", "aug_only"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from video_graph_ssl_tpu.config import cfg as CFG
    from video_graph_ssl_tpu.data.transforms_device import make_batch_augment_fn
    from video_graph_ssl_tpu.engine import (create_pretrain_state,
                                            make_fused_pretrain_step,
                                            make_pretrain_step)
    from video_graph_ssl_tpu.engine.pretrain import (_apply_kwargs,
                                                     moco_logits,
                                                     nce_softmax_loss)
    from video_graph_ssl_tpu.models import create_visual_model
    from video_graph_ssl_tpu.parallel import (make_mesh, replicate_state,
                                              shard_batch)

    cfg = CFG.clone()
    cfg.merge_from_file("configs/visual_moco.yaml")
    cfg.DATASET.SOURCE = "synthetic"

    B = args.batch
    t = int(cfg.INPUT.VIDEO_LENGTH)
    canvas = (int(cfg.INPUT.SCALE_SIZE[0]), int(cfg.INPUT.SCALE_SIZE[1]))
    base = (int(cfg.INPUT.BASE_SIZE[0]), int(cfg.INPUT.BASE_SIZE[1]))
    mesh = make_mesh((-1,), ("data",))
    model, _ = create_visual_model(cfg)
    example = np.zeros((2, t, *base, 3), np.float32)
    state, tx = create_pretrain_state(cfg, model, example, n_data=1000)
    state = replicate_state(state, mesh)

    g = np.random.default_rng(0)
    raw = {
        "clips": g.integers(0, 256, (B, 2, t, *canvas, 3), dtype=np.uint8),
        "label": np.zeros(B, np.int32),
        "index": np.arange(B, dtype=np.int32),
    }
    raw = shard_batch(raw, mesh)
    xq = jnp.asarray(g.standard_normal((B, t, *base, 3), np.float32) * 0.5)
    feat_const = jnp.asarray(g.standard_normal(
        (B, int(cfg.CROSS.FEAT_DIM)), np.float32))
    feat_const = feat_const / jnp.linalg.norm(feat_const, axis=1,
                                             keepdims=True)
    T_ = float(cfg.CONTRAST.NCE_T)
    augment = make_batch_augment_fn(cfg, "ssl")
    inner = make_pretrain_step(cfg, model, tx, n_data=1000)

    def timed(label, fn, *fargs, state_arg=None, iters=args.iters):
        out = None
        for _ in range(3):
            st = state_arg
            out = fn(*fargs) if st is None else fn(st, *fargs)
        leaf = jax.tree_util.tree_leaves(out)[-1]
        float(jnp.sum(leaf.reshape(-1)[:1]).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*fargs) if state_arg is None else fn(state_arg, *fargs)
        leaf = jax.tree_util.tree_leaves(out)[-1]
        float(jnp.sum(leaf.reshape(-1)[:1]).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:9s} {dt*1e3:8.2f} ms  {B/dt:8.1f} clips/s", flush=True)
        return dt

    for v in args.variants:
        if v == "full":
            step = jax.jit(make_fused_pretrain_step(cfg, model, tx,
                                                    n_data=1000))
            timed("full", step, raw, 0.06, state_arg=state)
        elif v == "no_aug":
            step = jax.jit(inner)
            batch = dict(raw)
            key0 = jax.random.key(1)
            batch["clips"] = jax.jit(augment)(key0, raw["clips"])
            timed("no_aug", step, batch, 0.06, state_arg=state)
        elif v == "no_key":
            def nk_step(st, batch, lr):
                def loss_fn(params):
                    vv, kw = _apply_kwargs(st, params, st.batch_stats, True)
                    feat_q, muts = model.apply(vv, batch["clips"][:, 0], **kw)
                    logits, labels = moco_logits(feat_q, feat_const,
                                                 st.contrast.queue, T_)
                    return nce_softmax_loss(logits), muts["batch_stats"]
                (loss, new_bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(st.params)
                from video_graph_ssl_tpu.engine import ema_update
                from video_graph_ssl_tpu.engine.pretrain import _update
                from video_graph_ssl_tpu.memory.moco import moco_enqueue
                contrast = moco_enqueue(st.contrast, feat_const)
                new_state = _update(st, tx, grads, new_bs, lr,
                                    contrast=contrast)
                new_state = new_state.replace(
                    ema_params=ema_update(new_state.params, st.ema_params,
                                          0.999))
                return new_state, {"loss": loss}
            step = jax.jit(nk_step)
            batch = dict(raw)
            batch["clips"] = jax.jit(augment)(jax.random.key(1), raw["clips"])
            timed("no_key", step, batch, 0.06, state_arg=state)
        elif v == "fb_only":
            def fb(st, x):
                def loss_fn(params):
                    vv, kw = _apply_kwargs(st, params, st.batch_stats, True)
                    feat_q, muts = model.apply(vv, x, **kw)
                    logits, labels = moco_logits(feat_q, feat_const,
                                                 st.contrast.queue, T_)
                    return nce_softmax_loss(logits), muts["batch_stats"]
                (loss, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(st.params)
                gn = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in jax.tree_util.tree_leaves(grads))
                return loss, gn
            step = jax.jit(fb)
            timed("fb_only", step, xq, state_arg=state)
        elif v == "fwd_only":
            def fw(st, x):
                vv, kw = _apply_kwargs(st, st.params, st.batch_stats, True)
                feat_q, _ = model.apply(vv, x, **kw)
                return feat_q
            step = jax.jit(fw)
            timed("fwd_only", step, xq, state_arg=state)
        elif v == "key_only":
            def kf(st, x):
                vv, kw = _apply_kwargs(st, st.ema_params, st.ema_batch_stats,
                                       True)
                feat_k, _ = model.apply(vv, x, **kw)
                return feat_k
            step = jax.jit(kf)
            timed("key_only", step, xq, state_arg=state)
        elif v == "combo1":
            def c1(st, key, clips):
                x = augment(key, clips)[:, 0]
                def loss_fn(params):
                    vv, kw = _apply_kwargs(st, params, st.batch_stats, True)
                    feat_q, muts = model.apply(vv, x, **kw)
                    logits, labels = moco_logits(feat_q, feat_const,
                                                 st.contrast.queue, T_)
                    return nce_softmax_loss(logits), muts["batch_stats"]
                (loss, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(st.params)
                gn = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in jax.tree_util.tree_leaves(grads))
                return loss, gn
            step = jax.jit(c1)
            timed("combo1", step, jax.random.key(1), raw["clips"],
                  state_arg=state)
        elif v == "combo2":
            def c2(st, key, clips):
                xb = augment(key, clips)
                x1, x2 = xb[:, 0], xb[:, 1]
                vv, kw = _apply_kwargs(st, st.ema_params, st.ema_batch_stats,
                                       True)
                feat_k, _ = model.apply(vv, x2, **kw)
                feat_k = jax.lax.stop_gradient(feat_k)
                def loss_fn(params):
                    v2, kw2 = _apply_kwargs(st, params, st.batch_stats, True)
                    feat_q, muts = model.apply(v2, x1, **kw2)
                    logits, labels = moco_logits(feat_q, feat_k,
                                                 st.contrast.queue, T_)
                    return nce_softmax_loss(logits), muts["batch_stats"]
                (loss, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(st.params)
                gn = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                         for g in jax.tree_util.tree_leaves(grads))
                return loss, gn
            step = jax.jit(c2)
            timed("combo2", step, jax.random.key(1), raw["clips"],
                  state_arg=state)
        elif v == "upd_only":
            def upd(st, lr):
                from video_graph_ssl_tpu.engine import ema_update
                from video_graph_ssl_tpu.engine.pretrain import _update
                from video_graph_ssl_tpu.memory.moco import moco_enqueue
                grads = jax.tree_util.tree_map(
                    lambda p: (p * 1e-8).astype(p.dtype), st.params)
                contrast = moco_enqueue(st.contrast, feat_const)
                new_state = _update(st, tx, grads, st.batch_stats, lr,
                                    contrast=contrast)
                new_state = new_state.replace(
                    ema_params=ema_update(new_state.params, st.ema_params,
                                          0.999))
                return new_state.step
            step = jax.jit(upd)
            timed("upd_only", step, 0.06, state_arg=state)
        elif v == "ema_only":
            def emf(st):
                from video_graph_ssl_tpu.engine import ema_update
                return jax.tree_util.tree_leaves(
                    ema_update(st.params, st.ema_params, 0.999))[0]
            step = jax.jit(emf)
            timed("ema_only", step, state_arg=state)
        elif v == "opt_only":
            def opf(st, lr):
                from video_graph_ssl_tpu.solver.build import set_learning_rate
                import optax
                grads = jax.tree_util.tree_map(
                    lambda p: (p * 1e-8).astype(p.dtype), st.params)
                opt_state = set_learning_rate(st.opt_state, lr)
                updates, opt_state = tx.update(grads, opt_state, st.params)
                params = optax.apply_updates(st.params, updates)
                return jax.tree_util.tree_leaves(params)[0]
            step = jax.jit(opf)
            timed("opt_only", step, 0.06, state_arg=state)
        elif v == "aug_only":
            step = jax.jit(augment)
            timed("aug_only", step, jax.random.key(1), raw["clips"])


if __name__ == "__main__":
    main()
