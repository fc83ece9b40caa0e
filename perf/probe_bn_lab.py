#!/usr/bin/env python
"""Linear-probe BN semantics A/B (VERDICT r3 item 7).

The reference's linear probe runs the frozen encoder in partial-BN train
mode — the FIRST BN keeps consuming batch statistics and updating its
running stats while every other BN is frozen
(/root/reference/lib/modeling/model_wrappers.py:130-146).  Our default
runs the whole frozen model on running stats (MODEL.PROBE_BN='eval').

This lab measures whether that approximation changes probe outcomes:
pretrain a tiny encoder on the temporal-motion set, then linear-probe the
frozen encoder under both BN semantics on held-out data.

Run:  PYTHONPATH= JAX_PLATFORMS=cpu python perf/probe_bn_lab.py
Results recorded in NOTES_NEXT_ROUND.md.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", nargs="*", type=int, default=[0, 1])
    ap.add_argument("--pre_epochs", type=int, default=40)
    ap.add_argument("--probe_epochs", type=int, default=40)
    ap.add_argument("--t", type=int, default=8)
    ap.add_argument("--hw", type=int, default=16)
    ap.add_argument("--per_class", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from perf.graph_benefit_lab import make_cfg
    from video_graph_ssl_tpu.data.synthetic import temporal_motion_clips
    from video_graph_ssl_tpu.engine import (create_downstream_state,
                                            create_pretrain_state,
                                            make_downstream_train_step,
                                            make_eval_step,
                                            make_pretrain_step)
    from video_graph_ssl_tpu.models import (create_video_model,
                                            create_visual_model)
    from video_graph_ssl_tpu.utils.checkpoint import transfer_encoder_params

    for seed in args.seeds:
        cfg = make_cfg("simsiam", aug=False, t=args.t, hw=args.hw)
        cfg.MODEL.SEED = seed
        cfg.MODEL.LINEAR_PROBE = True
        cfg.MODEL.DROPOUT = 0.0

        clips, labels = temporal_motion_clips(
            per_class=args.per_class, t=args.t, hw=(args.hw, args.hw),
            seed=seed)
        val_clips, val_labels = temporal_motion_clips(
            per_class=args.per_class, t=args.t, hw=(args.hw, args.hw),
            seed=seed + 100)
        clips_j = jnp.asarray(clips)
        val_j = jnp.asarray(val_clips[:, 0])
        labels_j = jnp.asarray(labels, jnp.int32)
        n = len(labels)
        bsz = 16

        # --- SSL pretrain (shared starting encoder for both probes)
        ssl_model, _ = create_visual_model(cfg)
        ssl_state, ssl_tx = create_pretrain_state(cfg, ssl_model, clips_j[:2],
                                                  n_data=n)
        pre_step = jax.jit(make_pretrain_step(cfg, ssl_model, ssl_tx),
                           donate_argnums=0)
        order_rng = np.random.default_rng(seed + 1)
        for _ in range(args.pre_epochs):
            order = order_rng.permutation(n)
            for s in range(0, n - bsz + 1, bsz):
                idx = order[s:s + bsz]
                batch = {"clips": clips_j[idx],
                         "label": jnp.zeros(bsz, jnp.int32),
                         "index": jnp.asarray(idx, jnp.int32)}
                ssl_state, _m = pre_step(ssl_state, batch, 0.3)
        # host-numpy snapshot: the probe steps donate their state, and
        # donation DELETES buffers shared with this dict between modes
        ssl_sd = jax.tree.map(
            np.asarray,
            {"params": serialization.to_state_dict(ssl_state.params),
             "batch_stats":
                 serialization.to_state_dict(ssl_state.batch_stats)})

        # --- two probes from the SAME frozen encoder
        results = {}
        for mode, bn_train in (("eval", False), ("reference", True)):
            ds_model, _fd = create_video_model(cfg)   # partial_bn=True
            ds_state, ds_tx = create_downstream_state(
                cfg, ds_model, clips_j[:2, 0])
            p, s = transfer_encoder_params(
                ssl_sd, ds_state.params, ds_state.batch_stats)
            ds_state = ds_state.replace(
                params=serialization.from_state_dict(ds_state.params, p),
                batch_stats=serialization.from_state_dict(
                    ds_state.batch_stats, s))
            step = jax.jit(
                make_downstream_train_step(ds_model, ds_tx, bn_train),
                donate_argnums=0)
            evaluate = make_eval_step(ds_model)
            rng2 = np.random.default_rng(seed + 2)
            for _ in range(args.probe_epochs):
                order = rng2.permutation(n)
                for st in range(0, n - bsz + 1, bsz):
                    idx = order[st:st + bsz]
                    batch = {"clips": clips_j[idx, 0],
                             "label": labels_j[idx]}
                    ds_state, m = step(ds_state, batch, 0.5)
            train_acc = float(m["top1"])
            logits = np.asarray(evaluate(ds_state, val_j))
            val_acc = float((logits.argmax(1) == val_labels).mean()) * 100
            results[mode] = (train_acc, val_acc)
            print(f"seed{seed} probe_bn={mode:9s} "
                  f"train top1 {train_acc:6.2f}  val top1 {val_acc:6.2f}",
                  flush=True)
        d = results["reference"][1] - results["eval"][1]
        print(f"seed{seed} val delta (reference - eval): {d:+.2f} pts",
              flush=True)


if __name__ == "__main__":
    main()
