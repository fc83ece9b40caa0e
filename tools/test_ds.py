#!/usr/bin/env python
"""Video-level evaluation with multi-clip multi-crop averaging.

Counterpart of the reference's tools/test_ds.py (:25-211): N temporally
spread clips × {1,3,5,6,10} spatial crops per video, per-crop logits
averaged into one video-level score, top-1/5 + per-class accuracy from the
confusion matrix, optional score dump.

Usage:
    python tools/test_ds.py --config_file configs/action_fine_tune.yaml \
        --checkpoint run/.../model_best_state.msgpack \
        --test_crops 10 --test_clips 10 [KEY VALUE ...]
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from video_graph_ssl_tpu.config import cfg
from video_graph_ssl_tpu.data import make_test_loader
from video_graph_ssl_tpu.data.transforms_device import multi_crop_eval
from video_graph_ssl_tpu.engine import create_downstream_state
from video_graph_ssl_tpu.models import create_video_model
from video_graph_ssl_tpu.parallel import mesh_from_cfg, pad_batch_to_multiple
from video_graph_ssl_tpu.utils import accuracy, load_checkpoint_any


def get_parser():
    parser = argparse.ArgumentParser(description="Video-level evaluation")
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("--checkpoint", default="", type=str, required=True)
    parser.add_argument("--test_crops", default=1, type=int,
                        choices=[1, 3, 5, 6, 10])
    parser.add_argument("--test_clips", default=10, type=int)
    parser.add_argument("--save_scores", default="", type=str,
                        help="optional .npz path for per-video scores")
    parser.add_argument("--max_videos", default=0, type=int,
                        help="debug: cap evaluated videos")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    return parser


def build_eval_fn(config, model, n_crops: int):
    """jitted: (state, raw clips (B, n_clips, T, H, W, C) uint8) ->
    video scores (B, num_class) averaged over clips × crops
    (reference: eval_video, test_ds.py:134-149)."""
    mean = tuple(config.INPUT.MEAN)
    std = tuple(config.INPUT.STD)
    crop_hw = (int(config.INPUT.CROP_SIZE[0]), int(config.INPUT.CROP_SIZE[1]))
    scale_hw = (int(config.INPUT.SCALE_SIZE[0]), int(config.INPUT.SCALE_SIZE[1]))
    crop_fn = partial(multi_crop_eval, scale_hw=scale_hw, crop_hw=crop_hw,
                      n_crops=n_crops, mean=mean, std=std)

    @jax.jit
    def eval_fn(state, raw):
        b, n_clips = raw.shape[0], raw.shape[1]
        crops = jax.vmap(jax.vmap(crop_fn))(raw)      # (B, nc, crops, T, h, w, C)
        x = crops.reshape((-1,) + crops.shape[3:])
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits = model.apply(variables, x, train=False)
        logits = logits.reshape(b, -1, logits.shape[-1])
        return jnp.mean(logits, axis=1)

    return eval_fn


def main_work():
    args = get_parser().parse_args()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()

    model, _ = create_video_model(cfg)
    base = tuple(int(s) for s in cfg.INPUT.CROP_SIZE)
    t = int(cfg.INPUT.VIDEO_LENGTH)
    example = np.zeros((2, t, base[0], base[1], 3), np.float32)
    state, _tx = create_downstream_state(cfg, model, example)
    state, meta = load_checkpoint_any(args.checkpoint, state)
    print(f"=> loaded checkpoint '{args.checkpoint}' (epoch {meta.get('epoch')})")

    loader = make_test_loader(cfg, num_clips=args.test_clips)
    eval_fn = build_eval_fn(cfg, model, args.test_crops)
    n_dev = mesh_from_cfg(cfg).shape["data"]

    scores, labels = [], []
    seen = 0
    for batch in loader.epoch(0):
        padded, real_n = pad_batch_to_multiple(
            {"clips": batch["clips"]}, n_dev)
        s = eval_fn(state, padded["clips"])[:real_n]
        scores.append(np.asarray(s))
        labels.append(batch["label"])
        seen += len(batch["label"])
        print(f"video {seen} done")
        if args.max_videos and seen >= args.max_videos:
            break
    scores = np.concatenate(scores)
    labels = np.concatenate(labels)

    top1, top5 = accuracy(scores, labels, topk=(1, 5))
    pred = scores.argmax(axis=1)
    num_class = scores.shape[1]
    conf = np.zeros((num_class, num_class), np.int64)
    for t_, p_ in zip(labels, pred):
        conf[t_, p_] += 1
    cls_cnt = conf.sum(axis=1)
    cls_hit = np.diag(conf)
    cls_acc = np.where(cls_cnt > 0, cls_hit / np.maximum(cls_cnt, 1), 0.0)
    print(f"Accuracy Prec@1 {top1:.02f}% Prec@5 {top5:.02f}%")
    print(f"Per-class accuracy (mean over non-empty): "
          f"{cls_acc[cls_cnt > 0].mean() * 100:.02f}%")

    if args.save_scores:
        np.savez(args.save_scores, scores=scores, labels=labels)
        print(f"saved scores to {args.save_scores}")


if __name__ == "__main__":
    main_work()
