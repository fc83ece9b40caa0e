#!/usr/bin/env python
"""Video retrieval: feature extraction + nearest-neighbor R@k.

Counterpart of the reference's tools/video_retrieval.py (:24-280): extract
clip features for the train and val splits with the SSL encoder (projection
head dropped, :42), pickle them, then score val→train nearest-neighbor
retrieval with cosine/euclidean distances and report R@{1,5,10,20,50}
(:156-209), dumping ``topk_correct.json``.

Usage:
    python tools/video_retrieval.py --config_file configs/visual_moco.yaml \
        --checkpoint ckpt.msgpack --extract_feature --feature_dir feats/
    python tools/video_retrieval.py --config_file ... --feature_dir feats/
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from video_graph_ssl_tpu.config import cfg
from video_graph_ssl_tpu.data import make_test_loader
from video_graph_ssl_tpu.data.transforms_device import multi_crop_eval
from video_graph_ssl_tpu.engine import create_pretrain_state
from video_graph_ssl_tpu.models import create_visual_model
from video_graph_ssl_tpu.parallel import mesh_from_cfg, pad_batch_to_multiple
from video_graph_ssl_tpu.utils import load_checkpoint_any

TOPK = (1, 5, 10, 20, 50)


def get_parser():
    parser = argparse.ArgumentParser(description="Video retrieval R@k")
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("--checkpoint", default="", type=str)
    parser.add_argument("--extract_feature", action="store_true")
    parser.add_argument("--feature_dir", default="features", type=str)
    parser.add_argument("--dist_metric", default="cosine",
                        choices=["cosine", "euclidean"])
    parser.add_argument("--l2_norm", action="store_true", default=True)
    parser.add_argument("--test_clips", default=10, type=int)
    parser.add_argument("--test_crops", default=1, type=int,
                        choices=[1, 3, 5, 6, 10],
                        help="spatial crops averaged per clip (reference "
                        "averages multi-crop features, :101-115)")
    parser.add_argument("--max_videos", default=0, type=int)
    parser.add_argument("--save_vis", default=0, type=int,
                        help="write retrieval strips (query + top-5 "
                        "neighbors, match-colored borders) for the first "
                        "N val videos — the reference README's "
                        "fig/retrie_results.png workflow, for which it "
                        "ships no code")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    return parser


def build_feature_fn(config, model, n_crops: int = 1):
    """jitted: (state, raw (B, n_clips, T, H, W, C) uint8) -> (B, D)
    features averaged over clips (reference: extract_feature,
    video_retrieval.py:101-152 averages over crops/clips)."""
    mean = tuple(config.INPUT.MEAN)
    std = tuple(config.INPUT.STD)
    crop_hw = (int(config.INPUT.BASE_SIZE[0]), int(config.INPUT.BASE_SIZE[1]))
    scale_hw = (int(config.INPUT.SCALE_SIZE[0]), int(config.INPUT.SCALE_SIZE[1]))

    from functools import partial
    crop_fn = partial(multi_crop_eval, scale_hw=scale_hw, crop_hw=crop_hw,
                      n_crops=n_crops, mean=mean, std=std)

    @jax.jit
    def feat_fn(state, raw):
        b, n_clips = raw.shape[0], raw.shape[1]
        crops = jax.vmap(jax.vmap(crop_fn))(raw)
        x = crops.reshape((-1,) + crops.shape[3:])
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        feats = model.apply(variables, x, train=False, method="encode")
        feats = feats.reshape(b, -1, feats.shape[-1])
        return jnp.mean(feats, axis=1)

    return feat_fn


def extract_split(config, args, model, state, split: str):
    split_cfg = config.clone()
    split_cfg.defrost()
    if split == "train":
        split_cfg.DATASET.VALIDATION_SPLIT = config.DATASET.TRAIN_SPLIT
    loader = make_test_loader(split_cfg, num_clips=args.test_clips)
    feat_fn = build_feature_fn(config, model, n_crops=args.test_crops)
    n_dev = mesh_from_cfg(config).shape["data"]

    feats, classes = [], []
    seen = 0
    for batch in loader.epoch(0):
        padded, real_n = pad_batch_to_multiple(
            {"clips": batch["clips"]}, n_dev)
        f = feat_fn(state, padded["clips"])[:real_n]
        feats.append(np.asarray(f))
        classes.append(batch["label"])
        seen += len(batch["label"])
        print(f"[{split}] extracted {seen} videos")
        if args.max_videos and seen >= args.max_videos:
            break
    feats = np.concatenate(feats)
    classes = np.concatenate(classes)
    os.makedirs(args.feature_dir, exist_ok=True)
    out = os.path.join(args.feature_dir, f"{split}_features.pkl")
    with open(out, "wb") as f:
        pickle.dump({"features": feats, "classes": classes}, f)
    print(f"saved {out}: {feats.shape}")


def topk_retrieval(args):
    """(reference: topk_retrieval, video_retrieval.py:156-209)"""
    with open(os.path.join(args.feature_dir, "train_features.pkl"), "rb") as f:
        train = pickle.load(f)
    with open(os.path.join(args.feature_dir, "val_features.pkl"), "rb") as f:
        val = pickle.load(f)
    x_train, y_train = train["features"], train["classes"]
    x_val, y_val = val["features"], val["classes"]

    if args.l2_norm:
        x_train = x_train / np.maximum(
            np.linalg.norm(x_train, axis=1, keepdims=True), 1e-12)
        x_val = x_val / np.maximum(
            np.linalg.norm(x_val, axis=1, keepdims=True), 1e-12)

    if args.dist_metric == "cosine":
        dist = 1.0 - x_val @ x_train.T
    else:
        dist = ((x_val[:, None, :] - x_train[None, :, :]) ** 2).sum(-1)

    order = np.argsort(dist, axis=1)
    ks = [k for k in TOPK if k <= x_train.shape[0]]
    correct = {k: 0 for k in ks}
    for i in range(len(x_val)):
        neighbors = y_train[order[i]]
        for k in ks:
            if (neighbors[:k] == y_val[i]).any():
                correct[k] += 1

    recalls = {k: 100.0 * correct[k] / len(x_val) for k in ks}
    for k in ks:
        print(f"R@{k}: {recalls[k]:.2f}%")
    with open(os.path.join(args.feature_dir, "topk_correct.json"), "w") as f:
        json.dump(recalls, f)
    if args.save_vis:
        save_retrieval_vis(args, order, y_train, y_val)
    return recalls


def _middle_frames(config, args, split: str, wanted: set) -> dict:
    """{video_idx: (H, W, 3) uint8 middle frame} for ``wanted`` ids,
    walking the SAME deterministic test loader used for extraction."""
    split_cfg = config.clone()
    split_cfg.defrost()
    if split == "train":
        split_cfg.DATASET.VALIDATION_SPLIT = config.DATASET.TRAIN_SPLIT
    loader = make_test_loader(split_cfg, num_clips=1)
    frames, seen = {}, 0
    for batch in loader.epoch(0):
        clips = batch["clips"]                     # (B, 1, T, H, W, C) u8
        for b in range(clips.shape[0]):
            idx = seen + b
            if idx in wanted:
                frames[idx] = np.asarray(
                    clips[b, 0, clips.shape[2] // 2])
        seen += clips.shape[0]
        if (args.max_videos and seen >= args.max_videos) \
                or len(frames) == len(wanted):
            break
    return frames


def save_retrieval_vis(args, order, y_train, y_val, n_neighbors: int = 5):
    """Strips of [query | top-k neighbors], green border = class match,
    red = mismatch (reference README.md:72-76 shows this figure class;
    the reference repo contains no code that produces it)."""
    try:
        import cv2
    except Exception:
        print("save_vis: cv2 unavailable, skipping")
        return
    n = min(int(args.save_vis), len(y_val))
    val_ids = set(range(n))
    train_ids = {int(j) for i in range(n) for j in order[i, :n_neighbors]}
    qf = _middle_frames(cfg, args, "val", val_ids)
    tf = _middle_frames(cfg, args, "train", train_ids)

    def bordered(img, good):
        color = (40, 200, 60) if good else (220, 50, 50)
        return cv2.copyMakeBorder(img, 4, 4, 4, 4, cv2.BORDER_CONSTANT,
                                  value=color)

    rows = []
    for i in range(n):
        if i not in qf:
            continue
        tiles = [bordered(qf[i], True)]
        for j in order[i, :n_neighbors]:
            j = int(j)
            if j not in tf:
                continue
            tiles.append(bordered(tf[j], y_train[j] == y_val[i]))
        rows.append(np.concatenate(tiles, axis=1))
    if not rows:
        print("save_vis: no frames collected, skipping")
        return
    w = max(r.shape[1] for r in rows)
    rows = [np.pad(r, ((0, 0), (0, w - r.shape[1]), (0, 0))) for r in rows]
    grid = np.concatenate(rows, axis=0)
    out = os.path.join(args.feature_dir, "retrieval_vis.png")
    cv2.imwrite(out, grid[..., ::-1])
    print(f"saved {out}: {len(rows)} query rows x top-{n_neighbors}")


def main_worker():
    args = get_parser().parse_args()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()

    if args.extract_feature:
        model, _ = create_visual_model(cfg)
        base = tuple(int(s) for s in cfg.INPUT.BASE_SIZE)
        t = int(cfg.INPUT.VIDEO_LENGTH)
        shape = ((2, 2, t, base[0], base[1], 3)
                 if cfg.CONTRAST.MEM_TYPE == "simsiam"
                 else (2, t, base[0], base[1], 3))
        example = np.zeros(shape, np.float32)
        state, _tx = create_pretrain_state(cfg, model, example, n_data=1)
        if args.checkpoint:
            state, meta = load_checkpoint_any(args.checkpoint, state)
            print(f"=> loaded '{args.checkpoint}' (epoch {meta.get('epoch')})")
        extract_split(cfg, args, model, state, "train")
        extract_split(cfg, args, model, state, "val")

    topk_retrieval(args)


if __name__ == "__main__":
    main_worker()
