#!/usr/bin/env python
"""Grad-CAM visualization for downstream video classifiers.

The reference README demonstrates CAM heatmaps over clips as a core
result ("More CAM Results", README.md:66-70, fig/cam_1.png/cam_2.png)
but ships no code for producing them; this tool provides that
capability.  Standard Grad-CAM (Selvaraju et al.) on the last inception
block: channel weights are the spatio-temporally pooled gradients of the
class score w.r.t. the ``mixed_5c`` activation map, the map is their
ReLU-weighted channel sum, upsampled to the input clip geometry.

Mechanics (all one jitted function, TPU-friendly):
  1. forward once with ``capture_intermediates`` to grab the (B, T', H',
     W', C) activation of ``--layer`` (default mixed_5c);
  2. the S3D head (spatial mean -> adjacent-pair average -> temporal
     mean -> new_fc, models/s3d.py:169-187) is re-applied as a pure
     function of that activation, so ``jax.grad`` w.r.t. the captured
     map needs no model surgery; a built-in self-check asserts the
     recomputed logits match the model's full forward;
  3. cam = relu(sum_c alpha_c * A_c), min-max normalized per video,
     resized to (T, H, W).

Usage:
    python tools/cam.py --config_file configs/action_fine_tune.yaml \
        --checkpoint run/.../model_best_state.msgpack \
        --out_dir /tmp/cams [--class_id -1] [--max_videos 8] [KEY VALUE ...]

Outputs per video: ``cam_{i:04d}.npz`` (cam (T,H,W) float32 in [0,1],
frames (T,H,W,3) uint8, label, pred, class_id) and, when OpenCV is
available, ``cam_{i:04d}.png`` — a frame strip with the JET-colormapped
overlay.
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
from video_graph_ssl_tpu.utils import load_checkpoint_any

def _head_s3d(act):
    """models/s3d.py:169-187 — spatial mean, endpoint-halving temporal
    mean (adjacent-pair average) over the captured stage activation."""
    y = jnp.mean(act.astype(jnp.float32), axis=(2, 3))   # (B, T', C)
    if y.shape[1] > 1:
        y = (y[:, :-1] + y[:, 1:]) * 0.5
    return jnp.mean(y, axis=1)


def _head_mean(act):
    """models/tiny.py:44 — plain global mean pooling."""
    return jnp.mean(act.astype(jnp.float32), axis=(1, 2, 3))


# backbone -> (pooling recompute, default hook layer).  The jitted
# self-check (head_err below) asserts the recompute matches the model's
# own forward, so a silent head drift cannot produce wrong CAMs.
_HEADS = {
    "S3D": (_head_s3d, "mixed_5c"),
    "S3DG": (_head_s3d, "mixed_5c"),
    "tiny3d": (_head_mean, "stage2"),
}


def get_parser():
    parser = argparse.ArgumentParser(description="Grad-CAM for video models")
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("--checkpoint", default="", type=str, required=True)
    parser.add_argument("--out_dir", default="cam_out", type=str)
    parser.add_argument("--layer", default="", type=str,
                        help="backbone module name to hook (default: the "
                             "backbone's last conv stage)")
    parser.add_argument("--class_id", default=-1, type=int,
                        help="-1: use the predicted class per video")
    parser.add_argument("--max_videos", default=8, type=int)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    return parser


def _find_intermediate(tree, layer: str):
    """Depth-first lookup of ``{layer: {'__call__': (value, ...)}}``."""
    if isinstance(tree, dict):
        if layer in tree and isinstance(tree[layer], dict) \
                and "__call__" in tree[layer]:
            return tree[layer]["__call__"][0]
        for v in tree.values():
            hit = _find_intermediate(v, layer)
            if hit is not None:
                return hit
    return None


def build_cam_fn(config, model, backbone: str, layer: str, out_thw):
    """jitted: (state, clips (B, T, H, W, C) uint8-canvas) ->
    (cam (B, *out_thw) in [0,1], logits (B, K), head_err scalar)."""
    mean = tuple(config.INPUT.MEAN)
    std = tuple(config.INPUT.STD)
    crop_hw = (int(config.INPUT.CROP_SIZE[0]), int(config.INPUT.CROP_SIZE[1]))
    scale_hw = (int(config.INPUT.SCALE_SIZE[0]),
                int(config.INPUT.SCALE_SIZE[1]))
    crop_fn = partial(multi_crop_eval, scale_hw=scale_hw, crop_hw=crop_hw,
                      n_crops=1, mean=mean, std=std)
    pool_fn, _ = _HEADS[backbone]

    @partial(jax.jit, static_argnums=2)
    def cam_fn(state, raw, class_id: int):
        x = jax.vmap(crop_fn)(raw)[:, 0]                 # (B, T, h, w, C)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        logits, mods = model.apply(
            variables, x, train=False,
            capture_intermediates=lambda mod, _m: mod.name == layer,
            mutable=["intermediates"])
        act = _find_intermediate(mods["intermediates"], layer)
        if act is None:
            raise ValueError(f"layer {layer!r} not found in the backbone")

        fc = state.params["new_fc"]

        def head(a):
            return pool_fn(a) @ fc["kernel"] + fc["bias"]

        head_err = jnp.max(jnp.abs(head(act) - logits))

        cls = jnp.where(class_id >= 0, class_id, jnp.argmax(logits, axis=-1))
        cls = jnp.broadcast_to(cls, (logits.shape[0],))
        score = lambda a: jnp.sum(
            jnp.take_along_axis(head(a), cls[:, None], axis=-1))
        grads = jax.grad(score)(act.astype(jnp.float32))
        alpha = jnp.mean(grads, axis=(1, 2, 3), keepdims=True)
        cam = jax.nn.relu(jnp.sum(alpha * act.astype(jnp.float32), axis=-1))
        lo = jnp.min(cam, axis=(1, 2, 3), keepdims=True)
        hi = jnp.max(cam, axis=(1, 2, 3), keepdims=True)
        cam = (cam - lo) / jnp.maximum(hi - lo, 1e-8)
        cam = jax.image.resize(cam, (cam.shape[0], *out_thw), "linear")
        return cam, logits, head_err

    return cam_fn


def _save_overlay(path, frames, cam, alpha=0.45):
    """JET-colormap overlay strip (one row, every frame); needs cv2."""
    try:
        import cv2
    except Exception:
        return False
    tiles = []
    for f, c in zip(frames, cam):
        heat = cv2.applyColorMap((c * 255).astype(np.uint8),
                                 cv2.COLORMAP_JET)[..., ::-1]
        tiles.append((1 - alpha) * f.astype(np.float32)
                     + alpha * heat.astype(np.float32))
    strip = np.clip(np.concatenate(tiles, axis=1), 0, 255).astype(np.uint8)
    return bool(cv2.imwrite(path, strip[..., ::-1]))


def main():
    args = get_parser().parse_args()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    if cfg.MODEL.BACKBONE not in _HEADS:
        raise ValueError(
            f"Grad-CAM head recompute supports {sorted(_HEADS)}, "
            f"got {cfg.MODEL.BACKBONE}")
    layer = args.layer or _HEADS[cfg.MODEL.BACKBONE][1]

    model, _ = create_video_model(cfg)
    base = tuple(int(s) for s in cfg.INPUT.CROP_SIZE)
    t = int(cfg.INPUT.VIDEO_LENGTH)
    example = np.zeros((2, t, base[0], base[1], 3), np.float32)
    state, _tx = create_downstream_state(cfg, model, example)
    state, meta = load_checkpoint_any(args.checkpoint, state)
    print(f"=> loaded checkpoint '{args.checkpoint}' "
          f"(epoch {meta.get('epoch')})")

    os.makedirs(args.out_dir, exist_ok=True)
    loader = make_test_loader(cfg, num_clips=1)
    cam_fn = build_cam_fn(cfg, model, cfg.MODEL.BACKBONE, layer,
                          (t, base[0], base[1]))

    seen = 0
    for batch in loader.epoch(0):
        raw = batch["clips"][:, 0]                       # (B, T, H, W, C)
        cam, logits, head_err = cam_fn(state, raw, int(args.class_id))
        cam, logits = np.asarray(cam), np.asarray(logits)
        if float(head_err) > 1e-2:
            raise RuntimeError(
                f"head recompute drifted from the model forward "
                f"(max|diff|={float(head_err):.2e}) — the backbone head "
                f"changed; update s3d_head_from_activation")
        # center-crop the raw canvas to the model input for the overlay
        hh, ww = raw.shape[2], raw.shape[3]
        i0, j0 = (hh - base[0]) // 2, (ww - base[1]) // 2
        frames = raw[:, :, i0:i0 + base[0], j0:j0 + base[1]]
        n_keep = cam.shape[0]
        if args.max_videos:
            n_keep = min(n_keep, args.max_videos - seen)
        for b in range(n_keep):
            idx = seen + b
            pred = int(logits[b].argmax())
            used = pred if args.class_id < 0 else int(args.class_id)
            npz = os.path.join(args.out_dir, f"cam_{idx:04d}.npz")
            np.savez(npz, cam=cam[b].astype(np.float32), frames=frames[b],
                     label=int(batch["label"][b]), pred=pred, class_id=used)
            png = os.path.join(args.out_dir, f"cam_{idx:04d}.png")
            ok = _save_overlay(png, frames[b], cam[b])
            print(f"video {idx}: label={int(batch['label'][b])} pred={pred}"
                  f" cam->{npz}" + (f" overlay->{png}" if ok else ""))
        seen += n_keep
        if args.max_videos and seen >= args.max_videos:
            break
    print(f"wrote {seen} CAMs to {args.out_dir}")


if __name__ == "__main__":
    main()
