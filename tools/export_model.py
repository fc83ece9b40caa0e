#!/usr/bin/env python
"""Export a trained model as a serialized, ahead-of-time-compiled artifact.

Serving/deployment surface (beyond the reference, which ships only
research eval scripts): packages the *whole* inference function — uint8
frame canvas -> center-crop/normalize -> encoder (or classifier) — as one
serialized StableHLO artifact via ``jax.export``, so a serving process can
run it with no model code, no config, and no Python framework state:

    import jax.export, json, numpy as np
    exp = jax.export.deserialize(open("model.stablehlo", "rb").read())
    feats = exp.call(frames_uint8)           # (B, T, H, W, 3) uint8

The artifact is exported for BOTH cpu and tpu lowering platforms by
default, validates against the live model before writing, and carries a
manifest.json with the exact input/output contract.

Usage:
    python tools/export_model.py --config_file configs/visual_moco.yaml \
        --checkpoint ckpt.msgpack --what encoder --output export/
    python tools/export_model.py --config_file configs/action_fine_tune.yaml \
        --checkpoint model_best_state.msgpack --what classifier --output export/

Checkpoint surgery matches the eval tools: SSL checkpoints feed the
encoder export (projection head dropped, reference
tools/video_retrieval.py:42); downstream checkpoints feed the classifier
export (reference tools/test_ds.py:61-92).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from video_graph_ssl_tpu.config import cfg


def get_parser():
    p = argparse.ArgumentParser(description="AOT model export (jax.export)")
    p.add_argument("--config_file", default="", type=str)
    p.add_argument("--checkpoint", default="", type=str, required=True)
    p.add_argument("--what", default="encoder",
                   choices=["encoder", "classifier"])
    p.add_argument("--output", default="export", type=str)
    p.add_argument("--batch", default=1, type=int,
                   help="fixed batch size baked into the artifact; use "
                   "--poly for a symbolic batch dimension")
    p.add_argument("--poly", action="store_true",
                   help="export with a symbolic (polymorphic) batch dim")
    p.add_argument("--platforms", nargs="*", default=["cpu", "tpu"],
                   help="lowering platforms baked into the artifact")
    p.add_argument("--skip_validate", action="store_true")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p


def build_infer_fn(config, what: str):
    """Returns (fn(variables, raw_uint8) -> (B, D), variables, out_name).

    The exported function owns eval preprocessing: center crop from the
    SCALE_SIZE canvas to BASE_SIZE + mean/std normalization (the 1-crop
    test transform, reference lib/data/transform/build.py:27-43)."""
    from video_graph_ssl_tpu.data.transforms_device import multi_crop_eval
    from video_graph_ssl_tpu.engine import create_pretrain_state
    from video_graph_ssl_tpu.utils import load_checkpoint_any

    mean = tuple(config.INPUT.MEAN)
    std = tuple(config.INPUT.STD)
    crop_hw = (int(config.INPUT.BASE_SIZE[0]), int(config.INPUT.BASE_SIZE[1]))
    scale_hw = (int(config.INPUT.SCALE_SIZE[0]),
                int(config.INPUT.SCALE_SIZE[1]))
    crop_fn = functools.partial(multi_crop_eval, scale_hw=scale_hw,
                                crop_hw=crop_hw, n_crops=1,
                                mean=mean, std=std)

    if what == "encoder":
        from video_graph_ssl_tpu.models import create_visual_model

        model, feat_dim = create_visual_model(config)
        t = int(config.INPUT.VIDEO_LENGTH)
        example = np.zeros(
            ((2, 2, t, *crop_hw, 3)
             if config.CONTRAST.MEM_TYPE == "simsiam" else
             (2, t, *crop_hw, 3)), np.float32)
        state, _ = create_pretrain_state(config, model, example, n_data=8)
        state, _meta = load_checkpoint_any(config.CHECKPOINT.RESUME, state)

        variables = {"params": state.params, "batch_stats": state.batch_stats}

        def fn(v, raw):
            x = jax.vmap(crop_fn)(raw)[:, 0]
            return model.apply(v, x, train=False, method="encode")

        return fn, variables, feat_dim, "features"

    from video_graph_ssl_tpu.engine import create_downstream_state
    from video_graph_ssl_tpu.models import create_video_model

    model, _ = create_video_model(config)
    t = int(config.INPUT.VIDEO_LENGTH)
    example = np.zeros((2, t, *crop_hw, 3), np.float32)
    state, _tx = create_downstream_state(config, model, example)
    state, _meta = load_checkpoint_any(config.CHECKPOINT.RESUME, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def fn(v, raw):
        x = jax.vmap(crop_fn)(raw)[:, 0]
        return model.apply(v, x, train=False)

    return fn, variables, int(config.DATASET.NUM_CLASS), "logits"


def main(argv=None):
    args = get_parser().parse_args(argv)
    config = cfg.clone()
    if args.config_file:
        config.merge_from_file(args.config_file)
    if args.opts:
        config.merge_from_list(args.opts)
    config.CHECKPOINT.RESUME = args.checkpoint
    config.DATASET.SOURCE = "synthetic"
    config.freeze()

    fn, variables, out_dim, out_name = build_infer_fn(config, args.what)

    t = int(config.INPUT.VIDEO_LENGTH)
    scale_hw = (int(config.INPUT.SCALE_SIZE[0]),
                int(config.INPUT.SCALE_SIZE[1]))
    if args.poly:
        b = jax.export.symbolic_shape("b")[0]
    else:
        b = int(args.batch)
    in_spec = jax.ShapeDtypeStruct((b, t, *scale_hw, 3), jnp.uint8)

    # close over the weights so the artifact is fully self-contained
    closed = jax.jit(functools.partial(fn, variables))
    exp = jax.export.export(closed, platforms=list(args.platforms))(in_spec)

    os.makedirs(args.output, exist_ok=True)
    path = os.path.join(args.output, f"{args.what}.stablehlo")
    blob = bytes(exp.serialize())
    with open(path, "wb") as f:
        f.write(blob)

    manifest = {
        "what": args.what,
        "input": {"shape": ["b" if args.poly else int(args.batch),
                            t, *scale_hw, 3],
                  "dtype": "uint8",
                  "layout": "(B, T, H, W, RGB) raw frames at SCALE_SIZE; "
                            "center crop + normalize run inside"},
        "output": {"name": out_name, "dim": int(out_dim), "dtype": "float32"},
        "platforms": list(args.platforms),
        "backbone": config.MODEL.BACKBONE,
        "checkpoint": os.path.abspath(args.checkpoint),
        "jax_version": jax.__version__,
        "bytes": len(blob),
    }
    with open(os.path.join(args.output, f"{args.what}.manifest.json"),
              "w") as f:
        json.dump(manifest, f, indent=2)

    if not args.skip_validate:
        rng = np.random.default_rng(0)
        vb = 2 if args.poly else int(args.batch)
        raw = rng.integers(0, 256, (vb, t, *scale_hw, 3), dtype=np.uint8)
        want = np.asarray(closed(raw))
        got = np.asarray(jax.export.deserialize(bytearray(blob)).call(raw))
        err = float(np.max(np.abs(want - got)))
        print(f"validate: max|live - artifact| = {err:.3e}")
        assert err < 1e-4, err

    print(f"exported {args.what} -> {path} ({len(blob)/1e6:.2f} MB), "
          f"platforms={args.platforms}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
