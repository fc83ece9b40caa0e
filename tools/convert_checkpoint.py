#!/usr/bin/env python
"""Convert reference (PyTorch) training checkpoints to native ones, and back.

Migration surface: a user of the reference switches frameworks by converting
their existing ``.pth.tar`` checkpoints once — the emitted ``.msgpack`` is a
full TrainState checkpoint that every tool accepts:

    # reference SSL pretrain checkpoint -> ours
    python tools/convert_checkpoint.py --config_file configs/visual_moco.yaml \
        --torch_ckpt gca_moco_ep200.pth.tar --output gca_moco_ep200.msgpack
    python tools/train_ds.py --config_file configs/action_fine_tune.yaml \
        --ssl_checkpoint gca_moco_ep200.msgpack
    python tools/video_retrieval.py --config_file configs/visual_moco.yaml \
        --checkpoint gca_moco_ep200.msgpack --extract_feature ...

    # reference downstream checkpoint -> ours (evaluate with test_ds)
    python tools/convert_checkpoint.py --config_file configs/action_fine_tune.yaml \
        --torch_ckpt ucf_finetune.pth.tar --output ucf_finetune.msgpack

    # ours -> reference state_dict names (S3D; for torch-side auditing)
    python tools/convert_checkpoint.py --config_file configs/visual_moco.yaml \
        --checkpoint ours.msgpack --to_torch ref_named.pth.tar

What converts: model weights + BN statistics (backbone s3d/s3dg/i3d, heads),
the MoCo/bank memory buffer, the EMA encoder (copied from the model when the
source omits it, like the reference's init), and the epoch. The optimizer
state is reinitialized (torch SGD buffers have no stable optax
correspondence) — noted in the emitted metadata.

Reference payloads: tools/train_video_contrast_dis.py:274-283 (SSL),
tools/train_ds.py (downstream VideoModelWrapper state_dict).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from video_graph_ssl_tpu.config import cfg
from video_graph_ssl_tpu.engine import create_downstream_state, create_pretrain_state
from video_graph_ssl_tpu.models import create_video_model, create_visual_model
from video_graph_ssl_tpu.utils.checkpoint import (
    load_params_only,
    save_checkpoint_state,
)
from video_graph_ssl_tpu.utils.ckpt_convert import (
    detect_kind,
    export_downstream_to_torch,
    export_pretrain_to_torch,
    graft_downstream_state,
    graft_pretrain_state,
)


def get_parser():
    p = argparse.ArgumentParser(description="Reference checkpoint converter")
    p.add_argument("--config_file", default="", type=str,
                   help="config matching the checkpoint's architecture")
    p.add_argument("--torch_ckpt", default="", type=str,
                   help="reference .pth/.pth.tar to convert to .msgpack")
    p.add_argument("--output", default="", type=str,
                   help="output .msgpack path (with --torch_ckpt)")
    p.add_argument("--what", default="auto",
                   choices=["auto", "pretrain", "cmc_pretrain", "downstream"])
    p.add_argument("--checkpoint", default="", type=str,
                   help="our .msgpack/orbax checkpoint (with --to_torch)")
    p.add_argument("--to_torch", default="", type=str,
                   help="output .pth.tar with reference state_dict names")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p


def _example(cfg, mem_type: str):
    base = tuple(int(s) for s in cfg.INPUT.BASE_SIZE)
    t = int(cfg.INPUT.VIDEO_LENGTH)
    shape = ((2, 2, t, base[0], base[1], 3) if mem_type == "simsiam"
             else (2, t, base[0], base[1], 3))
    return np.zeros(shape, np.float32)


def _load_torch_payload(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        return obj
    return {"state_dict": obj}


def convert_to_native(args, cfg) -> None:
    payload = _load_torch_payload(args.torch_ckpt)
    sd = payload["state_dict"]
    kind = args.what
    if kind == "auto":
        kind = detect_kind({k: None for k in sd})
        print(f"=> detected checkpoint kind: {kind}")

    if kind == "cmc_pretrain" and str(cfg.CROSS.MODALITY) == "visual":
        raise ValueError(
            "checkpoint has two CMC stacks (model_1/model_2) but the config "
            "has CROSS.MODALITY=visual — pass the CMC config/overrides")
    if kind in ("pretrain", "cmc_pretrain"):
        model, _ = create_visual_model(cfg)
        mem = payload.get("contrast") or {}
        # bank: one memory row per dataset sample (CMC bank: memory_1/2)
        n_data = 1
        for mk in ("memory", "memory_1"):
            if mk in mem:
                n_data = int(np.asarray(mem[mk]).shape[0])
                break
        state, _tx = create_pretrain_state(
            cfg, model, _example(cfg, cfg.CONTRAST.MEM_TYPE), n_data=n_data)
        state, notes = graft_pretrain_state(state, payload, cfg)
    else:
        model, _ = create_video_model(cfg)
        state, _tx = create_downstream_state(cfg, model, _example(cfg, "moco"))
        state, notes = graft_downstream_state(state, payload, cfg)

    epoch = int(payload.get("epoch", 0))
    out = args.output or (os.path.splitext(args.torch_ckpt)[0] + ".msgpack")
    save_checkpoint_state(out, state, epoch=epoch,
                          extra={"converted_from": os.path.basename(
                              args.torch_ckpt), **notes})
    print(f"=> wrote '{out}' (epoch {epoch})")
    for k, v in notes.items():
        print(f"   {k}: {v}")


def convert_to_torch(args, cfg) -> None:
    import torch

    ssl_sd, meta = load_params_only(args.checkpoint)
    params, stats = ssl_sd["params"], ssl_sd.get("batch_stats", {})
    if "model" in params:
        out_sd = export_pretrain_to_torch(
            params, stats, str(cfg.CONTRAST.MEM_TYPE), str(cfg.CROSS.HEAD_TYPE),
            graph_sub_sample=bool(cfg.GRAPH.SUB_SAMPLE))
    elif "model_1" in params:
        from video_graph_ssl_tpu.utils.ckpt_convert import (
            export_cmc_pretrain_to_torch)

        out_sd = export_cmc_pretrain_to_torch(
            params, stats, str(cfg.CROSS.HEAD_TYPE),
            graph_sub_sample=bool(cfg.GRAPH.SUB_SAMPLE))
    elif "new_fc" in params:
        out_sd = export_downstream_to_torch(
            params, stats, graph_sub_sample=bool(cfg.GRAPH.SUB_SAMPLE))
    else:
        raise ValueError(f"unrecognized params layout: {sorted(params)}")
    payload = {
        "epoch": int(meta.get("epoch", 0)),
        "state_dict": {k: torch.from_numpy(np.array(v, np.float32))
                       for k, v in out_sd.items()},
    }
    torch.save(payload, args.to_torch)
    print(f"=> wrote '{args.to_torch}' ({len(out_sd)} tensors, "
          f"epoch {payload['epoch']})")


def main(argv=None):
    args = get_parser().parse_args(argv)
    config = cfg.clone()
    if args.config_file:
        config.merge_from_file(args.config_file)
    config.merge_from_list(args.opts)
    config.freeze()
    if args.torch_ckpt:
        convert_to_native(args, config)
    elif args.checkpoint and args.to_torch:
        convert_to_torch(args, config)
    else:
        raise SystemExit("pass --torch_ckpt (to native) or "
                         "--checkpoint + --to_torch (to reference names)")


if __name__ == "__main__":
    main()
