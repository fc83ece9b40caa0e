#!/usr/bin/env python
"""Downstream action-recognition training: fine-tune or linear probe.

Counterpart of the reference's tools/train_ds.py (:27-259): loads an SSL
checkpoint into the encoder skipping the classifier head (:70-79), freezes
everything but ``new_fc`` when MODEL.LINEAR_PROBE (:81-84), trains with CE,
validates every EVAL_INTERVAL with best-checkpoint promotion (:164-221).
The reference's nn.DataParallel (:86-87) becomes a batch sharded over the
device mesh inside one jitted step.

Usage:
    python tools/train_ds.py --config_file configs/action_fine_tune.yaml \
        [--ssl_checkpoint path.msgpack] [KEY VALUE ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from video_graph_ssl_tpu.config import cfg
from video_graph_ssl_tpu.data import make_data_loader
from video_graph_ssl_tpu.engine import (
    create_downstream_state,
    jit_train_step,
    make_fused_downstream_step,
    make_fused_eval_step,
)
from video_graph_ssl_tpu.models import create_video_model
from video_graph_ssl_tpu.parallel import (
    maybe_initialize_distributed,
    mesh_from_cfg,
    pad_batch_to_multiple,
    process_batch_slice,
    replicate_state,
    shard_batch,
)
from video_graph_ssl_tpu.solver import make_lr_scheduler
from video_graph_ssl_tpu.utils import (
    AverageMeter,
    accuracy,
    creat_saver,
    load_params_only,
    transfer_encoder_params,
)


def get_parser():
    parser = argparse.ArgumentParser(description="Downstream action training")
    parser.add_argument("--config_file", default="", type=str)
    parser.add_argument("--ssl_checkpoint", default="", type=str,
                        help="SSL pretrain checkpoint to initialize the "
                        "encoder from (MODEL.PRETRAIN_PATH also works)")
    parser.add_argument("--max_steps", default=0, type=int,
                        help="debug: cap steps per epoch (0 = unlimited)")
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    return parser


class Trainer:
    def __init__(self, config, args):
        self.cfg = config
        self.args = args
        maybe_initialize_distributed()
        self.mesh = mesh_from_cfg(config)
        # Multi-host: train loader decodes only this process's batch rows;
        # validation keeps full host batches (ragged tails) and lets
        # shard_batch slice them.
        self.batch_slice = (
            process_batch_slice(int(config.DATALOADER.BATCH_SIZE), self.mesh)
            if jax.process_count() > 1 else None)

        self.saver, self.writer = creat_saver(config)
        self.model, self.feat_dim = create_video_model(config)
        self.train_loader = make_data_loader(config, is_train=True,
                                             batch_slice=self.batch_slice)
        self.val_loader = make_data_loader(config, is_train=False)
        self.lr_fn = make_lr_scheduler(config)

        base = tuple(int(s) for s in config.INPUT.BASE_SIZE)
        t = int(config.INPUT.VIDEO_LENGTH)
        example = np.zeros((2, t, base[0], base[1], 3), np.float32)
        self.state, self.tx = create_downstream_state(config, self.model,
                                                      example)
        self._load_ssl_checkpoint()
        self.state = replicate_state(self.state, self.mesh)

        # Linear probe BN semantics: 'eval' runs the frozen encoder on
        # running stats; 'reference' keeps the reference's partial-BN train
        # mode (first BN live — model_wrappers.py:130-146; the VideoModel's
        # partial_bn flag freezes the rest).  A/B: perf/probe_bn_lab.py.
        probe_bn = str(config.MODEL.PROBE_BN)
        if probe_bn not in ("eval", "reference"):
            raise ValueError(f"MODEL.PROBE_BN must be eval|reference, "
                             f"got {probe_bn}")
        bn_train = (not bool(config.MODEL.LINEAR_PROBE)
                    or probe_bn == "reference")
        self.step_fn = jit_train_step(
            config,
            make_fused_downstream_step(config, self.model, self.tx, bn_train))
        self.eval_fn = make_fused_eval_step(config, self.model)

        self.best_pred = 0.0
        self.meters = {k: AverageMeter()
                       for k in ("batch_time", "data_time", "loss",
                                 "top1", "top5")}

        # Graceful preemption: SIGTERM -> finish step, checkpoint, exit
        # (same contract as the pretrain tool).
        self._preempted = False
        import signal

        signal.signal(signal.SIGTERM, self._on_sigterm)

    def _on_sigterm(self, signum, frame):
        print("=> SIGTERM: checkpointing after the current step...",
              flush=True)
        self._preempted = True

    def _load_ssl_checkpoint(self):
        """Checkpoint surgery (reference: train_ds.py:65-84)."""
        path = self.args.ssl_checkpoint or self.cfg.MODEL.PRETRAIN_PATH
        if not path or path in ("none", "/"):
            return
        if not os.path.exists(path):
            raise RuntimeError(f"=> no SSL checkpoint found at '{path}'")
        ssl_sd, meta = load_params_only(path)
        new_params, new_stats = transfer_encoder_params(
            ssl_sd, dict(self.state.params), dict(self.state.batch_stats),
            mem_type=self.cfg.CONTRAST.MEM_TYPE)
        self.state = self.state.replace(params=new_params,
                                        batch_stats=new_stats)
        print(f"=> initialized encoder from '{path}' "
              f"(epoch {meta.get('epoch')}), new_fc randomly initialized")

    def training(self, epoch: int):
        for m in self.meters.values():
            m.reset()
        lr = self.lr_fn(epoch)
        num_img_tr = len(self.train_loader)
        bsz = int(self.cfg.DATALOADER.BATCH_SIZE)
        print_freq = int(self.cfg.CHECKPOINT.PRINT_FREQ)

        end = time.time()
        for i, batch in enumerate(self.train_loader.epoch(epoch)):
            self.meters["data_time"].update(time.time() - end)
            batch = shard_batch(batch, self.mesh,
                                local=self.batch_slice is not None)
            self.state, metrics = self.step_fn(self.state, batch, lr)
            if i % print_freq == 0 or i == num_img_tr - 1:
                m = {k: float(v) for k, v in metrics.items()}
                self.meters["loss"].update(m["loss"], bsz)
                self.meters["top1"].update(m["top1"], bsz)
                self.meters["top5"].update(m["top5"], bsz)
                self.meters["batch_time"].update(time.time() - end)
                self.writer.add_scalar("train/total_loss_iter", m["loss"],
                                       i + num_img_tr * epoch)
                print(f"Epoch: [{epoch}][{i}/{num_img_tr}], lr: {lr:.5f}\t"
                      f"Loss {self.meters['loss'].val:.4f} "
                      f"({self.meters['loss'].avg:.4f})\t"
                      f"Prec@1 {self.meters['top1'].val:.3f} "
                      f"({self.meters['top1'].avg:.3f})\t"
                      f"Prec@5 {self.meters['top5'].val:.3f} "
                      f"({self.meters['top5'].avg:.3f})")
            end = time.time()
            if self._preempted:
                print("======>Preemption Checkpoint...", flush=True)
                self.saver.save_checkpoint(
                    self.state, epoch, self.best_pred,
                    filename="checkpoint_preempt.msgpack")
                return
            if self.args.max_steps and i + 1 >= self.args.max_steps:
                break

        self.writer.add_scalar("train/loss", self.meters["loss"].avg, epoch)
        self.writer.add_scalar("train/top1_acc", self.meters["top1"].avg, epoch)
        self.writer.add_scalar("lr", lr, epoch)

    def validation(self, epoch: int):
        """(reference: train_ds.py:164-221)"""
        all_logits, all_labels = [], []
        n_dev = self.mesh.shape["data"]
        for i, batch in enumerate(self.val_loader.epoch(epoch)):
            padded, real_n = pad_batch_to_multiple(
                {"clips": batch["clips"]}, n_dev)
            clips = shard_batch(padded, self.mesh)["clips"]
            logits = self.eval_fn(self.state, clips)
            all_logits.append(np.asarray(logits)[:real_n])
            all_labels.append(batch["label"])
            if self.args.max_steps and i + 1 >= self.args.max_steps:
                break
        logits = np.concatenate(all_logits)
        labels = np.concatenate(all_labels)
        top1, top5 = accuracy(logits, labels, topk=(1, 5))
        print(f"Validation: [Epoch: {epoch}] Prec@1 {top1:.3f} Prec@5 {top5:.3f}")
        self.writer.add_scalar("val/top1_acc", top1, epoch)
        self.writer.add_scalar("val/top5_acc", top5, epoch)

        if top1 > self.best_pred:
            self.best_pred = top1
            self.saver.save_checkpoint(
                self.state, epoch + 1, self.best_pred, is_best=True,
                filename="model_best_state.msgpack")
        return top1

    def run(self):
        for epoch in range(int(self.cfg.SOLVER.START_EPOCH),
                           int(self.cfg.SOLVER.MAX_EPOCHS)):
            self.training(epoch)
            if self._preempted:
                break
            no_val = bool(self.cfg.CHECKPOINT.NO_VAL)
            eval_int = int(self.cfg.CHECKPOINT.EVAL_INTERVAL)
            if not no_val and (epoch + 1) % eval_int == 0:
                self.validation(epoch)
            interval = int(self.cfg.CHECKPOINT.CHECKPOINT_INTERVAL)
            if (epoch + 1) % interval == 0:
                self.saver.save_checkpoint(
                    self.state, epoch + 1, self.best_pred,
                    filename=f"checkpoint_{epoch + 1}.msgpack")
            if self.args.max_steps:
                break
        self.writer.close()


def main():
    args = get_parser().parse_args()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    print(f"Running with config:\n{cfg}")
    Trainer(cfg, args).run()


if __name__ == "__main__":
    main()
