#!/usr/bin/env python
"""SSL contrastive pretraining (moco / bank / simsiam), TPU-native.

Counterpart of the reference's tools/train_video_contrast_dis.py (597 LoC of
mp.spawn + NCCL DDP + ShuffleBN + apex).  Here: single-controller JAX — one
process drives the whole mesh; the global batch is sharded over the 'data'
axis; gradient sync, key all-gather, and memory broadcast are implicit in
the jitted step (see video_graph_ssl_tpu/parallel/mesh.py for the mapping).

Usage (same CLI as the reference, README.md:9-16):
    python tools/train_video_contrast_dis.py \
        --config_file configs/visual_moco.yaml [KEY VALUE ...]

The reference's distributed flags (--rank/--world_size/--dist-url/
--multiprocessing-distributed) are accepted for drop-in compatibility and
ignored: there are no per-GPU processes to spawn.
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
from video_graph_ssl_tpu.data import build_video_contrastive_loader
from video_graph_ssl_tpu.engine import (
    create_pretrain_state,
    jit_train_step,
    make_fused_pretrain_step,
)
from video_graph_ssl_tpu.models import create_visual_model
from video_graph_ssl_tpu.parallel import (
    maybe_initialize_distributed,
    mesh_from_cfg,
    process_batch_slice,
    replicate_state,
    shard_batch,
)
from video_graph_ssl_tpu.solver import make_lr_scheduler
from video_graph_ssl_tpu.utils import (
    AverageMeter,
    creat_saver,
    load_checkpoint_any,
)


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="TPU-native video contrastive pretraining")
    parser.add_argument("--config_file", default="", type=str,
                        help="path to YAML config")
    # Reference DDP flags, accepted and ignored (single-controller runtime):
    parser.add_argument("--rank", default=0, type=int, help="(ignored)")
    parser.add_argument("--world_size", default=1, type=int, help="(ignored)")
    parser.add_argument("--dist-url", default="", type=str, help="(ignored)")
    parser.add_argument("--multiprocessing-distributed", action="store_true",
                        help="(ignored)")
    parser.add_argument("--max_steps", default=0, type=int,
                        help="debug: cap total steps (0 = unlimited)")
    parser.add_argument("--profile_dir", default="", type=str,
                        help="capture a jax.profiler trace of steps 5-10 "
                        "of the first epoch into this directory")
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="config overrides: KEY VALUE ...")
    return parser


class Trainer:
    """Counterpart of the reference Trainer (:32-530) without the DDP/apex
    plumbing: parse config -> build model/loader/state -> jitted epoch loop."""

    def __init__(self, config, args):
        self.cfg = config
        self.args = args
        maybe_initialize_distributed()
        self.mesh = mesh_from_cfg(config)
        # Multi-host: each process decodes only its rows of the global batch
        # (the reference's DistributedSampler role, lib/data/build.py:49).
        self.batch_slice = (
            process_batch_slice(int(config.DATALOADER.BATCH_SIZE), self.mesh)
            if jax.process_count() > 1 else None)

        self.saver, self.writer = creat_saver(config)
        self.model, self.feat_dim = create_visual_model(config)
        self.train_loader, self.n_data = build_video_contrastive_loader(
            config, batch_slice=self.batch_slice)
        self.lr_fn = make_lr_scheduler(config)

        # Init on a tiny slice of a real host batch (shapes only).
        probe = next(iter(self.train_loader.epoch(0)))
        example = self._example_from(probe)
        self.state, self.tx = create_pretrain_state(
            config, self.model, example, n_data=self.n_data)
        self._load_pretrain_backbone()
        self.state = replicate_state(self.state, self.mesh)

        step_fn = make_fused_pretrain_step(config, self.model, self.tx,
                                           n_data=self.n_data,
                                           mesh=self.mesh)
        self.step_fn = jit_train_step(config, step_fn)

        self.start_epoch = int(config.SOLVER.START_EPOCH)
        self.best_pred = 0.0
        self._resume()

        self.batch_time = AverageMeter()
        self.data_time = AverageMeter()
        self.losses = AverageMeter()
        self.top1 = AverageMeter()
        self.top5 = AverageMeter()

        # Graceful preemption (beyond the reference, whose only recovery
        # is resume-from-last-periodic-checkpoint): on SIGTERM — what TPU
        # pod preemption delivers — finish the in-flight step, write
        # checkpoint_preempt.msgpack carrying the CURRENT epoch (so resume
        # restarts this epoch), and exit cleanly.
        self._preempted = False
        import signal

        signal.signal(signal.SIGTERM, self._on_sigterm)

    def _on_sigterm(self, signum, frame):
        print("=> SIGTERM: checkpointing after the current step...",
              flush=True)
        self._preempted = True

    def _example_from(self, probe):
        """Shape template for init: (2, V, T, h, w, C) float after augment."""
        base = tuple(int(s) for s in self.cfg.INPUT.BASE_SIZE)
        t = int(self.cfg.INPUT.VIDEO_LENGTH)
        mem_type = self.cfg.CONTRAST.MEM_TYPE
        if mem_type == "simsiam":
            shape = (2, 2, t, base[0], base[1], 3)
        else:
            shape = (2, t, base[0], base[1], 3)
        return np.zeros(shape, np.float32)

    def _load_pretrain_backbone(self):
        """MODEL.PRETRAIN_PATH backbone warm-start for SSL pretraining
        (reference: visual_wrappers.py:137-139 loads a bare-backbone
        state_dict at encoder build). The EMA encoder starts as a copy of
        the warm-started model, like the reference's
        _momentum_update(..., 0) right after build (:145-146)."""
        path = str(self.cfg.MODEL.PRETRAIN_PATH)
        if not self.cfg.MODEL.PRETRAINED or path in ("", "none", "/"):
            return
        if not os.path.exists(path):
            raise RuntimeError(f"=> no pretrain backbone found at '{path}'")
        from video_graph_ssl_tpu.utils.ckpt_convert import (
            graft_like,
            load_backbone_init,
        )

        bp, bs = load_backbone_init(path, str(self.cfg.MODEL.BACKBONE))

        def with_backbone(tree, new):
            # every encoder stack gets the warm start ('model' for
            # moco/bank/simsiam; 'model_1'/'model_2' for CMC)
            root = dict(tree)
            for name, sub in root.items():
                if isinstance(sub, dict) and "encoder" in sub:
                    model = dict(sub)
                    enc = dict(model["encoder"])
                    enc["base_model"] = graft_like(
                        enc["base_model"], new, f"{name}.encoder.base_model")
                    model["encoder"] = enc
                    root[name] = model
            return root

        self.state = self.state.replace(
            params=with_backbone(self.state.params, bp),
            batch_stats=(with_backbone(self.state.batch_stats, bs)
                         if bs else self.state.batch_stats))
        if self.state.ema_params is not None:
            self.state = self.state.replace(
                ema_params=with_backbone(self.state.ema_params, bp),
                ema_batch_stats=(with_backbone(self.state.ema_batch_stats, bs)
                                 if bs else self.state.ema_batch_stats))
        print(f"=> initialized backbone from '{path}' "
              f"(MODEL.PRETRAIN_PATH)")

    def _resume(self):
        path = self.cfg.CHECKPOINT.RESUME
        if path and path != "none":
            if not os.path.exists(path):
                raise RuntimeError(f"=> no checkpoint found at '{path}'")
            self.state, meta = load_checkpoint_any(path, self.state)
            self.state = replicate_state(self.state, self.mesh)
            if not self.cfg.CHECKPOINT.FINETUNE:
                self.start_epoch = int(meta.get("epoch", 0))
                self.best_pred = float(meta.get("best_pred", 0.0))
            print(f"=> loaded checkpoint '{path}' (epoch {meta.get('epoch')})")

    def train(self, epoch: int):
        for m in (self.batch_time, self.data_time, self.losses,
                  self.top1, self.top5):
            m.reset()
        lr = self.lr_fn(epoch)
        num_img_tr = len(self.train_loader)
        bsz = int(self.cfg.DATALOADER.BATCH_SIZE)
        print_freq = int(self.cfg.CHECKPOINT.PRINT_FREQ)

        end = time.time()
        profiling = bool(self.args.profile_dir) and epoch == self.start_epoch
        for i, batch in enumerate(self.train_loader.epoch(epoch)):
            self.data_time.update(time.time() - end)
            if profiling and i == 5:
                jax.profiler.start_trace(self.args.profile_dir)
            batch = shard_batch(batch, self.mesh,
                                local=self.batch_slice is not None)
            self.state, metrics = self.step_fn(self.state, batch, lr)
            if profiling and i == 10:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                print(f"profiler trace written to {self.args.profile_dir}")
                profiling = False

            if i % print_freq == 0 or i == num_img_tr - 1:
                m = {k: float(v) for k, v in metrics.items()}  # device sync
                self.losses.update(m["loss"], bsz)
                if "top1" in m:
                    self.top1.update(m["top1"], bsz)
                    self.top5.update(m["top5"], bsz)
                self.batch_time.update(time.time() - end)
                self.writer.add_scalar("train/total_loss_iter", m["loss"],
                                       i + num_img_tr * epoch)
                print(
                    f"Epoch: [{epoch}][{i}/{num_img_tr}], lr: {lr:.5f}\t"
                    f"Time {self.batch_time.val:.3f} ({self.batch_time.avg:.3f})\t"
                    f"Data {self.data_time.val:.3f} ({self.data_time.avg:.3f})\t"
                    f"Loss {self.losses.val:.4f} ({self.losses.avg:.4f})\t"
                    f"Prec@1 {self.top1.val:.3f} ({self.top1.avg:.3f})\t"
                    f"Prec@5 {self.top5.val:.3f} ({self.top5.avg:.3f})"
                )
            end = time.time()
            if self._preempted:
                print("======>Preemption Checkpoint...", flush=True)
                self.saver.save_checkpoint(
                    self.state, epoch, self.best_pred,
                    filename="checkpoint_preempt.msgpack")
                return
            if self.args.max_steps and (i + 1 + num_img_tr * epoch
                                        ) >= self.args.max_steps:
                break

        self.writer.add_scalar("train/loss", self.losses.avg, epoch)
        self.writer.add_scalar("train/top1_acc", self.top1.avg, epoch)
        self.writer.add_scalar("train/top5_acc", self.top5.avg, epoch)
        self.writer.add_scalar("lr", lr, epoch)

        interval = int(self.cfg.CHECKPOINT.CHECKPOINT_INTERVAL)
        last = int(self.cfg.SOLVER.MAX_EPOCHS) - 1
        if (epoch + 1) % interval == 0 or epoch == last:
            print("======>Saving Checkpoint...")
            self.saver.save_checkpoint(
                self.state, epoch + 1, self.best_pred,
                filename=f"checkpoint_{epoch + 1}.msgpack")

    def run(self):
        for epoch in range(self.start_epoch, int(self.cfg.SOLVER.MAX_EPOCHS)):
            self.train(epoch)
            if self._preempted:
                break
            # --max_steps N runs N total steps, spanning epochs when the
            # split is shorter than N steps (smoke runs break here after
            # their first epoch exactly as before)
            if self.args.max_steps and ((epoch + 1) * len(self.train_loader)
                                        >= self.args.max_steps):
                break
        from video_graph_ssl_tpu.utils import wait_for_async_checkpoints
        wait_for_async_checkpoints()  # commit in-flight orbax saves
        self.writer.close()


def main():
    args = get_parser().parse_args()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    print(f"Running with config:\n{cfg}")
    trainer = Trainer(cfg, args)
    trainer.run()


if __name__ == "__main__":
    main()
