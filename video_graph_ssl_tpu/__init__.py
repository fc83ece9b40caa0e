"""video_graph_ssl_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
self-supervised video representation learning with graph contrastive
augmentation (GCA).

This is a ground-up TPU-first rebuild of the capabilities of the reference
PyTorch codebase ``ACMMM2021-Anonymous/video-graph-ssl``:

* 3D-CNN video encoders (S3D and friends) as Flax modules laid out
  channels-last for the MXU,
* the temporal-graph augmentation (similarity adjacency + relaxed-Bernoulli
  sampling + GCN message passing) as fused XLA/Pallas ops,
* MoCo queue / instance-discrimination memory bank / SimSiam objectives as
  functional on-device state,
* data-parallel (and beyond) scaling via ``jax.sharding.Mesh`` + jit, with
  ICI collectives replacing NCCL,
* the four reference CLI entry points and the YAML config schema preserved.
"""

__version__ = "0.1.0"
