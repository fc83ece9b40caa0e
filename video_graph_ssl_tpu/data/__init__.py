"""Data: split parsing, frame samplers, decode, on-device transforms, loaders."""

from .build import build_video_contrastive_loader, make_data_loader, make_test_loader
from .datasets import ContrastiveDataset, FrameDataset
from .pipeline import Loader
from .records import VideoRecord, parse_split
from .synthetic import SyntheticContrastiveDataset, SyntheticFrameDataset
from .transforms_device import make_batch_augment, make_batch_augment_fn
from .shards import ShardStore, write_shard_store
from .video_io import cache, load_video, video_info, write_video

__all__ = [
    "build_video_contrastive_loader",
    "make_data_loader",
    "make_test_loader",
    "ContrastiveDataset",
    "FrameDataset",
    "Loader",
    "VideoRecord",
    "parse_split",
    "SyntheticContrastiveDataset",
    "SyntheticFrameDataset",
    "make_batch_augment",
    "make_batch_augment_fn",
    "ShardStore",
    "write_shard_store",
    "cache",
    "load_video",
    "video_info",
    "write_video",
]
