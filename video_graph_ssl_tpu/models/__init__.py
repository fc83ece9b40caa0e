"""Models: backbones (S3D, R3D, 2D ResNets), heads, SSL/downstream wrappers."""

from .build import (
    BACKBONES_2D,
    BACKBONES_3D,
    create_video_model,
    create_visual_model,
    encoder_cfg_from,
    graph_cfg_from,
)
from .heads import PredictionMLP, ProjectHead, ProjectionMLP, l2_normalize
from .s3d import S3D, S3D_FEATURE_DIM
from .resnet3d import ResNet3D
from .resnet2d import ResNet2D
from .i3dnon import I3DResNetNonLocal, NonLocalBlock3D
from .s3dg_text import (S3DGText, SelfGating, SentenceEmbedding,
                        build_word_to_token, space_to_depth_3d, tokenize)
from .wrappers import (
    CmcWrapper,
    ContrastWrapper,
    GraphWrapper,
    SimSiam,
    VideoModel,
    VisualEncoder,
    simsiam_d,
    temporal_diff,
)

__all__ = [
    "BACKBONES_2D", "BACKBONES_3D",
    "create_video_model", "create_visual_model",
    "encoder_cfg_from", "graph_cfg_from",
    "ProjectHead", "ProjectionMLP", "PredictionMLP", "l2_normalize",
    "S3D", "S3D_FEATURE_DIM", "ResNet3D", "ResNet2D",
    "I3DResNetNonLocal", "NonLocalBlock3D",
    "S3DGText", "SelfGating", "SentenceEmbedding",
    "build_word_to_token", "tokenize", "space_to_depth_3d",
    "VisualEncoder", "ContrastWrapper", "SimSiam", "GraphWrapper",
    "CmcWrapper", "temporal_diff", "VideoModel", "simsiam_d",
]
