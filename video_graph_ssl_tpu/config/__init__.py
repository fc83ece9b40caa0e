"""Config package: ``from video_graph_ssl_tpu.config import cfg``.

Mirrors the reference's ``from lib.config import cfg`` global-CfgNode pattern
(reference: lib/config/__init__.py:1).
"""

from .node import CfgNode
from .defaults import cfg

__all__ = ["cfg", "CfgNode"]
