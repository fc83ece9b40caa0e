"""Native (C++) host-runtime components.

``jpeg_pool`` — GIL-free libjpeg decode pool with DCT-domain prescaling
for the frame-folder ingest path (the reference leans on torch DataLoader
worker processes + cv2 for this; lib/data/build.py:40-54).
"""

from .jpeg_pool import NativeJpegPool, native_jpeg_available

__all__ = ["NativeJpegPool", "native_jpeg_available"]
