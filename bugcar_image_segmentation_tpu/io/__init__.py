"""Frame IO: sources, capture threads, and the native C++ frame ring.

- :mod:`~.ring` — ctypes wrapper over io/native/frame_ring.cpp
- :mod:`~.sources` — synthetic / cv2 sources + ThreadedCapture
"""

from .ring import FrameRing
from .sources import OpenCVSource, SyntheticSource, ThreadedCapture

__all__ = ["FrameRing", "OpenCVSource", "SyntheticSource",
           "ThreadedCapture"]
