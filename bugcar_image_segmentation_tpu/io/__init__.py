"""Frame IO: sources, capture threads, and the native C++ frame ring.

- :mod:`~.ring` — ctypes wrapper over io/native/frame_ring.cpp
- :mod:`~.sources` — synthetic / cv2 sources + ThreadedCapture
"""

from .health import DropCounter, StallWatchdog
from .ring import FrameRing
from .sources import OpenCVSource, SyntheticSource, ThreadedCapture

__all__ = ["DropCounter", "FrameRing", "OpenCVSource", "StallWatchdog",
           "SyntheticSource", "ThreadedCapture"]
