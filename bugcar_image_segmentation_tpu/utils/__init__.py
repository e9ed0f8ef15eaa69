"""Utilities: checkpointing, profiling, logging, camera probing.

Replaces the reference's ``utils.py`` grab-bag (corner ordering moved to
geometry.py; ``freeze_session`` becomes checkpoint.py; ``testDevice``
becomes :func:`probe_cameras`).
"""

from __future__ import annotations

import logging
from typing import List

from .cache import enable_compile_cache
from .checkpoint import (load_variables, restore_train_state,
                         save_train_state, save_variables)
from .profiling import FPSMeter, StageTimer, trace


def get_logger(name: str = "bugcar_tpu") -> logging.Logger:
    """Structured logger — replaces the reference's stray prints
    (SURVEY.md §5: per-frame shape prints in the hot loop)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger


def probe_cameras(max_index: int = 10) -> List[int]:
    """Indices of openable video devices (reference utils.py:86-90's
    ``testDevice``, returning the result instead of printing warnings)."""
    import cv2

    available = []
    for i in range(max_index):
        cap = cv2.VideoCapture(i)
        if cap is not None and cap.isOpened():
            available.append(i)
            cap.release()
    return available


__all__ = [
    "save_variables", "load_variables", "save_train_state",
    "restore_train_state", "FPSMeter", "StageTimer", "trace",
    "get_logger", "probe_cameras",
]
