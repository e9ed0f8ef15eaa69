"""Model evaluation: accuracy / IoU over labeled frames.

The reference's ``evaluate_model.py`` is missing from the snapshot
(README.md:14: "evaluate the accuracy of this ENET model"; call stack
reconstructed in SURVEY.md §3.4).  This provides its capability as a
library: a jitted per-batch confusion-matrix accumulator and the derived
metrics (pixel accuracy, per-class accuracy/IoU, mean IoU), over either
raw backbone classes or the 3-class drivability remap — plus a bit-parity
harness comparing two segmentation maps cell by cell (the SURVEY.md §4
"bit-match masks and grid cells" requirement).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


from .models.api import Engine


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(pred: jax.Array, label: jax.Array,
                     num_classes: int) -> jax.Array:
    """(num_classes, num_classes) int32 matrix; rows = label, cols = pred.

    One scatter-add over the flattened pair index — jit-safe and
    batch-shape agnostic.  Pixels with label >= num_classes (ignore
    regions) are dropped.
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    label = label.reshape(-1).astype(jnp.int32)
    valid = (label >= 0) & (label < num_classes)
    idx = jnp.where(valid, label * num_classes + pred, num_classes ** 2)
    flat = jnp.zeros((num_classes ** 2 + 1,), jnp.int32).at[idx].add(1)
    return flat[:-1].reshape(num_classes, num_classes)


@dataclasses.dataclass(frozen=True)
class SegmentationMetrics:
    confusion: np.ndarray

    @property
    def pixel_accuracy(self) -> float:
        total = self.confusion.sum()
        return float(np.trace(self.confusion) / max(total, 1))

    @property
    def per_class_iou(self) -> np.ndarray:
        tp = np.diag(self.confusion).astype(np.float64)
        fp = self.confusion.sum(axis=0) - tp
        fn = self.confusion.sum(axis=1) - tp
        denom = tp + fp + fn
        return np.where(denom > 0, tp / np.maximum(denom, 1), np.nan)

    @property
    def mean_iou(self) -> float:
        iou = self.per_class_iou
        return float(np.nanmean(iou)) if np.isfinite(iou).any() else 0.0

    @property
    def per_class_accuracy(self) -> np.ndarray:
        tp = np.diag(self.confusion).astype(np.float64)
        support = self.confusion.sum(axis=1)
        return np.where(support > 0, tp / np.maximum(support, 1), np.nan)

    def summary(self) -> Dict[str, float]:
        return {
            "pixel_accuracy": self.pixel_accuracy,
            "mean_iou": self.mean_iou,
            **{f"iou_class_{i}": float(v)
               for i, v in enumerate(self.per_class_iou)},
        }


def evaluate_model(engine: Engine,
                   dataset: Iterable[Tuple[np.ndarray, np.ndarray]],
                   remap_labels: bool = True,
                   num_classes: Optional[int] = None,
                   ) -> SegmentationMetrics:
    """The ``evaluate_model.py`` capability (SURVEY.md §3.4).

    Args:
      engine: jitted inference engine.
      dataset: iterable of (bgr_frame, label_map).  Labels are backbone
        class ids (note_label:1-15 order); with ``remap_labels`` they are
        collapsed through the same 3-class table as predictions so the
        metric is drivability accuracy/IoU.
      num_classes: defaults to 3 (remapped) or the engine's class count.

    Returns accumulated :class:`SegmentationMetrics`.
    """
    if num_classes is None:
        num_classes = 3 if remap_labels else engine.cfg.num_classes
    table = jnp.asarray(engine.remap_table)
    total = jnp.zeros((num_classes, num_classes), jnp.int32)
    for frame, label in dataset:
        pred = engine.predict(frame)
        label = jnp.asarray(label)
        if remap_labels:
            label = table[label.astype(jnp.int32)]
        total = total + confusion_matrix(pred, label, num_classes)
    return SegmentationMetrics(confusion=np.asarray(total))


def bit_parity(a: np.ndarray, b: np.ndarray) -> Dict[str, float]:
    """Cell-level parity report between two maps/grids of equal shape."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    mismatch = int((a != b).sum())
    return {
        "total_cells": int(a.size),
        "mismatched_cells": mismatch,
        "parity": 1.0 - mismatch / max(a.size, 1),
    }


__all__ = ["confusion_matrix", "SegmentationMetrics", "evaluate_model",
           "bit_parity"]
