"""Mean IoU for binary localized-watermark masks.

Parity: `audiocraft/metrics/miou.py:10-44`.
"""
import numpy as np


def calculate_miou(y_pred, y_true) -> float:
    """mIoU between binary [B, frames] arrays (`miou.py:10-44`)."""
    y_pred = np.asarray(y_pred)
    y_true = np.asarray(y_true)
    if y_pred.shape != y_true.shape:
        raise ValueError("Input tensors must have the same shape")
    y_pred = y_pred > 0.5
    y_true = y_true.astype(bool)
    intersection = np.logical_and(y_pred, y_true)
    union = np.logical_or(y_pred, y_true)
    iou_per_sample = intersection.sum(axis=1) / np.maximum(union.sum(axis=1), 1)
    return float(iou_per_sample.mean())
