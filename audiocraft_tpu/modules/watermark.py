"""Watermark batching utils: pad (0/1/2-sided shifts) and mix.

Parity: `audiocraft/modules/watermark.py:13-80`. Host-side numpy (random
window logic), outputs feed the jitted loss step.
"""
import random
import typing as tp

import numpy as np


def pad(x_wm: np.ndarray, central: bool = False
        ) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Zero out the tails (or center) of the watermarked signal; returns
    (padded, true_predictions [B, 2, T]) (`watermark.py:13-40`)."""
    x_wm = np.asarray(x_wm)
    T = x_wm.shape[-1]
    max_start = int(0.33 * T)
    min_end = int(0.66 * T)
    starts = np.random.randint(0, max_start, size=(x_wm.shape[0],))
    ends = np.random.randint(min_end, T, size=(x_wm.shape[0],))
    mask = np.zeros_like(x_wm)
    for i in range(x_wm.shape[0]):
        mask[i, :, starts[i]:ends[i]] = 1
    if central:
        mask = 1 - mask
    padded = x_wm * mask
    true_predictions = np.concatenate([1 - mask, mask], axis=1)
    return padded, true_predictions


def mix(x: np.ndarray, x_wm: np.ndarray, window_size: float = 0.5,
        shuffle: bool = False) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Replace a window of the watermarked signal with clean audio; returns
    (mixed, true_predictions [B, 2, T]) (`watermark.py:43-80`)."""
    assert 0 < window_size <= 1, "window_size should be between 0 and 1"
    x = np.asarray(x)
    x_wm = np.asarray(x_wm).copy()
    total_frames = x.shape[-1]
    window_frames = int(window_size * total_frames)
    max_start_point = total_frames - window_frames
    start_point = random.randint(0, max_start_point)

    mask = np.ones_like(x_wm)
    mask[:, :, start_point:start_point + window_frames] = 0
    if shuffle:
        # mix with a shuffled batch element's clean audio
        perm = np.random.permutation(x.shape[0])
        donor = x[perm]
    else:
        donor = x
    mixed = x_wm * mask + donor * (1 - mask)
    true_predictions = np.concatenate([1 - mask, mask], axis=1)
    return mixed, true_predictions
