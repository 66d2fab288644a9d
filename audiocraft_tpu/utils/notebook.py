"""Notebook helpers (`ref utils/notebook.py:17-32`)."""
import typing as tp

import numpy as np


def display_audio(samples, sample_rate: int) -> None:
    """Render an audio player per batch item in a notebook.

    samples: array-like [B, C, T] or [C, T] (jax, numpy, or torch).
    """
    import IPython.display as ipd  # noqa: deferred — notebook-only dep
    samples = np.asarray(samples)
    assert samples.ndim in (2, 3)
    if samples.ndim == 2:
        samples = samples[None]
    for audio in samples:
        ipd.display(ipd.Audio(audio, rate=sample_rate))
