"""Relative Volume Mel (RVM) metric.

Parity: `audiocraft/metrics/rvm.py:22-110` — dB-interpretable mel-spectrogram
distortion measure, aggregated per frequency band.
"""
import typing as tp

import jax.numpy as jnp

from ..ops.stft import mel_spectrogram


def db_to_scale(volume: float):
    return 10 ** (volume / 20)


def scale_to_db(scale, min_volume: float = -120.0):
    min_scale = db_to_scale(min_volume)
    return 20 * jnp.log10(jnp.clip(scale, min_scale))


class RelativeVolumeMel:
    """`rvm.py:22-110`. Lower (more negative) = less distortion."""

    def __init__(self, sample_rate: int = 24000, n_mels: int = 80,
                 n_fft: int = 512, hop_length: int = 128,
                 min_relative_volume: float = -25,
                 max_relative_volume: float = 25,
                 max_initial_gain: float = 25,
                 min_activity_volume: float = -25,
                 num_aggregated_bands: int = 4) -> None:
        self.sample_rate = sample_rate
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.min_relative_volume = min_relative_volume
        self.max_relative_volume = max_relative_volume
        self.max_initial_gain = max_initial_gain
        self.min_activity_volume = min_activity_volume
        self.num_aggregated_bands = num_aggregated_bands

    def _melspec(self, x):
        return mel_spectrogram(x, self.sample_rate, self.n_fft,
                               self.hop_length, n_mels=self.n_mels,
                               power=2.0, normalized=True)

    def __call__(self, estimate, ground_truth) -> tp.Dict[str, jnp.ndarray]:
        """estimate/ground_truth [*, T] -> {'rvm', 'rvm_k'} (`rvm.py:85-110`)."""
        estimate = jnp.asarray(estimate)
        ground_truth = jnp.asarray(ground_truth)
        min_scale = db_to_scale(-self.max_initial_gain)
        std = jnp.maximum(jnp.sqrt(jnp.mean(jnp.square(ground_truth))), min_scale)
        z_gt = jnp.sqrt(self._melspec(ground_truth / std))
        z_est = jnp.sqrt(self._melspec(estimate / std))
        delta = z_gt - z_est
        ref_db = scale_to_db(z_gt, self.min_activity_volume)
        delta_db = scale_to_db(jnp.abs(delta), min_volume=-120)
        relative_db = jnp.clip(delta_db - ref_db, self.min_relative_volume,
                               self.max_relative_volume)
        # mean over everything but the mel-band axis (-2)
        dims = tuple(d for d in range(relative_db.ndim) if d != relative_db.ndim - 2)
        losses_per_band = relative_db.mean(axis=dims)
        chunks = jnp.array_split(losses_per_band, self.num_aggregated_bands)
        metrics = {f"rvm_{i}": chunk.mean() for i, chunk in enumerate(chunks)}
        metrics["rvm"] = losses_per_band.mean()
        return metrics
