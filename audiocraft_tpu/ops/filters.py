"""FIR lowpass filters and mel-scale band splitting (julius equivalents).

Replaces `julius.SplitBands` / `julius.LowPassFilters` used by the reference's
MultiBandProcessor (`modules/diffusion_schedule.py:35`) and RVM metric.
Windowed-sinc FIR banks evaluated as one grouped conv — MXU-friendly.
"""
import math
import typing as tp
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _lowpass_kernels(cutoffs: tp.Tuple[float, ...], zeros: int = 8) -> np.ndarray:
    """Kernel bank [F, W] of Hann-windowed sinc lowpass filters; cutoffs are
    normalized (fraction of the sample rate, in (0, 0.5])."""
    half = int(math.ceil(zeros / (2 * min(c for c in cutoffs if c > 0)))) \
        if any(c > 0 for c in cutoffs) else 1
    t = np.arange(-half, half + 1, dtype=np.float64)
    kernels = []
    for c in cutoffs:
        if c <= 0:
            k = np.zeros_like(t)
        elif c >= 0.5:
            k = np.zeros_like(t)
            k[half] = 1.0
        else:
            sinc = 2 * c * np.sinc(2 * c * t)
            window = np.hanning(2 * half + 1 + 2)[1:-1]
            warg = t / half
            window = np.where(np.abs(warg) <= 1, 0.5 * (1 + np.cos(np.pi * warg)), 0)
            k = sinc * window
        kernels.append(k)
    return np.stack(kernels).astype(np.float32)  # [F, W]


def lowpass_filters(x: jax.Array, cutoffs: tp.Sequence[float],
                    zeros: int = 8) -> jax.Array:
    """Apply F lowpass filters to x [..., T] -> [F, ..., T]."""
    kernels = _lowpass_kernels(tuple(float(c) for c in cutoffs), zeros)
    F_, W = kernels.shape
    half = (W - 1) // 2
    shape = x.shape
    flat = x.astype(jnp.float32).reshape(-1, shape[-1], 1)
    flat = jnp.pad(flat, ((0, 0), (half, half), (0, 0)))
    k = jnp.asarray(kernels.T[:, None, :])  # HIO [W, 1, F]
    y = jax.lax.conv_general_dilated(flat, k, (1,), ((0, 0),),
                                     dimension_numbers=("NHC", "HIO", "NHC"))
    # [N, T, F] -> [F, ..., T]
    y = jnp.moveaxis(y, -1, 0)
    return y.reshape(F_, *shape)


def hz_to_mel(f: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + f / 700.0)


def mel_to_hz(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_frequencies(n_freqs: int, fmin: float, fmax: float) -> np.ndarray:
    return mel_to_hz(np.linspace(hz_to_mel(np.array(fmin)),
                                 hz_to_mel(np.array(fmax)), n_freqs))


class SplitBands:
    """Split a signal into `n_bands` mel-spaced frequency bands summing back
    to the input (julius.SplitBands semantics)."""

    def __init__(self, sample_rate: float, n_bands: int, zeros: int = 8):
        assert n_bands >= 1
        self.sample_rate = sample_rate
        self.n_bands = n_bands
        # mel-spaced internal cutoffs (julius: drop the 0 and nyquist ends)
        cutoffs = mel_frequencies(n_bands + 1, 0.0, sample_rate / 2)[1:-1]
        self.cutoffs = tuple(float(c) / sample_rate for c in cutoffs)
        self.zeros = zeros

    def __call__(self, x: jax.Array) -> jax.Array:
        """x [..., T] -> bands [n_bands, ..., T] with sum(bands) == x."""
        if self.n_bands == 1:
            return x[None]
        lows = lowpass_filters(x, self.cutoffs, self.zeros)  # [F, ..., T]
        bands = [lows[0]]
        for i in range(1, len(self.cutoffs)):
            bands.append(lows[i] - lows[i - 1])
        bands.append(x - lows[-1])
        return jnp.stack(bands)
