"""STFT losses: spectral convergence + log-magnitude, multi-resolution.

Parity: `audiocraft/losses/stftloss.py:17-207` (adapted, like the reference,
from the ParallelWaveGAN formulation).
"""
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import hann_window, stft

_EPS = float(np.finfo(np.float32).eps)


def _stft_mag(x: jax.Array, n_fft: int, hop_length: int, win_length: int,
              normalized: bool, eps: float = _EPS) -> jax.Array:
    """Magnitude STFT [B, frames, bins] of x [B, C, T] (`stftloss.py:17-44`)."""
    B, C, T = x.shape
    s = stft(x.reshape(B * C, T), n_fft, hop_length, win_length,
             window=hann_window(win_length), normalized=normalized)
    mag2 = jnp.real(s) ** 2 + jnp.imag(s) ** 2
    return jnp.sqrt(jnp.maximum(mag2, eps ** 2)).swapaxes(-1, -2)


def spectral_convergence(x_mag: jax.Array, y_mag: jax.Array,
                         epsilon: float = _EPS) -> jax.Array:
    """||Y - X||_F / ||Y||_F (`stftloss.py:45-62`)."""
    return (jnp.linalg.norm(y_mag - x_mag)
            / (jnp.linalg.norm(y_mag) + epsilon))


def log_stft_magnitude(x_mag: jax.Array, y_mag: jax.Array,
                       epsilon: float = _EPS) -> jax.Array:
    """L1 on log magnitudes (`stftloss.py:64-84`)."""
    return jnp.mean(jnp.abs(jnp.log(y_mag + epsilon) - jnp.log(x_mag + epsilon)))


class STFTLosses:
    """Single-resolution SC + log-mag pair (`stftloss.py:86-127`)."""

    def __init__(self, n_fft: int = 1024, hop_length: int = 120,
                 win_length: int = 600, normalized: bool = False,
                 epsilon: float = _EPS):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.normalized = normalized
        self.epsilon = epsilon

    def __call__(self, x: jax.Array, y: jax.Array):
        x_mag = _stft_mag(x, self.n_fft, self.hop_length, self.win_length,
                          self.normalized)
        y_mag = _stft_mag(y, self.n_fft, self.hop_length, self.win_length,
                          self.normalized)
        sc_loss = spectral_convergence(x_mag, y_mag, self.epsilon)
        mag_loss = log_stft_magnitude(x_mag, y_mag, self.epsilon)
        return sc_loss, mag_loss


class STFTLoss:
    """Weighted combination (`stftloss.py:129-162`)."""

    def __init__(self, n_fft: int = 1024, hop_length: int = 120,
                 win_length: int = 600, normalized: bool = False,
                 factor_sc: float = 0.1, factor_mag: float = 0.1):
        self.loss = STFTLosses(n_fft, hop_length, win_length, normalized)
        self.factor_sc = factor_sc
        self.factor_mag = factor_mag

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        sc_loss, mag_loss = self.loss(x, y)
        return self.factor_sc * sc_loss + self.factor_mag * mag_loss


class MRSTFTLoss:
    """Multi-resolution STFT loss (`stftloss.py:164-206`)."""

    def __init__(self, n_ffts: tp.Sequence[int] = (1024, 2048, 512),
                 hop_lengths: tp.Sequence[int] = (120, 240, 50),
                 win_lengths: tp.Sequence[int] = (600, 1200, 240),
                 factor_sc: float = 0.1, factor_mag: float = 0.1,
                 normalized: bool = False):
        assert len(n_ffts) == len(hop_lengths) == len(win_lengths)
        self.losses = [STFTLosses(fs, ss, wl, normalized)
                       for fs, ss, wl in zip(n_ffts, hop_lengths, win_lengths)]
        self.factor_sc = factor_sc
        self.factor_mag = factor_mag

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        sc_loss = jnp.zeros(())
        mag_loss = jnp.zeros(())
        for f in self.losses:
            sc_l, mag_l = f(x, y)
            sc_loss += sc_l
            mag_loss += mag_l
        sc_loss /= len(self.losses)
        mag_loss /= len(self.losses)
        return self.factor_sc * sc_loss + self.factor_mag * mag_loss
