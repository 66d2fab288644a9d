"""Mel-spectrogram losses.

Parity: `audiocraft/losses/specloss.py:18-149` (MelSpectrogramWrapper padding
laws, MelSpectrogramL1Loss, MultiScaleMelSpectrogramLoss with alternating
L1/L2 across fft scales 2^6..2^11 and sqrt alphas).
"""
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..modules.conv import pad1d, pad_for_conv1d
from ..ops.stft import mel_spectrogram


class MelSpectrogramWrapper:
    """Mel spectrogram with conv-style padding so frames = ceil(T / hop)
    (`specloss.py:18-63`). Input [B, C, T] or [B, T] -> [B, C*n_mels, F]."""

    def __init__(self, n_fft: int = 1024, hop_length: int = 256,
                 win_length: tp.Optional[int] = None, n_mels: int = 80,
                 sample_rate: float = 22050, f_min: float = 0.0,
                 f_max: tp.Optional[float] = None, log: bool = True,
                 normalized: bool = False, floor_level: float = 1e-5):
        self.n_fft = n_fft
        self.hop_length = int(hop_length)
        self.win_length = win_length or n_fft
        self.n_mels = n_mels
        self.sample_rate = int(sample_rate)
        self.f_min = f_min
        self.f_max = f_max
        self.log = log
        self.normalized = normalized
        self.floor_level = floor_level

    def __call__(self, x: jax.Array) -> jax.Array:
        if x.ndim == 2:
            x = x[:, None]
        B, C, T = x.shape
        p = int((self.n_fft - self.hop_length) // 2)
        # [B*C, T, 1] for our pad helpers (time axis = 1)
        xt = x.reshape(B * C, T, 1)
        xt = pad1d(xt, (p, p), mode="reflect")
        xt = pad_for_conv1d(xt, self.n_fft, self.hop_length)
        mel = mel_spectrogram(xt[..., 0], self.sample_rate, self.n_fft,
                              self.hop_length, self.win_length, self.n_mels,
                              self.f_min, self.f_max, power=2.0, center=False,
                              normalized=self.normalized)
        if self.log:
            mel = jnp.log10(self.floor_level + mel)
        F = mel.shape[-1]
        return mel.reshape(B, C * self.n_mels, F)


class MelSpectrogramL1Loss:
    """L1 on mel spectrograms (`specloss.py:65-94`)."""

    def __init__(self, sample_rate: int, n_fft: int = 1024,
                 hop_length: int = 256, win_length: int = 1024,
                 n_mels: int = 80, f_min: float = 0.0,
                 f_max: tp.Optional[float] = None, log: bool = True,
                 normalized: bool = False, floor_level: float = 1e-5):
        self.melspec = MelSpectrogramWrapper(
            n_fft=n_fft, hop_length=hop_length, win_length=win_length,
            n_mels=n_mels, sample_rate=sample_rate, f_min=f_min, f_max=f_max,
            log=log, normalized=normalized, floor_level=floor_level)

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        return jnp.mean(jnp.abs(self.melspec(x) - self.melspec(y)))


class MultiScaleMelSpectrogramLoss:
    """msspec: alternating linear-L1 / log-L2 across scales
    (`specloss.py:96-149`)."""

    def __init__(self, sample_rate: int, range_start: int = 6,
                 range_end: int = 11, n_mels: int = 64, f_min: float = 0.0,
                 f_max: tp.Optional[float] = None, normalized: bool = False,
                 alphas: bool = True, floor_level: float = 1e-5):
        self.l1s = []
        self.l2s = []
        self.alphas: tp.List[float] = []
        self.total = 0.0
        self.normalized = normalized
        for i in range(range_start, range_end):
            common = dict(n_mels=n_mels, sample_rate=sample_rate, f_min=f_min,
                          f_max=f_max, normalized=normalized,
                          floor_level=floor_level)
            self.l1s.append(MelSpectrogramWrapper(
                n_fft=2 ** i, hop_length=(2 ** i) // 4, win_length=2 ** i,
                log=False, **common))
            self.l2s.append(MelSpectrogramWrapper(
                n_fft=2 ** i, hop_length=(2 ** i) // 4, win_length=2 ** i,
                log=True, **common))
            self.alphas.append(float(np.sqrt(2 ** i - 1)) if alphas else 1.0)
            self.total += self.alphas[-1] + 1

    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        loss = jnp.zeros(())
        for i, alpha in enumerate(self.alphas):
            s_x_1, s_y_1 = self.l1s[i](x), self.l1s[i](y)
            s_x_2, s_y_2 = self.l2s[i](x), self.l2s[i](y)
            loss = (loss + jnp.mean(jnp.abs(s_x_1 - s_y_1))
                    + alpha * jnp.mean(jnp.square(s_x_2 - s_y_2)))
        if self.normalized:
            loss = loss / self.total
        return loss
