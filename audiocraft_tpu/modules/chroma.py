"""Chromagram extraction: STFT -> chroma filter bank.

Parity: `audiocraft/modules/chroma.py:16-66` (ChromaExtractor). The chroma
filter bank is computed natively with the standard librosa formula
(Gaussian-weighted pitch-class mapping with octave weighting) instead of
importing librosa.
"""
import math
import typing as tp
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import spectrogram


@lru_cache(maxsize=16)
def chroma_filters(sample_rate: int, n_fft: int, n_chroma: int = 12,
                   tuning: float = 0.0, ctroct: float = 5.0,
                   octwidth: tp.Optional[float] = 2.0,
                   base_c: bool = True) -> np.ndarray:
    """Chroma filter bank [n_chroma, 1 + n_fft/2] (librosa.filters.chroma)."""
    wts = np.zeros((n_chroma, n_fft))
    frequencies = np.linspace(0, sample_rate, n_fft, endpoint=False)[1:]
    frqbins = n_chroma * (np.log2(frequencies / (440.0 * 2.0 ** (-57 / 12)))
                          ) - tuning
    frqbins = np.concatenate(([frqbins[0] - 1.5 * n_chroma], frqbins))
    binwidthbins = np.concatenate((np.maximum(frqbins[1:] - frqbins[:-1], 1.0),
                                   [1]))
    D = np.subtract.outer(frqbins, np.arange(0, n_chroma, dtype="d")).T
    n_chroma2 = np.round(float(n_chroma) / 2)
    D = np.remainder(D + n_chroma2 + 10 * n_chroma, n_chroma) - n_chroma2
    wts = np.exp(-0.5 * (2 * D / np.tile(binwidthbins, (n_chroma, 1))) ** 2)
    # normalize each column
    wts /= np.maximum(np.sqrt(np.sum(wts ** 2, axis=0, keepdims=True)), 1e-12)
    if octwidth is not None:
        wts *= np.tile(
            np.exp(-0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2)),
            (n_chroma, 1))
    if base_c:
        wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return np.ascontiguousarray(wts[:, :int(1 + n_fft / 2)], dtype=np.float32)


class ChromaExtractor:
    """STFT-chroma extractor (`modules/chroma.py:16-66`).
    __call__: wav [B, C, T] or [B, T] -> chroma [B, frames, n_chroma]."""

    def __init__(self, sample_rate: int, n_chroma: int = 12,
                 radix2_exp: int = 12, nfft: tp.Optional[int] = None,
                 winlen: tp.Optional[int] = None,
                 winhop: tp.Optional[int] = None, argmax: bool = False,
                 norm: float = float("inf")):
        self.winlen = winlen or 2 ** radix2_exp
        self.nfft = nfft or self.winlen
        self.winhop = winhop or (self.winlen // 4)
        self.sample_rate = sample_rate
        self.n_chroma = n_chroma
        self.argmax = argmax
        self.norm = norm
        self.fbanks = jnp.asarray(chroma_filters(sample_rate, self.nfft,
                                                 n_chroma))

    def __call__(self, wav: jax.Array) -> jax.Array:
        if wav.ndim == 3:
            wav = wav.mean(axis=1)
        T = wav.shape[-1]
        if T < self.nfft:
            pad = self.nfft - T
            wav = jnp.pad(wav, ((0, 0), (math.ceil(pad / 2), pad // 2)))
        spec = spectrogram(wav, self.nfft, self.winhop, self.winlen,
                           power=2.0, center=True, normalized=True)
        chroma = jnp.einsum("cf,bft->bct", self.fbanks.astype(spec.dtype), spec)
        # inf-norm normalization per frame
        denom = jnp.max(jnp.abs(chroma), axis=1, keepdims=True)
        chroma = chroma / jnp.maximum(denom, 1e-6)
        chroma = jnp.swapaxes(chroma, 1, 2)  # [B, frames, n_chroma]
        if self.argmax:
            idx = jnp.argmax(chroma, axis=-1)
            chroma = jax.nn.one_hot(idx, self.n_chroma, dtype=chroma.dtype)
        return chroma
