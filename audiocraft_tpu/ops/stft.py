"""STFT / mel-spectrogram ops in pure JAX.

Replaces torch.stft / torchaudio.MelSpectrogram used by the reference losses
(`audiocraft/losses/stftloss.py:17-44`, `losses/specloss.py:18-63`). Framing
is one strided gather + window + rfft — XLA fuses window/scale into the FFT's
pre-pass.
"""
import math
import typing as tp
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann, matching torch.hann_window(periodic=True)."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * math.pi * n / win_length)


def frame(x: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """[..., T] -> [..., n_frames, frame_length] (no padding)."""
    T = x.shape[-1]
    n_frames = 1 + (T - frame_length) // hop_length
    idx = (np.arange(n_frames)[:, None] * hop_length
           + np.arange(frame_length)[None, :])
    return x[..., idx]


@lru_cache(maxsize=16)
def _dft_matrices(n_fft: int) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis [n_fft, n_fft//2+1] (cos, -sin) for matmul-DFT."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


# n_fft at or below this runs as a matmul-DFT: on TPU the FFT lowering is
# pathologically slow to compile (~40s/shape on the axon platform) while the
# [F, n_fft] x [n_fft, n_fft/2+1] matmul maps straight onto the MXU.
_MATMUL_DFT_MAX_NFFT = 4096


def _norm_factor(normalized, n_fft: int, window: jax.Array):
    """STFT normalization divisor. torch.stft(normalized=True) divides by
    frame_length**0.5; torchaudio's Spectrogram(normalized=True) divides by
    the window L2 norm ("window" mode). Callers mirroring torchaudio modules
    (MS-STFT discriminator, mel wrappers, chroma) must pass "window"."""
    if normalized is False or normalized is None:
        return None
    if normalized is True or normalized == "frame_length":
        return jnp.sqrt(jnp.asarray(n_fft, jnp.float32))
    if normalized == "window":
        return jnp.sqrt(jnp.sum(jnp.square(window)))
    raise ValueError(f"unknown normalized mode: {normalized!r}")


def stft(x: jax.Array, n_fft: int, hop_length: int,
         win_length: tp.Optional[int] = None,
         window: tp.Optional[jax.Array] = None, center: bool = True,
         pad_mode: str = "reflect",
         normalized: tp.Union[bool, str] = False) -> jax.Array:
    """torch.stft-compatible. x [..., T] -> complex [..., n_fft//2+1, frames].

    normalized: False | True ("frame_length", torch.stft semantics) |
    "window" (torchaudio Spectrogram semantics)."""
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = jnp.pad(window, (pad, n_fft - win_length - pad))
    if center:
        pad = n_fft // 2
        pads = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, pads, mode=pad_mode)
    frames = frame(x, n_fft, hop_length)           # [..., F, n_fft]
    frames = frames * window
    if n_fft <= _MATMUL_DFT_MAX_NFFT:
        cos_m, sin_m = _dft_matrices(n_fft)
        re = frames @ jnp.asarray(cos_m)
        im = frames @ jnp.asarray(sin_m)
        spec = jax.lax.complex(re, im)             # [..., F, n_fft//2+1]
    else:
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    factor = _norm_factor(normalized, n_fft, window)
    if factor is not None:
        spec = spec / factor.astype(spec.real.dtype)
    return jnp.swapaxes(spec, -1, -2)              # [..., bins, F]


def istft(z: jax.Array, n_fft: int, hop_length: int,
          win_length: tp.Optional[int] = None,
          window: tp.Optional[jax.Array] = None, center: bool = True,
          normalized: bool = False,
          length: tp.Optional[int] = None) -> jax.Array:
    """torch.istft-compatible inverse. z complex [..., n_fft//2+1, frames]
    -> [..., T]. Windowed overlap-add with window-square normalization.

    Uses a matmul inverse-rDFT (same MXU rationale as `stft`); the
    overlap-add is a single scatter-add over a precomputed index map.
    """
    win_length = win_length or n_fft
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = jnp.pad(window, (pad, n_fft - win_length - pad))
    spec = jnp.swapaxes(z, -1, -2)                   # [..., frames, bins]
    factor = _norm_factor(normalized, n_fft, window)
    if factor is not None:
        spec = spec * factor
    if n_fft <= _MATMUL_DFT_MAX_NFFT:
        # inverse rDFT: x_n = (1/N) * sum_k w_k * (re_k cos + im_k sin),
        # with w_k = 1 for DC/nyquist and 2 for the mirrored interior bins
        bins = n_fft // 2 + 1
        cos_m, sin_m = _dft_matrices(n_fft)          # [n_fft, bins]
        w = np.full((bins,), 2.0, np.float32)
        w[0] = 1.0
        if n_fft % 2 == 0:
            w[-1] = 1.0
        re = jnp.real(spec) * w
        im = jnp.imag(spec) * w
        # _dft_matrices' sin is already negated (forward basis), so the
        # inverse (1/N)(re@cos^T - im@sin^T) becomes re@cos_m^T + im@sin_m^T
        frames = (re @ jnp.asarray(cos_m.T)
                  + im @ jnp.asarray(sin_m.T)) / n_fft
    else:  # same FFT fallback rationale as `stft`
        frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)
    frames = frames * window                         # [..., F, n_fft]
    F = frames.shape[-2]
    T_full = n_fft + (F - 1) * hop_length
    idx = (np.arange(F)[:, None] * hop_length
           + np.arange(n_fft)[None, :]).reshape(-1)
    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, F * n_fft))
    out = jnp.zeros((flat.shape[0], T_full), flat.dtype)
    out = out.at[:, idx].add(flat)
    wsq = jnp.zeros((T_full,), jnp.float32)
    wsq = wsq.at[idx].add(jnp.tile(window ** 2, F))
    out = out / jnp.maximum(wsq, 1e-11)
    out = out.reshape(batch_shape + (T_full,))
    if center:
        out = out[..., n_fft // 2:]
        if length is None:
            out = out[..., :T_full - n_fft]
    if length is not None:
        out = out[..., :length]
        if out.shape[-1] < length:
            pads = [(0, 0)] * (out.ndim - 1) + [(0, length - out.shape[-1])]
            out = jnp.pad(out, pads)
    return out


def spectrogram(x: jax.Array, n_fft: int, hop_length: int,
                win_length: tp.Optional[int] = None, power: float = 2.0,
                center: bool = True,
                normalized: tp.Union[bool, str] = False,
                pad_mode: str = "reflect") -> jax.Array:
    """torchaudio.transforms.Spectrogram-compatible: normalized=True means
    window-L2 normalization there (unlike torch.stft)."""
    if normalized is True:
        normalized = "window"
    s = stft(x, n_fft, hop_length, win_length, center=center,
             normalized=normalized, pad_mode=pad_mode)
    mag2 = jnp.real(s) ** 2 + jnp.imag(s) ** 2
    if power == 2.0:
        return mag2
    return mag2 ** (power / 2.0)


def _hz_to_mel(f, htk: bool = True):
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney
    f = np.asarray(f, dtype=np.float64)
    mel = f / (200.0 / 3)
    log_step = np.log(6.4) / 27.0
    above = f >= 1000.0
    mel = np.where(above, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / log_step, mel)
    return mel


def _mel_to_hz(m, htk: bool = True):
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    m = np.asarray(m, dtype=np.float64)
    f = m * (200.0 / 3)
    log_step = np.log(6.4) / 27.0
    above = m >= 15.0
    return np.where(above, 1000.0 * np.exp(log_step * (m - 15.0)), f)


@lru_cache(maxsize=32)
def mel_filters(sample_rate: int, n_fft: int, n_mels: int, f_min: float = 0.0,
                f_max: tp.Optional[float] = None, htk: bool = True,
                norm: tp.Optional[str] = None) -> np.ndarray:
    """Triangular mel filterbank [n_fft//2+1, n_mels], matching
    torchaudio.functional.melscale_fbanks (mel_scale='htk' default)."""
    f_max = f_max or sample_rate / 2
    all_freqs = np.linspace(0, sample_rate // 2, n_fft // 2 + 1)
    m_min, m_max = _hz_to_mel(f_min, htk), _hz_to_mel(f_max, htk)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts, htk)
    f_diff = np.diff(f_pts)                             # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]        # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2:n_mels + 2] - f_pts[:n_mels])
        fb *= enorm[None, :]
    return fb.astype(np.float32)


def mel_spectrogram(x: jax.Array, sample_rate: int, n_fft: int,
                    hop_length: int, win_length: tp.Optional[int] = None,
                    n_mels: int = 80, f_min: float = 0.0,
                    f_max: tp.Optional[float] = None, power: float = 2.0,
                    center: bool = True, normalized: bool = False
                    ) -> jax.Array:
    """[..., T] -> [..., n_mels, frames], torchaudio-compatible."""
    spec = spectrogram(x, n_fft, hop_length, win_length, power=power,
                       center=center, normalized=normalized)
    fb = jnp.asarray(mel_filters(sample_rate, n_fft, n_mels, f_min, f_max))
    return jnp.einsum("...bf,bm->...mf", spec, fb.astype(spec.dtype))
