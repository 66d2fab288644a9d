"""Loudness losses for watermark inaudibility.

Parity: `audiocraft/losses/loudnessloss.py:18-204` — `basic_loudness`
(K-weighting biquads + gated blocks), T/F/TF loudness-ratio losses with the
softmax-weighted ratio.

Biquads are 2nd-order IIRs run as a `lax.scan` over time with the batch
vectorized — the only sequential op in the loss.
"""
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filters import SplitBands

_EPS = float(np.finfo(np.float32).eps)


def biquad(x: jax.Array, b0, b1, b2, a0, a1, a2) -> jax.Array:
    """Direct-form-I biquad over the last axis (torchaudio.functional.biquad)."""
    b0, b1, b2 = b0 / a0, b1 / a0, b2 / a0
    a1, a2 = a1 / a0, a2 / a0
    shape = x.shape
    flat = x.reshape(-1, shape[-1])

    def step(carry, xt):
        x1, x2, y1, y2 = carry
        yt = b0 * xt + b1 * x1 + b2 * x2 - a1 * y1 - a2 * y2
        return (xt, x1, yt, y1), yt

    zeros = jnp.zeros(flat.shape[0], flat.dtype)
    _, ys = jax.lax.scan(step, (zeros, zeros, zeros, zeros),
                         jnp.swapaxes(flat, 0, 1))
    return jnp.swapaxes(ys, 0, 1).reshape(shape)


def treble_biquad(x: jax.Array, sample_rate: int, gain: float,
                  central_freq: float = 3000.0, Q: float = 0.707) -> jax.Array:
    """torchaudio.functional.treble_biquad."""
    w0 = 2 * math.pi * central_freq / sample_rate
    alpha = math.sin(w0) / 2 / Q
    A = math.exp(gain / 40 * math.log(10))
    temp1 = 2 * math.sqrt(A) * alpha
    temp2 = (A - 1) * math.cos(w0)
    temp3 = (A + 1) * math.cos(w0)
    b0 = A * ((A + 1) + temp2 + temp1)
    b1 = -2 * A * ((A - 1) + temp3)
    b2 = A * ((A + 1) + temp2 - temp1)
    a0 = (A + 1) - temp2 + temp1
    a1 = 2 * ((A - 1) - temp3)
    a2 = (A + 1) - temp2 - temp1
    return biquad(x, b0, b1, b2, a0, a1, a2)


def highpass_biquad(x: jax.Array, sample_rate: int, cutoff_freq: float,
                    Q: float = 0.707) -> jax.Array:
    """torchaudio.functional.highpass_biquad."""
    w0 = 2 * math.pi * cutoff_freq / sample_rate
    alpha = math.sin(w0) / 2.0 / Q
    b0 = (1 + math.cos(w0)) / 2
    b1 = -1 - math.cos(w0)
    b2 = b0
    a0 = 1 + alpha
    a1 = -2 * math.cos(w0)
    a2 = 1 - alpha
    return biquad(x, b0, b1, b2, a0, a1, a2)


def basic_loudness(waveform: jax.Array, sample_rate: int) -> jax.Array:
    """Simplified BS.1770 loudness, per item (`loudnessloss.py:18-50`).
    waveform [..., C, T] -> loudness [...]."""
    if waveform.shape[-2] > 5:
        raise ValueError("Only up to 5 channels are supported.")
    gate_duration = 0.4
    overlap = 0.75
    gate_samples = int(round(gate_duration * sample_rate))
    step = int(round(gate_samples * (1 - overlap)))

    waveform = treble_biquad(waveform, sample_rate, 4.0, 1500.0,
                             1 / math.sqrt(2))
    waveform = highpass_biquad(waveform, sample_rate, 38.0, 0.5)

    T = waveform.shape[-1]
    n_blocks = max(1 + (T - gate_samples) // step, 1)
    idx = (np.arange(n_blocks)[:, None] * step
           + np.arange(min(gate_samples, T))[None, :])
    idx = np.minimum(idx, T - 1)
    energy = jnp.mean(jnp.square(waveform[..., idx]), axis=-1)  # [..., C, F]

    g = jnp.asarray([1.0, 1.0, 1.0, 1.41, 1.41])[:waveform.shape[-2]]
    energy_weighted = jnp.sum(g[..., :, None] * energy, axis=-2)  # [..., F]
    loudness = -0.691 + 10 * jnp.log10(energy_weighted + _EPS)
    return loudness


def _unfold(a: jax.Array, kernel_size: int, stride: int) -> jax.Array:
    """[*, T] -> [*, F, K] (`loudnessloss.py:53-66`)."""
    *shape, length = a.shape
    n_frames = math.ceil(length / stride)
    tgt_length = (n_frames - 1) * stride + kernel_size
    a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, tgt_length - length)])
    idx = (np.arange(n_frames)[:, None] * stride
           + np.arange(kernel_size)[None, :])
    return a[..., idx]


class FLoudnessRatio:
    """Frequency-band loudness ratio (`loudnessloss.py:69-111`)."""

    def __init__(self, sample_rate: int = 16000, segment: tp.Optional[float] = 20,
                 overlap: float = 0.5, epsilon: float = _EPS, n_bands: int = 0):
        self.sample_rate = sample_rate
        self.segment = segment
        self.overlap = overlap
        self.epsilon = epsilon
        self.filter = SplitBands(sample_rate=sample_rate, n_bands=n_bands) \
            if n_bands else None

    def __call__(self, out_sig: jax.Array, ref_sig: jax.Array) -> jax.Array:
        B, C, T = ref_sig.shape
        assert ref_sig.shape == out_sig.shape
        assert self.filter is not None
        bands_ref = self.filter(ref_sig)
        bands_out = self.filter(out_sig)
        l_noise = basic_loudness(bands_ref - bands_out, self.sample_rate)
        l_ref = basic_loudness(bands_ref, self.sample_rate)
        l_ratio = (l_noise - l_ref).reshape(-1, B)
        loss = jax.nn.softmax(l_ratio, axis=0) * l_ratio
        return jnp.sum(loss)


class TLoudnessRatio:
    """Time-segment loudness ratio (`loudnessloss.py:114-148`)."""

    def __init__(self, sample_rate: int = 16000, segment: float = 0.5,
                 overlap: float = 0.5):
        self.sample_rate = sample_rate
        self.segment = segment
        self.overlap = overlap

    def __call__(self, out_sig: jax.Array, ref_sig: jax.Array) -> jax.Array:
        B, C, T = ref_sig.shape
        assert ref_sig.shape == out_sig.shape
        assert C == 1
        frame = int(self.segment * self.sample_rate)
        stride = int(frame * (1 - self.overlap))
        gt = _unfold(ref_sig, frame, stride).reshape(-1, 1, frame)
        est = _unfold(out_sig, frame, stride).reshape(-1, 1, frame)
        l_noise = basic_loudness(gt - est, self.sample_rate)
        l_ref = basic_loudness(gt, self.sample_rate)
        l_ratio = (l_noise - l_ref).reshape(-1, B)
        loss = jax.nn.softmax(l_ratio, axis=0) * l_ratio
        return jnp.sum(loss)


class TFLoudnessRatio:
    """Time-frequency loudness ratio (`loudnessloss.py:151-204`)."""

    def __init__(self, sample_rate: int = 16000, segment: float = 0.5,
                 overlap: float = 0.5, n_bands: int = 0,
                 clip_min: float = -100, temperature: float = 1.0):
        self.sample_rate = sample_rate
        self.segment = segment
        self.overlap = overlap
        self.clip_min = clip_min
        self.temperature = temperature
        if n_bands == 0:
            self.filter = None
        else:
            self.n_bands = n_bands
            self.filter = SplitBands(sample_rate=sample_rate, n_bands=n_bands)

    def __call__(self, out_sig: jax.Array, ref_sig: jax.Array) -> jax.Array:
        B, C, T = ref_sig.shape
        assert ref_sig.shape == out_sig.shape
        assert C == 1
        assert self.filter is not None
        bands_ref = self.filter(ref_sig).reshape(B * self.n_bands, 1, -1)
        bands_out = self.filter(out_sig).reshape(B * self.n_bands, 1, -1)
        frame = int(self.segment * self.sample_rate)
        stride = int(frame * (1 - self.overlap))
        gt = _unfold(bands_ref, frame, stride)[:, 0].reshape(-1, 1, frame)
        est = _unfold(bands_out, frame, stride)[:, 0].reshape(-1, 1, frame)
        l_noise = basic_loudness(est - gt, sample_rate=self.sample_rate)
        l_ref = basic_loudness(gt, sample_rate=self.sample_rate)
        l_ratio = (l_noise - l_ref).reshape(-1, B)
        loss = jax.nn.softmax(l_ratio / self.temperature, axis=0) * l_ratio
        return jnp.mean(loss)
