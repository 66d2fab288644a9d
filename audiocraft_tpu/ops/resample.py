"""Polyphase windowed-sinc resampling (julius-equivalent, pure JAX).

Replaces the `julius.resample_frac` dependency used throughout the reference
data plane (`audiocraft/data/audio_utils.py:54-100`) and MBD band splitting.
Standard algorithm: low-pass windowed-sinc interpolation evaluated on the
output grid, expressed as one strided conv with a per-phase kernel bank so
XLA maps it onto the MXU.
"""
import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _resample_kernel(p: int, q: int, zeros: int = 24, rolloff: float = 0.945
                     ) -> np.ndarray:
    """Kernel bank [p, W] for upsample-by-p / downsample-by-q.

    Output sample m = n*p + phase sits at input time n*q + phase*q/p; the
    kernel for `phase` is the low-pass sinc h evaluated on the integer tap
    grid shifted by phase*q/p:  kernel[phase, j] = h(j - half - phase*q/p).
    """
    cutoff = rolloff * min(1.0, p / q)          # relative to input Nyquist
    half = int(math.ceil(zeros / cutoff))       # half support in input samples
    width = 2 * half + 1 + (q - 1)              # extra taps for phase shifts < q
    j = np.arange(width, dtype=np.float64)
    kernels = []
    for phase in range(p):
        t = j - half - (phase * q) / p          # signed offset in input samples
        x = cutoff * t
        sinc = cutoff * np.sinc(x)
        warg = t / half
        window = np.where(np.abs(warg) <= 1.0,
                          0.5 * (1.0 + np.cos(np.pi * warg)), 0.0)
        kernels.append(sinc * window)
    return np.stack(kernels).astype(np.float32)


def resample_frac(x: jax.Array, old_sr: int, new_sr: int, zeros: int = 24,
                  rolloff: float = 0.945) -> jax.Array:
    """Resample the last axis of x from old_sr to new_sr.

    x: [..., T]. Returns [..., ceil(T * new_sr / old_sr)].
    """
    if old_sr == new_sr:
        return x
    g = math.gcd(int(old_sr), int(new_sr))
    p, q = new_sr // g, old_sr // g
    kernels = _resample_kernel(p, q, zeros, rolloff)  # [p, W]
    W = kernels.shape[1]
    half = (W - (q - 1) - 1) // 2

    shape = x.shape
    T = shape[-1]
    flat = x.astype(jnp.float32).reshape(-1, T, 1)  # [N, T, 1]
    # frames anchored at n*q, taps [n*q - half, n*q - half + W)
    n_frames = (T + q - 1) // q  # enough frames to cover ceil(T*p/q) outputs
    pad_right = (n_frames - 1) * q + W - half - T
    flat = jnp.pad(flat, ((0, 0), (half, max(pad_right, 0)), (0, 0)))
    k = jnp.asarray(kernels.T[:, None, :])  # HIO: [W, 1, p]
    y = jax.lax.conv_general_dilated(
        flat, k, window_strides=(q,), padding=((0, 0),),
        dimension_numbers=("NHC", "HIO", "NHC"))  # [N, n_frames, p]
    y = y.reshape(flat.shape[0], -1)  # frame-major, phase-minor == output order
    new_len = int(math.ceil(T * new_sr / old_sr))
    y = y[:, :new_len]
    return y.reshape(*shape[:-1], new_len).astype(x.dtype)
