"""Windowed scale-invariant SNR loss (`audiocraft/losses/sisnr.py:39-97`).

Returns the *negative* SI-SNR so it can be minimized directly.
"""
import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

_EPS = float(np.finfo(np.float32).eps)


def _unfold(a: jax.Array, kernel_size: int, stride: int) -> jax.Array:
    """[*, T] -> [*, F, K] frames padded so F = ceil(T / stride)
    (`sisnr.py:15-28`)."""
    *shape, length = a.shape
    n_frames = math.ceil(length / stride)
    tgt_length = (n_frames - 1) * stride + kernel_size
    a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, tgt_length - length)])
    idx = (np.arange(n_frames)[:, None] * stride + np.arange(kernel_size)[None, :])
    return a[..., idx]


def _center(x: jax.Array) -> jax.Array:
    return x - jnp.mean(x, axis=-1, keepdims=True)


def _norm2(x: jax.Array) -> jax.Array:
    return jnp.sum(jnp.square(x), axis=-1, keepdims=True)


class SISNR:
    """SI-SNR over (overlapping) segments; input [B, C, T], output scalar
    = -SI-SNR (`sisnr.py:39-97`)."""

    def __init__(self, sample_rate: int = 16000,
                 segment: tp.Optional[float] = 20, overlap: float = 0.5,
                 epsilon: float = _EPS):
        self.sample_rate = sample_rate
        self.segment = segment
        self.overlap = overlap
        self.epsilon = epsilon

    def __call__(self, out_sig: jax.Array, ref_sig: jax.Array) -> jax.Array:
        B, C, T = ref_sig.shape
        assert ref_sig.shape == out_sig.shape
        if self.segment is None:
            frame = T
            stride = T
        else:
            frame = int(self.segment * self.sample_rate)
            stride = int(frame * (1 - self.overlap))
        epsilon = self.epsilon * frame
        gt = _center(_unfold(ref_sig, frame, stride))
        est = _center(_unfold(out_sig, frame, stride))
        dot = jnp.einsum("bcft,bcft->bcf", gt, est)
        proj = dot[..., None] * gt / (epsilon + _norm2(gt))
        noise = est - proj
        sisnr = 10 * (jnp.log10(epsilon + _norm2(proj))
                      - jnp.log10(epsilon + _norm2(noise)))
        return -1 * jnp.mean(sisnr[..., 0])
