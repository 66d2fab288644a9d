"""Multi-Scale waveform discriminator (MSD, from MelGAN).

Parity: `audiocraft/adversarial/discriminators/msd.py:20-126`. Layout:
audio [B, C, T] at the API, channels-last inside.
"""
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...modules.conv import NormConv1d, pad1d
from .base import MultiDiscriminator, MultiDiscriminatorOutputType


class ScaleDiscriminator(nn.Module):
    """Waveform sub-discriminator (`msd.py:20-93`)."""
    in_channels: int = 1
    out_channels: int = 1
    kernel_sizes: tp.Tuple[int, int] = (5, 3)
    filters: int = 16
    max_filters: int = 1024
    downsample_scales: tp.Tuple[int, ...] = (4, 4, 4, 4)
    norm: str = "weight_norm"
    negative_slope: float = 0.2
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> tp.Tuple[jax.Array, tp.List[jax.Array]]:
        """x [B, C, T] -> (logits, fmaps) channels-last features."""
        act = lambda v: jax.nn.leaky_relu(v, self.negative_slope)
        h = jnp.swapaxes(x, 1, 2)  # [B, T, C]
        fmap = []
        k0 = int(np.prod(self.kernel_sizes))
        h = pad1d(h, ((k0 - 1) // 2, (k0 - 1) // 2), mode="reflect")
        h = NormConv1d(self.in_channels, self.filters, kernel_size=k0,
                       stride=1, norm=self.norm, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv_in")(h)
        h = act(h)
        fmap.append(h)
        in_chs = self.filters
        for i, downsample_scale in enumerate(self.downsample_scales):
            out_chs = min(in_chs * downsample_scale, self.max_filters)
            kernel_size = downsample_scale * 10 + 1
            h = NormConv1d(in_chs, out_chs, kernel_size=kernel_size,
                           stride=downsample_scale, groups=in_chs // 4,
                           padding=(kernel_size - 1) // 2, norm=self.norm,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name=f"conv_{i}")(h)
            h = act(h)
            fmap.append(h)
            in_chs = out_chs
        out_chs = min(in_chs * 2, self.max_filters)
        h = NormConv1d(in_chs, out_chs, kernel_size=self.kernel_sizes[0],
                       stride=1, padding=(self.kernel_sizes[0] - 1) // 2,
                       norm=self.norm, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv_mid")(h)
        h = act(h)
        fmap.append(h)
        logits = NormConv1d(out_chs, self.out_channels,
                            kernel_size=self.kernel_sizes[1], stride=1,
                            padding=(self.kernel_sizes[1] - 1) // 2,
                            norm=self.norm, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="conv_post")(h)
        fmap.append(logits)
        return logits, fmap


def _avg_pool1d(x: jax.Array, kernel: int, stride: int, padding: int) -> jax.Array:
    """torch AvgPool1d on [B, C, T]."""
    xt = jnp.swapaxes(x, 1, 2)
    xt = jnp.pad(xt, ((0, 0), (padding, padding), (0, 0)))
    out = jax.lax.reduce_window(xt, 0.0, jax.lax.add, (1, kernel, 1),
                                (1, stride, 1), "VALID") / kernel
    return jnp.swapaxes(out, 1, 2)


class MultiScaleDiscriminator(MultiDiscriminator):
    """MSD (`msd.py:95-126`).

    Note: the reference discards the downsample result (`msd.py:122`,
    `self.downsample(x)` without assignment — an upstream bug); we implement
    the intended progressive downsampling."""
    in_channels: int = 1
    out_channels: int = 1
    downsample_factor: int = 2
    scale_norms: tp.Tuple[str, ...] = ("weight_norm",) * 3
    filters: int = 16
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @property
    def num_discriminators(self) -> int:
        return len(self.scale_norms)

    @nn.compact
    def __call__(self, x: jax.Array) -> MultiDiscriminatorOutputType:
        logits, fmaps = [], []
        for i, norm in enumerate(self.scale_norms):
            if i != 0:
                x = _avg_pool1d(x, self.downsample_factor * 2,
                                self.downsample_factor, self.downsample_factor)
            logit, fmap = ScaleDiscriminator(
                self.in_channels, self.out_channels, norm=norm,
                filters=self.filters, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"disc_{i}")(x)
            logits.append(logit)
            fmaps.append(fmap)
        return logits, fmaps
