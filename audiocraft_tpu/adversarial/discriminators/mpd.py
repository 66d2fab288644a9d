"""Multi-Period discriminator (MPD, from HiFi-GAN).

Parity: `audiocraft/adversarial/discriminators/mpd.py:16-103`.
"""
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...modules.conv import NormConv2d
from .base import MultiDiscriminator, MultiDiscriminatorOutputType


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return int((kernel_size * dilation - dilation) / 2)


class PeriodDiscriminator(nn.Module):
    """Period sub-discriminator (`mpd.py:16-72`)."""
    period: int
    in_channels: int = 1
    out_channels: int = 1
    n_layers: int = 5
    kernel_sizes: tp.Tuple[int, int] = (5, 3)
    stride: int = 3
    filters: int = 8
    filters_scale: int = 4
    max_filters: int = 1024
    norm: str = "weight_norm"
    negative_slope: float = 0.2
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> tp.Tuple[jax.Array, tp.List[jax.Array]]:
        """x [B, C, T] -> 2D period view [B, T//p, p, C] conv stack."""
        act = lambda v: jax.nn.leaky_relu(v, self.negative_slope)
        b, c, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        h = x.reshape(b, c, t // self.period, self.period)
        h = jnp.transpose(h, (0, 2, 3, 1))  # NHWC: [B, T//p, p, C]
        fmap = []
        in_chs = self.in_channels
        for i in range(self.n_layers):
            out_chs = min(self.filters * (self.filters_scale ** (i + 1)),
                          self.max_filters)
            eff_stride = 1 if i == self.n_layers - 1 else self.stride
            h = NormConv2d(in_chs, out_chs,
                           kernel_size=(self.kernel_sizes[0], 1),
                           stride=(eff_stride, 1),
                           padding=((self.kernel_sizes[0] - 1) // 2, 0),
                           norm=self.norm, dtype=self.dtype,
                           param_dtype=self.param_dtype, name=f"conv_{i}")(h)
            h = act(h)
            fmap.append(h)
            in_chs = out_chs
        logits = NormConv2d(in_chs, self.out_channels,
                            kernel_size=(self.kernel_sizes[1], 1),
                            stride=(1, 1),
                            padding=((self.kernel_sizes[1] - 1) // 2, 0),
                            norm=self.norm, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="conv_post")(h)
        fmap.append(logits)
        return logits, fmap


class MultiPeriodDiscriminator(MultiDiscriminator):
    """MPD (`mpd.py:75-103`)."""
    in_channels: int = 1
    out_channels: int = 1
    periods: tp.Tuple[int, ...] = (2, 3, 5, 7, 11)
    filters: int = 8
    norm: str = "weight_norm"
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @property
    def num_discriminators(self) -> int:
        return len(self.periods)

    @nn.compact
    def __call__(self, x: jax.Array) -> MultiDiscriminatorOutputType:
        logits, fmaps = [], []
        for p in self.periods:
            logit, fmap = PeriodDiscriminator(
                p, self.in_channels, self.out_channels, filters=self.filters,
                norm=self.norm, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"disc_p{p}")(x)
            logits.append(logit)
            fmaps.append(fmap)
        return logits, fmaps
