"""Multi-Scale STFT discriminator (EnCodec's default adversary).

Parity: `audiocraft/adversarial/discriminators/msstftd.py:22-147`. Each
sub-discriminator computes a complex STFT (real/imag stacked as channels) and
runs a 2D conv stack; returns per-scale logits + feature maps. NHWC layout
with H=frames, W=freq bins (reference rearranges to 'b c t w').
"""
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...modules.conv import NormConv2d
from ...ops.stft import stft
from .base import MultiDiscriminator, MultiDiscriminatorOutputType


def get_2d_padding(kernel_size: tp.Tuple[int, int],
                   dilation: tp.Tuple[int, int] = (1, 1)):
    return (((kernel_size[0] - 1) * dilation[0]) // 2,
            ((kernel_size[1] - 1) * dilation[1]) // 2)


class DiscriminatorSTFT(nn.Module):
    """STFT sub-discriminator (`msstftd.py:22-112`)."""
    filters: int
    in_channels: int = 1
    out_channels: int = 1
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    max_filters: int = 1024
    filters_scale: int = 1
    kernel_size: tp.Tuple[int, int] = (3, 9)
    dilations: tp.Tuple[int, ...] = (1, 2, 4)
    stride: tp.Tuple[int, int] = (1, 2)
    normalized: bool = True
    norm: str = "weight_norm"
    negative_slope: float = 0.2
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> tp.Tuple[jax.Array, tp.List[jax.Array]]:
        """x: audio [B, C, T] -> (logits [B, Ht, Wf, out], fmaps)."""
        B, C, T = x.shape
        # reference uses torchaudio Spectrogram(normalized=True) -> the
        # "window" L2 normalization, not torch.stft's frame_length**-0.5
        s = stft(x.reshape(B * C, T), self.n_fft, self.hop_length,
                 self.win_length, center=False,
                 normalized="window" if self.normalized is True
                 else self.normalized)
        # [B*C, bins, frames] complex -> [B, frames, bins, 2C] (NHWC)
        s = s.reshape(B, C, s.shape[-2], s.shape[-1])
        z = jnp.concatenate([jnp.real(s), jnp.imag(s)], axis=1)  # [B, 2C, W, T]
        z = jnp.transpose(z, (0, 3, 2, 1))                        # [B, T, W, 2C]
        act = lambda v: jax.nn.leaky_relu(v, self.negative_slope)

        fmap = []
        kw = dict(norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype)
        z = NormConv2d(2 * self.in_channels, self.filters,
                       kernel_size=self.kernel_size,
                       padding=get_2d_padding(self.kernel_size),
                       **{**kw, "norm": "none"})(z)
        z = act(z)
        fmap.append(z)
        in_chs = min(self.filters_scale * self.filters, self.max_filters)
        for i, dilation in enumerate(self.dilations):
            out_chs = min((self.filters_scale ** (i + 1)) * self.filters,
                          self.max_filters)
            z = NormConv2d(in_chs, out_chs, kernel_size=self.kernel_size,
                           stride=self.stride, dilation=(dilation, 1),
                           padding=get_2d_padding(self.kernel_size, (dilation, 1)),
                           **kw)(z)
            z = act(z)
            fmap.append(z)
            in_chs = out_chs
        out_chs = min((self.filters_scale ** (len(self.dilations) + 1)) * self.filters,
                      self.max_filters)
        k2 = (self.kernel_size[0], self.kernel_size[0])
        z = NormConv2d(in_chs, out_chs, kernel_size=k2,
                       padding=get_2d_padding(k2), **kw)(z)
        z = act(z)
        fmap.append(z)
        z = NormConv2d(out_chs, self.out_channels, kernel_size=k2,
                       padding=get_2d_padding(k2), **kw)(z)
        return z, fmap


class MultiScaleSTFTDiscriminator(MultiDiscriminator):
    """MS-STFT discriminator (`msstftd.py:115-147`)."""
    filters: int = 32
    in_channels: int = 1
    out_channels: int = 1
    sep_channels: bool = False
    n_ffts: tp.Tuple[int, ...] = (1024, 2048, 512)
    hop_lengths: tp.Tuple[int, ...] = (256, 512, 128)
    win_lengths: tp.Tuple[int, ...] = (1024, 2048, 512)
    norm: str = "weight_norm"
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @property
    def num_discriminators(self) -> int:
        return len(self.n_ffts)

    @nn.compact
    def __call__(self, x: jax.Array) -> MultiDiscriminatorOutputType:
        assert len(self.n_ffts) == len(self.hop_lengths) == len(self.win_lengths)
        logits, fmaps = [], []
        for i in range(len(self.n_ffts)):
            logit, fmap = DiscriminatorSTFT(
                self.filters, in_channels=self.in_channels,
                out_channels=self.out_channels, n_fft=self.n_ffts[i],
                win_length=self.win_lengths[i], hop_length=self.hop_lengths[i],
                norm=self.norm, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"disc_{i}")(x)
            logits.append(logit)
            fmaps.append(fmap)
        return logits, fmaps
