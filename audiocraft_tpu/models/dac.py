"""Descript Audio Codec (DAC) — TPU-native implementation.

Parity: `audiocraft/models/encodec.py:262-321` wraps the external
`descript-audio-codec` package; that package is not installable here, so the
network itself (Snake-activated conv encoder/decoder + projected RVQ with
L2-normalized codebook lookup, github.com/descriptinc/descript-audio-codec)
is implemented first-party and its torch checkpoints convert through
`utils/torch_port.convert_dac_state`. Layout channels-last [B, T, C]; all
convs weight-normalized like the original.
"""
import math
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .encodec import CompressionModel


class Snake1d(nn.Module):
    """x + sin^2(alpha x)/alpha with a per-channel alpha (dac/nn/layers.py)."""
    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", nn.initializers.ones, (self.channels,))
        a = alpha[None, None, :]
        return x + (1.0 / (a + 1e-9)) * jnp.sin(a * x) ** 2


class WNConv(nn.Module):
    """Weight-normalized Conv1d, torch-compatible parametrization."""
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kshape = (self.kernel_size, self.in_channels, self.out_channels)
        fan_in = self.in_channels * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in)
        init = nn.initializers.uniform(scale=2 * bound)
        v = self.param("kernel_v",
                       lambda k, s, d: init(k, s, d) - bound, kshape,
                       jnp.float32)
        g = self.param("kernel_g",
                       lambda k, s, d: jnp.sqrt(jnp.sum(
                           jnp.square(v), axis=(0, 1))), (self.out_channels,),
                       jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
        kernel = v * (g[None, None, :] / jnp.maximum(norm, 1e-12))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,),
                       jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(self.stride,),
            padding=((self.padding, self.padding),),
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"))
        return y + b


class WNConvTranspose(nn.Module):
    """Weight-normalized ConvTranspose1d (torch semantics: flipped kernel,
    output (T-1)*stride - 2*padding + kernel)."""
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    padding: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kshape = (self.kernel_size, self.in_channels, self.out_channels)
        fan_in = self.in_channels * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in)
        init = nn.initializers.uniform(scale=2 * bound)
        v = self.param("kernel_v",
                       lambda k, s, d: init(k, s, d) - bound, kshape,
                       jnp.float32)
        # torch weight_norm on ConvTranspose1d defaults to dim=0 (= Cin)
        g = self.param("kernel_g",
                       lambda k, s, d: jnp.sqrt(jnp.sum(
                           jnp.square(v), axis=(0, 2))), (self.in_channels,),
                       jnp.float32)
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2), keepdims=True))
        kernel = v * (g[None, :, None] / jnp.maximum(norm, 1e-12))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,),
                       jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, kernel[::-1], window_strides=(1,),
            padding=((self.kernel_size - 1, self.kernel_size - 1),),
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"))
        if self.padding > 0:
            y = y[:, self.padding:y.shape[1] - self.padding]
        return y + b


class DACResidualUnit(nn.Module):
    """Snake -> conv7(dilated) -> Snake -> conv1, residual (dac/model/dac.py)."""
    dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = ((7 - 1) * self.dilation) // 2
        y = Snake1d(self.dim, name="snake1")(x)
        y = WNConv(self.dim, self.dim, 7, dilation=self.dilation,
                   padding=pad, name="conv1")(y)
        y = Snake1d(self.dim, name="snake2")(y)
        y = WNConv(self.dim, self.dim, 1, name="conv2")(y)
        return x + y


class DACEncoderBlock(nn.Module):
    dim: int
    stride: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = self.dim // 2
        for i, dil in enumerate((1, 3, 9)):
            x = DACResidualUnit(h, dil, name=f"res_{i}")(x)
        x = Snake1d(h, name="snake")(x)
        return WNConv(h, self.dim, 2 * self.stride, stride=self.stride,
                      padding=math.ceil(self.stride / 2), name="conv")(x)


class DACDecoderBlock(nn.Module):
    input_dim: int
    output_dim: int
    stride: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Snake1d(self.input_dim, name="snake")(x)
        x = WNConvTranspose(self.input_dim, self.output_dim,
                            2 * self.stride, self.stride,
                            padding=math.ceil(self.stride / 2),
                            name="convtr")(x)
        for i, dil in enumerate((1, 3, 9)):
            x = DACResidualUnit(self.output_dim, dil, name=f"res_{i}")(x)
        return x


class DACEncoder(nn.Module):
    d_model: int = 64
    strides: tp.Tuple[int, ...] = (2, 4, 8, 8)
    d_latent: int = 1024

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = self.d_model
        x = WNConv(1, d, 7, padding=3, name="conv_in")(x)
        for i, stride in enumerate(self.strides):
            d *= 2
            x = DACEncoderBlock(d, stride, name=f"block_{i}")(x)
        x = Snake1d(d, name="snake")(x)
        return WNConv(d, self.d_latent, 3, padding=1, name="conv_out")(x)


class DACDecoder(nn.Module):
    input_channel: int = 1024
    channels: int = 1536
    rates: tp.Tuple[int, ...] = (8, 8, 4, 2)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = WNConv(self.input_channel, self.channels, 7, padding=3,
                   name="conv_in")(x)
        d = self.channels
        for i, stride in enumerate(self.rates):
            x = DACDecoderBlock(d, d // 2, stride, name=f"block_{i}")(x)
            d //= 2
        x = Snake1d(d, name="snake")(x)
        x = WNConv(d, 1, 7, padding=3, name="conv_out")(x)
        return jnp.tanh(x)


class DACQuantizer(nn.Module):
    """Projected RVQ with L2-normalized-cosine codebook lookup
    (dac/nn/quantize.py)."""
    input_dim: int = 1024
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8

    def setup(self):
        # flax auto-names list submodules in_projs_<i> / out_projs_<i>
        self.in_projs = [WNConv(self.input_dim, self.codebook_dim, 1)
                         for _ in range(self.n_codebooks)]
        self.out_projs = [WNConv(self.codebook_dim, self.input_dim, 1)
                          for _ in range(self.n_codebooks)]
        self.codebooks = self.param(
            "codebooks", nn.initializers.normal(1.0),
            (self.n_codebooks, self.codebook_size, self.codebook_dim))

    def _lookup(self, z_e: jax.Array, codebook: jax.Array) -> jax.Array:
        """argmin of L2 distance between normalized latents and codes."""
        e = z_e / jnp.maximum(
            jnp.linalg.norm(z_e, axis=-1, keepdims=True), 1e-12)
        c = codebook / jnp.maximum(
            jnp.linalg.norm(codebook, axis=-1, keepdims=True), 1e-12)
        # normalized: argmin dist == argmax cosine
        return jnp.argmax(e @ c.T, axis=-1)

    def encode(self, z: jax.Array, n_quantizers: tp.Optional[int] = None
               ) -> jax.Array:
        """z [B, T, D] -> codes [B, K, T]."""
        n_q = n_quantizers or self.n_codebooks
        residual = z
        codes = []
        for i in range(n_q):
            z_e = self.in_projs[i](residual)  # [B, T, d]
            idx = self._lookup(z_e, self.codebooks[i])
            z_q = jnp.take(self.codebooks[i], idx, axis=0)
            z_q = self.out_projs[i](z_q)
            residual = residual - z_q
            codes.append(idx)
        return jnp.stack(codes, axis=1).astype(jnp.int32)

    def from_codes(self, codes: jax.Array) -> jax.Array:
        """codes [B, K, T] -> latent [B, T, D]."""
        z_q = 0.0
        for i in range(codes.shape[1]):
            z = jnp.take(self.codebooks[i], codes[:, i], axis=0)
            z_q = z_q + self.out_projs[i](z)
        return z_q


class DACModel(nn.Module):
    """Full DAC autoencoder with the dac-package default 44.1 kHz geometry."""
    encoder_dim: int = 64
    encoder_rates: tp.Tuple[int, ...] = (2, 4, 8, 8)
    decoder_dim: int = 1536
    decoder_rates: tp.Tuple[int, ...] = (8, 8, 4, 2)
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    sample_rate: int = 44100

    def setup(self):
        latent = self.encoder_dim * (2 ** len(self.encoder_rates))
        self.encoder = DACEncoder(self.encoder_dim, self.encoder_rates,
                                  latent)
        self.decoder = DACDecoder(latent, self.decoder_dim,
                                  self.decoder_rates)
        self.quantizer = DACQuantizer(latent, self.n_codebooks,
                                      self.codebook_size, self.codebook_dim)

    @property
    def hop_length(self) -> int:
        hop = 1
        for r in self.encoder_rates:
            hop *= r
        return hop

    def encode(self, x: jax.Array,
               n_quantizers: tp.Optional[int] = None) -> jax.Array:
        """x [B, T, 1] -> codes [B, K, Tf] (right-pads to a hop multiple,
        like dac's preprocess)."""
        T = x.shape[1]
        pad = (self.hop_length - T % self.hop_length) % self.hop_length
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        z = self.encoder(x)
        return self.quantizer.encode(z, n_quantizers)

    def decode(self, codes: jax.Array) -> jax.Array:
        return self.decoder(self.quantizer.from_codes(codes))


class DAC(CompressionModel):
    """CompressionModel adapter (`ref models/encodec.py:262-321`)."""

    def __init__(self, model: DACModel, n_quantizers: tp.Optional[int] = None):
        self.model = model
        self._n_quantizers = n_quantizers or model.n_codebooks

    def forward(self, variables, x: jax.Array):
        """Round trip (training is handled by the dac package upstream;
        this wrapper is inference-only like the reference's)."""
        codes, _ = self.encode(variables, x)
        return self.decode(variables, codes)

    @property
    def sample_rate(self) -> int:
        return self.model.sample_rate

    @property
    def frame_rate(self) -> int:
        return self.model.sample_rate // self.model.hop_length

    @property
    def channels(self) -> int:
        return 1

    @property
    def cardinality(self) -> int:
        return self.model.codebook_size

    @property
    def num_codebooks(self) -> int:
        return self._n_quantizers

    @property
    def total_codebooks(self) -> int:
        return self.model.n_codebooks

    def set_num_codebooks(self, n: int):
        assert 1 <= n <= self.model.n_codebooks
        self._n_quantizers = n

    def encode(self, variables, x: jax.Array):
        """x [B, 1, T] -> (codes [B, K, Tf], None)."""
        codes = self.model.apply(variables, jnp.swapaxes(x, 1, 2),
                                 self._n_quantizers, method=DACModel.encode)
        return codes, None

    def decode(self, variables, codes: jax.Array, scale=None):
        assert scale is None
        wav = self.model.apply(variables, codes, method=DACModel.decode)
        return jnp.swapaxes(wav, 1, 2)

    def decode_latent(self, variables, codes: jax.Array):
        return self.model.apply(variables, codes,
                                method=lambda m, c: m.quantizer.from_codes(c))

    @staticmethod
    def get_pretrained(path: str, n_quantizers: tp.Optional[int] = None
                       ) -> tp.Tuple["DAC", tp.Any]:
        """Load a local descript-audio-codec torch checkpoint (weights.pth
        with 'state_dict' + 'metadata', or a raw state dict)."""
        from ..utils import torch_port
        return torch_port.load_dac_from_path(path, n_quantizers)
