"""1-D conv U-Net for waveform diffusion (Multi-Band Diffusion).

Parity: `audiocraft/models/unet.py:26-214` — encoder/decoder conv stacks with
GroupNorm resblocks, per-step embedding added after the first encoder (and
optionally all), BLSTM or transformer bottleneck, codec-embedding condition
injected at the bottleneck (sum or cross-attention).

Layout channels-last [B, T, C].
"""
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..modules.transformer import StreamingTransformer, create_sin_embedding
from ..modules.lstm import LSTMLayer


class ResBlock(nn.Module):
    """`unet.py:44-72`."""
    channels: int
    kernel: int = 3
    norm_groups: int = 4
    dilation: int = 1
    dropout: float = 0.0
    dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        pad = self.dilation * (self.kernel - 1) // 2

        def conv(h, name):
            return nn.Conv(self.channels, (self.kernel,),
                           kernel_dilation=(self.dilation,),
                           padding=((pad, pad),), dtype=self.dtype, name=name)(h)

        h = nn.GroupNorm(self.norm_groups, epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = conv(jax.nn.relu(h), "conv1")
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
        h = conv(jax.nn.relu(h), "conv2")
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + h


class EncoderLayer(nn.Module):
    """Strided conv + resblocks (`unet.py:96-121`)."""
    chout: int
    kernel: int = 4
    stride: int = 2
    norm_groups: int = 4
    res_blocks: int = 1
    dropout: float = 0.0
    dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        B, T, C = x.shape
        pad_t = (self.stride - (T % self.stride)) % self.stride
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
        padding = (self.kernel - self.stride) // 2
        x = nn.Conv(self.chout, (self.kernel,), strides=(self.stride,),
                    padding=((padding, padding),), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.GroupNorm(self.norm_groups, epsilon=1e-5, dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        for idx in range(self.res_blocks):
            x = ResBlock(self.chout, norm_groups=self.norm_groups,
                         dilation=2 ** idx, dropout=self.dropout,
                         dtype=self.dtype, name=f"res_{idx}")(x, deterministic)
        return x


class DecoderLayer(nn.Module):
    """Resblocks + transposed conv (`unet.py:74-94`)."""
    chout: int
    chin: int
    kernel: int = 4
    stride: int = 2
    norm_groups: int = 4
    res_blocks: int = 1
    dropout: float = 0.0
    dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        for idx in range(self.res_blocks):
            x = ResBlock(self.chin, norm_groups=self.norm_groups,
                         dilation=2 ** idx, dropout=self.dropout,
                         dtype=self.dtype, name=f"res_{idx}")(x, deterministic)
        x = nn.GroupNorm(self.norm_groups, epsilon=1e-5, dtype=self.dtype)(x)
        x = jax.nn.relu(x)
        padding = (self.kernel - self.stride) // 2
        x = nn.ConvTranspose(self.chout, (self.kernel,),
                             strides=(self.stride,), use_bias=False,
                             padding="VALID", dtype=self.dtype,
                             name="convtr")(x)
        # VALID transpose gives (T-1)*s + k; trim torch's implicit padding
        if padding > 0:
            x = x[:, padding:x.shape[1] - padding]
        return x


class BLSTM(nn.Module):
    """BiLSTM bottleneck (`unet.py:123-137`)."""
    dim: int
    layers: int = 2
    dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x
        for i in range(self.layers):
            fwd, _ = LSTMLayer(self.dim, dtype=self.dtype, name=f"fwd_{i}")(h)
            bwd, _ = LSTMLayer(self.dim, dtype=self.dtype, name=f"bwd_{i}")(
                h[:, ::-1])
            h = jnp.concatenate([fwd, bwd[:, ::-1]], axis=-1)
            if i < self.layers - 1:
                # torch stacked bidirectional LSTM feeds 2*dim to next layer
                pass
        return nn.Dense(self.dim, dtype=self.dtype, name="linear")(h)


class DiffusionUnet(nn.Module):
    """`unet.py:139-214`. Call: (x [B,T,Cin], step int/[B], condition
    [B, Tc, codec_dim]) -> noise estimate [B, T, Cin]."""
    chin: int = 3
    hidden: int = 24
    depth: int = 3
    growth: float = 2.0
    max_channels: int = 10_000
    num_steps: int = 1000
    emb_all_layers: bool = False
    cross_attention: bool = False
    bilstm: bool = False
    use_transformer: bool = False
    codec_dim: tp.Optional[int] = None
    kernel: int = 4
    stride: int = 2
    norm_groups: int = 4
    res_blocks: int = 1
    dropout: float = 0.0
    dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, step, condition: tp.Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        B, T, _ = x.shape
        if not hasattr(step, "shape") or getattr(step, "ndim", 0) == 0:
            step_tensor = jnp.full((B,), step, jnp.int32)
        else:
            step_tensor = step

        hidden = self.hidden
        chin = self.chin
        channels = []
        for d in range(self.depth):
            channels.append((chin, hidden))
            chin = hidden
            hidden = min(int(chin * self.growth), self.max_channels)

        skips = []
        z = x
        for idx, (cin, cout) in enumerate(channels):
            z = EncoderLayer(cout, self.kernel, self.stride, self.norm_groups,
                             self.res_blocks, self.dropout, self.dtype,
                             name=f"enc_{idx}")(z, deterministic)
            if idx == 0:
                emb = nn.Embed(self.num_steps, cout, dtype=self.dtype,
                               name="embedding")(step_tensor)
                z = z + emb[:, None, :]
            elif self.emb_all_layers:
                emb = nn.Embed(self.num_steps, cout, dtype=self.dtype,
                               name=f"embedding_{idx}")(step_tensor)
                z = z + emb[:, None, :]
            skips.append(z)

        bottleneck_dim = channels[-1][1]
        cross_attention_src = None
        if self.codec_dim is not None:
            assert condition is not None, "Model defined for conditional generation"
            # 1x1 codec-embedding conv (`unet.py:159-163` conv_codec)
            condition_emb = nn.Conv(bottleneck_dim, (1,), padding="VALID",
                                    dtype=self.dtype, name="conv_codec")(condition)
            if not self.cross_attention:
                # nearest interpolation to the bottleneck length
                Tz = z.shape[1]
                idxs = (jnp.arange(Tz) * condition_emb.shape[1] // Tz)
                z = z + jnp.take(condition_emb, idxs, axis=1)
                # the reference's `z += condition_emb` (unet.py:194) is an
                # in-place add that also mutates the tensor held in `skips`,
                # so the condition flows through the deepest skip even when
                # the bottleneck output is zeroed/rebound below
                skips[-1] = z
            else:
                Tc = condition_emb.shape[1]
                positions = jnp.arange(Tc).reshape(1, -1, 1)
                pos_emb = create_sin_embedding(positions, bottleneck_dim,
                                               max_period=10_000)
                cross_attention_src = condition_emb + pos_emb.astype(condition_emb.dtype)

        if self.use_transformer:
            z, _ = StreamingTransformer(
                d_model=bottleneck_dim, num_heads=8, num_layers=6,
                use_bias_ff=False, use_bias_attn=False,
                cross_attention=self.cross_attention, dtype=self.dtype,
                name="transformer")(z, cross_attention_src=cross_attention_src)
        else:
            if self.bilstm:
                z = BLSTM(bottleneck_dim, dtype=self.dtype, name="bilstm")(z)
            else:
                z = jnp.zeros_like(z)

        for idx in reversed(range(len(channels))):
            cin, cout = channels[idx]
            s = skips.pop(-1)
            z = z[:, :s.shape[1]]
            z = z + s
            z = DecoderLayer(cin, cout, self.kernel, self.stride,
                             self.norm_groups, self.res_blocks, self.dropout,
                             self.dtype, name=f"dec_{idx}")(z, deterministic)

        return z[:, :T]
