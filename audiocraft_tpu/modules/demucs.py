"""HTDemucs (Hybrid Transformer Demucs) source separation in JAX/flax.

The reference's melody conditioner isolates melodic stems with the
`demucs` package's pretrained ``htdemucs`` model before chroma extraction
(`audiocraft/modules/conditioners.py:596-607,666-674`). This module is a
native reimplementation of that network (demucs v4:
`demucs/htdemucs.py` HTDemucs, `demucs/hdemucs.py` HEncLayer/HDecLayer/
ScaledEmbedding, `demucs/demucs.py` DConv, `demucs/transformer.py`
CrossTransformerEncoder) so stem separation runs as one XLA program on
TPU: the STFT/iSTFT are matmul-DFTs on the MXU, both conv branches are
channels-last convs, and segmented overlap-add inference is batched.

Weights load from a torch ``htdemucs`` checkpoint via
`utils.torch_port.convert_htdemucs`; without a checkpoint the melody
conditioner falls back to full-mix chroma (documented divergence).

Layouts: freq branch [B, F, T, C]; time branch [B, T, C].
"""
import math
import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.stft import hann_window, istft, stft

# torch.nn.GELU uses the exact erf form; flax defaults to tanh-approx
_gelu = partial(nn.gelu, approximate=False)


def _glu(x: jax.Array) -> jax.Array:
    """GLU over the channel (last) axis, matching torch F.glu(dim=1) on
    channel-first tensors."""
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


# --------------------------------------------------------------- sin embeds

def create_sin_embedding(length: int, dim: int, shift: float = 0.0,
                         max_period: float = 10000.0) -> np.ndarray:
    """1D sinusoid table [length, dim] (`demucs/transformer.py`
    create_sin_embedding: cos half then sin half)."""
    assert dim % 2 == 0
    pos = shift + np.arange(length, dtype=np.float64)[:, None]
    half = dim // 2
    adim = np.arange(half, dtype=np.float64)[None, :]
    phase = pos / (max_period ** (adim / (half - 1)))
    return np.concatenate([np.cos(phase), np.sin(phase)],
                          axis=-1).astype(np.float32)


def create_2d_sin_embedding(d_model: int, height: int, width: int,
                            max_period: float = 10000.0) -> np.ndarray:
    """2D sinusoid table [d_model, height, width]
    (`demucs/transformer.py` create_2d_sin_embedding): first half of the
    channels encodes width (time), second half height (frequency)."""
    assert d_model % 4 == 0, "d_model must be divisible by 4"
    pe = np.zeros((d_model, height, width), np.float32)
    half = d_model // 2
    div_term = np.exp(np.arange(0.0, half, 2) * -(math.log(max_period) / half))
    pos_w = np.arange(width, dtype=np.float64)[:, None]
    pos_h = np.arange(height, dtype=np.float64)[:, None]
    sw = np.sin(pos_w * div_term).T[:, None, :]       # [half/2, 1, W]
    cw = np.cos(pos_w * div_term).T[:, None, :]
    sh = np.sin(pos_h * div_term).T[:, :, None]       # [half/2, H, 1]
    ch = np.cos(pos_h * div_term).T[:, :, None]
    pe[0:half:2] = np.broadcast_to(sw, (half // 2, height, width))
    pe[1:half:2] = np.broadcast_to(cw, (half // 2, height, width))
    pe[half::2] = np.broadcast_to(sh, (half // 2, height, width))
    pe[half + 1::2] = np.broadcast_to(ch, (half // 2, height, width))
    return pe


# ------------------------------------------------------------------ layers

class ScaledEmbedding(nn.Module):
    """Embedding whose forward multiplies by `scale` so the effective
    learning rate is boosted (`demucs/hdemucs.py` ScaledEmbedding)."""
    num_embeddings: int
    features: int
    scale: float = 10.0

    @nn.compact
    def __call__(self, idx: jax.Array) -> jax.Array:
        emb = nn.Embed(self.num_embeddings, self.features,
                       embedding_init=nn.initializers.normal(1.0 / self.scale),
                       name="embedding")(idx)
        return emb * self.scale


class LayerScale(nn.Module):
    """Per-channel residual-branch scaling (`demucs/transformer.py`
    LayerScale; also used inside DConv)."""
    channels: int
    init: float = 1e-4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.constant(self.init),
                           (self.channels,))
        return x * scale


class DConv(nn.Module):
    """Dilated residual branch (`demucs/demucs.py` DConv, attn/lstm off as
    in htdemucs). Input [B, T, C]; each block is
    conv(k3, dil 2^j) -> GroupNorm(1) -> GELU -> conv1x1 to 2C ->
    GroupNorm(1) -> GLU -> LayerScale, added residually."""
    channels: int
    compress: int = 8
    depth: int = 2
    init: float = 1e-3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = self.channels // self.compress
        for d in range(self.depth):
            dilation = 2 ** d
            y = nn.Conv(hidden, (3,), kernel_dilation=(dilation,),
                        padding=((dilation, dilation),),
                        name=f"layers_{d}_conv1")(x)
            y = nn.GroupNorm(num_groups=1, epsilon=1e-5,
                             name=f"layers_{d}_norm1")(y)
            y = _gelu(y)
            y = nn.Conv(2 * self.channels, (1,), name=f"layers_{d}_conv2")(y)
            y = nn.GroupNorm(num_groups=1, epsilon=1e-5,
                             name=f"layers_{d}_norm2")(y)
            y = _glu(y)
            y = LayerScale(self.channels, self.init,
                           name=f"layers_{d}_scale")(y)
            x = x + y
        return x


class HEncLayer(nn.Module):
    """Hybrid encoder layer (`demucs/hdemucs.py` HEncLayer). `freq=True`
    convolves along the frequency axis of [B, F, T, C]; otherwise along
    time of [B, T, C]. conv -> GELU -> DConv (time axis, freq folded into
    batch) -> 1x1 rewrite -> GLU. Norms are Identity for depth<norm_starts
    (htdemucs depth 4)."""
    chout: int
    freq: bool = True
    kernel_size: int = 8
    stride: int = 4
    dconv_compress: int = 8
    dconv_depth: int = 2
    dconv_init: float = 1e-3

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.kernel_size // 4
        if self.freq:
            x = nn.Conv(self.chout, (self.kernel_size, 1),
                        strides=(self.stride, 1),
                        padding=((pad, pad), (0, 0)), name="conv")(x)
        else:
            le = x.shape[1]
            if le % self.stride != 0:
                x = jnp.pad(x, ((0, 0), (0, self.stride - le % self.stride),
                                (0, 0)))
            x = nn.Conv(self.chout, (self.kernel_size,),
                        strides=(self.stride,), padding=((pad, pad),),
                        name="conv")(x)
        x = _gelu(x)
        dconv = DConv(self.chout, self.dconv_compress, self.dconv_depth,
                      self.dconv_init, name="dconv")
        if self.freq:
            B, F, T, C = x.shape
            y = dconv(x.reshape(B * F, T, C))
            x = y.reshape(B, F, T, C)
        else:
            x = dconv(x)
        k = (1, 1) if self.freq else (1,)
        x = nn.Conv(2 * self.chout, k, name="rewrite")(x)
        return _glu(x)


class HDecLayer(nn.Module):
    """Hybrid decoder layer (`demucs/hdemucs.py` HDecLayer): add skip,
    3-wide rewrite + GLU, transposed conv (crop `pad` on both frequency
    ends / to `length` in time), GELU unless last."""
    chout: int
    freq: bool = True
    kernel_size: int = 8
    stride: int = 4
    last: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array,
                 length: int) -> jax.Array:
        x = x + skip
        chin = x.shape[-1]
        if self.freq:
            y = nn.Conv(2 * chin, (3, 1), padding=((1, 1), (0, 0)),
                        name="rewrite")(x)
        else:
            y = nn.Conv(2 * chin, (3,), padding=((1, 1),),
                        name="rewrite")(x)
        y = _glu(y)
        pad = (self.kernel_size - self.stride) // 2
        if self.freq:
            z = nn.ConvTranspose(self.chout, (self.kernel_size, 1),
                                 strides=(self.stride, 1), padding="VALID",
                                 name="conv_tr")(y)
            z = z[:, pad:z.shape[1] - pad]
        else:
            z = nn.ConvTranspose(self.chout, (self.kernel_size,),
                                 strides=(self.stride,), padding="VALID",
                                 name="conv_tr")(y)
            z = z[:, pad:pad + length]
        if not self.last:
            z = _gelu(z)
        return z


class _MHA(nn.Module):
    """torch nn.MultiheadAttention equivalent (packed qkv in_proj)."""
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q: jax.Array, kv: jax.Array) -> jax.Array:
        B, Tq, C = q.shape
        Tk = kv.shape[1]
        in_w = self.param("in_proj_weight",
                          nn.initializers.xavier_uniform(), (C, 3 * C))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * C,))
        qh = q @ in_w[:, :C] + in_b[:C]
        kh = kv @ in_w[:, C:2 * C] + in_b[C:2 * C]
        vh = kv @ in_w[:, 2 * C:] + in_b[2 * C:]
        H = self.num_heads
        hd = C // H
        qh = qh.reshape(B, Tq, H, hd)
        kh = kh.reshape(B, Tk, H, hd)
        vh = vh.reshape(B, Tk, H, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(hd)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, vh).reshape(B, Tq, C)
        return nn.Dense(C, name="out_proj")(out)


class _TransformerLayer(nn.Module):
    """Self- or cross-attention layer (`demucs/transformer.py`
    MyTransformerEncoderLayer / CrossTransformerEncoderLayer with
    norm_first, GELU FF, LayerScale, per-layer output LayerNorm)."""
    dim: int
    num_heads: int
    hidden_scale: float = 4.0
    cross: bool = False
    layer_scale_init: float = 1e-4

    @nn.compact
    def __call__(self, x: jax.Array,
                 kv: tp.Optional[jax.Array] = None) -> jax.Array:
        attn = _MHA(self.dim, self.num_heads, name="attn")
        if self.cross:
            q = nn.LayerNorm(name="norm1")(x)
            k = nn.LayerNorm(name="norm2")(kv)
            x = x + LayerScale(self.dim, self.layer_scale_init,
                               name="gamma_1")(attn(q, k))
            h = nn.LayerNorm(name="norm3")(x)
        else:
            q = nn.LayerNorm(name="norm1")(x)
            x = x + LayerScale(self.dim, self.layer_scale_init,
                               name="gamma_1")(attn(q, q))
            h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(int(self.dim * self.hidden_scale), name="linear1")(h)
        h = nn.Dense(self.dim, name="linear2")(_gelu(h))
        x = x + LayerScale(self.dim, self.layer_scale_init,
                           name="gamma_2")(h)
        return nn.LayerNorm(name="norm_out")(x)


class CrossTransformer(nn.Module):
    """Cross-domain transformer (`demucs/transformer.py`
    CrossTransformerEncoder): freq branch flattened time-major with a 2D
    sin embedding, time branch with a 1D embedding; even layers self-attend
    within each domain, odd layers cross-attend between them."""
    dim: int
    depth: int = 5
    num_heads: int = 8
    hidden_scale: float = 4.0
    max_period: float = 10000.0
    weight_pos_embed: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array,
                 xt: jax.Array) -> tp.Tuple[jax.Array, jax.Array]:
        B, Fq, T1, C = x.shape
        T2 = xt.shape[1]
        pe2d = create_2d_sin_embedding(C, Fq, T1, self.max_period)
        # "b c fr t1 -> b (t1 fr) c": time-major flattening
        pe2d = jnp.asarray(pe2d.transpose(2, 1, 0).reshape(T1 * Fq, C))
        x = x.transpose(0, 2, 1, 3).reshape(B, T1 * Fq, C)
        x = nn.LayerNorm(name="norm_in")(x)
        x = x + self.weight_pos_embed * pe2d[None]
        pe1d = jnp.asarray(create_sin_embedding(T2, C,
                                                max_period=self.max_period))
        xt = nn.LayerNorm(name="norm_in_t")(xt)
        xt = xt + self.weight_pos_embed * pe1d[None]
        for i in range(self.depth):
            if i % 2 == 0:
                x = _TransformerLayer(C, self.num_heads, self.hidden_scale,
                                      name=f"layers_{i}")(x)
                xt = _TransformerLayer(C, self.num_heads, self.hidden_scale,
                                       name=f"layers_t_{i}")(xt)
            else:
                old_x = x
                x = _TransformerLayer(C, self.num_heads, self.hidden_scale,
                                      cross=True, name=f"layers_{i}")(x, xt)
                xt = _TransformerLayer(C, self.num_heads, self.hidden_scale,
                                       cross=True,
                                       name=f"layers_t_{i}")(xt, old_x)
        x = x.reshape(B, T1, Fq, C).transpose(0, 2, 1, 3)
        return x, xt


# ------------------------------------------------------------------- model

class HTDemucs(nn.Module):
    """Hybrid Transformer Demucs (`demucs/htdemucs.py` HTDemucs), cac mode.

    Input mix [B, C_audio, T] -> stems [B, n_sources, C_audio, T].
    """
    sources: tp.Tuple[str, ...] = ("drums", "bass", "other", "vocals")
    audio_channels: int = 2
    channels: int = 48
    growth: int = 2
    depth: int = 4
    nfft: int = 4096
    kernel_size: int = 8
    stride: int = 4
    freq_emb_weight: float = 0.2
    emb_scale: float = 10.0
    dconv_compress: int = 8
    dconv_depth: int = 2
    dconv_init: float = 1e-3
    bottom_channels: int = 512
    t_depth: int = 5
    t_heads: int = 8
    t_hidden_scale: float = 4.0
    samplerate: int = 44100
    segment: float = 7.8

    @property
    def hop_length(self) -> int:
        return self.nfft // 4

    # --- spectral helpers (`demucs/hdemucs.py` _spec/_ispec/_magnitude) ---

    def _spec(self, x: jax.Array) -> jax.Array:
        """[B, C, T] -> complex [B, C, nfft//2, frames]."""
        hl = self.hop_length
        T = x.shape[-1]
        le = int(math.ceil(T / hl))
        pad = hl // 2 * 3
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1)
                    + [(pad, pad + le * hl - T)], mode="reflect")
        z = stft(x, self.nfft, hl, window=hann_window(self.nfft),
                 normalized=True, center=True, pad_mode="reflect")
        z = z[..., :-1, :]          # drop the nyquist bin
        return z[..., 2:2 + le]     # drop the 2 pre-roll frames

    def _ispec(self, z: jax.Array, length: int) -> jax.Array:
        """complex [B, S, C, nfft//2, frames] -> [B, S, C, length]."""
        hl = self.hop_length
        z = jnp.pad(z, [(0, 0)] * (z.ndim - 2) + [(0, 1), (2, 2)])
        pad = hl // 2 * 3
        le = hl * int(math.ceil(length / hl)) + 2 * pad
        x = istft(z, self.nfft, hl, window=hann_window(self.nfft),
                  normalized=True, center=True, length=le)
        return x[..., pad:pad + length]

    def _magnitude(self, z: jax.Array) -> jax.Array:
        """cac: complex [B, C, F, T] -> [B, C*2, F, T], channel layout
        [c0_re, c0_im, c1_re, c1_im]."""
        B, C, Fq, T = z.shape
        m = jnp.stack([jnp.real(z), jnp.imag(z)], axis=2)
        return m.reshape(B, C * 2, Fq, T)

    def _mask(self, m: jax.Array) -> jax.Array:
        """cac inverse: [B, S, C*2, F, T] -> complex [B, S, C, F, T]."""
        B, S, C2, Fq, T = m.shape
        out = m.reshape(B, S, C2 // 2, 2, Fq, T)
        return jax.lax.complex(out[:, :, :, 0], out[:, :, :, 1])

    @nn.compact
    def __call__(self, mix: jax.Array) -> jax.Array:
        S = len(self.sources)
        B, C_audio, length = mix.shape
        training_length = int(self.segment * self.samplerate)
        length_pre_pad = None
        if length < training_length:
            length_pre_pad = length
            mix = jnp.pad(mix, ((0, 0), (0, 0),
                                (0, training_length - length)))
            length = training_length

        z = self._spec(mix)
        mag = self._magnitude(z)                       # [B, C*2, F, T]
        # per-sample standardization (torch std is unbiased)
        def _std(v, axes):
            n = np.prod([v.shape[a] for a in axes])
            mu = v.mean(axes, keepdims=True)
            var = ((v - mu) ** 2).sum(axes, keepdims=True) / max(n - 1, 1)
            return mu, jnp.sqrt(var)
        mean, std = _std(mag, (1, 2, 3))
        xf = (mag - mean) / (1e-5 + std)
        meant, stdt = _std(mix, (1, 2))
        xt = (mix - meant) / (1e-5 + stdt)

        # to channels-last layouts
        x = xf.transpose(0, 2, 3, 1)                   # [B, F, T, C]
        xt = xt.transpose(0, 2, 1)                     # [B, T, C]

        saved, saved_t, lengths_t = [], [], []
        ch = self.channels
        for idx in range(self.depth):
            chout = ch * self.growth ** idx
            lengths_t.append(xt.shape[1])
            xt = HEncLayer(chout, freq=False, kernel_size=self.kernel_size,
                           stride=self.stride,
                           dconv_compress=self.dconv_compress,
                           dconv_depth=self.dconv_depth,
                           dconv_init=self.dconv_init,
                           name=f"tencoder_{idx}")(xt)
            saved_t.append(xt)
            x = HEncLayer(chout, freq=True, kernel_size=self.kernel_size,
                          stride=self.stride,
                          dconv_compress=self.dconv_compress,
                          dconv_depth=self.dconv_depth,
                          dconv_init=self.dconv_init,
                          name=f"encoder_{idx}")(x)
            if idx == 0:
                frs = jnp.arange(x.shape[1])
                emb = ScaledEmbedding(self.nfft // 2 // self.stride, chout,
                                      scale=self.emb_scale,
                                      name="freq_emb")(frs)
                x = x + self.freq_emb_weight * emb[None, :, None, :]
            saved.append(x)

        if self.bottom_channels:
            x = nn.Conv(self.bottom_channels, (1, 1),
                        name="channel_upsampler")(x)
            xt = nn.Conv(self.bottom_channels, (1,),
                         name="channel_upsampler_t")(xt)
        x, xt = CrossTransformer(
            self.bottom_channels or ch * self.growth ** (self.depth - 1),
            depth=self.t_depth, num_heads=self.t_heads,
            hidden_scale=self.t_hidden_scale,
            name="crosstransformer")(x, xt)
        if self.bottom_channels:
            x = nn.Conv(ch * self.growth ** (self.depth - 1), (1, 1),
                        name="channel_downsampler")(x)
            xt = nn.Conv(ch * self.growth ** (self.depth - 1), (1,),
                         name="channel_downsampler_t")(xt)

        for idx in range(self.depth):
            level = self.depth - 1 - idx
            last = level == 0
            chout_f = (S * C_audio * 2 if last
                       else ch * self.growth ** (level - 1))
            chout_t = (S * C_audio if last
                       else ch * self.growth ** (level - 1))
            x = HDecLayer(chout_f, freq=True, kernel_size=self.kernel_size,
                          stride=self.stride, last=last,
                          name=f"decoder_{idx}")(x, saved.pop(-1), 0)
            xt = HDecLayer(chout_t, freq=False,
                           kernel_size=self.kernel_size, stride=self.stride,
                           last=last, name=f"tdecoder_{idx}")(
                               xt, saved_t.pop(-1), lengths_t.pop(-1))

        # back to channel-first
        x = x.transpose(0, 3, 1, 2)                    # [B, S*C*2, F, T]
        xt = xt.transpose(0, 2, 1)                     # [B, S*C, T]
        Fq, T = x.shape[-2:]
        x = x.reshape(B, S, C_audio * 2, Fq, T)
        x = x * std[:, None] + mean[:, None]
        zout = self._mask(x)
        wave = self._ispec(zout, length)
        xt = xt.reshape(B, S, C_audio, length)
        xt = xt * stdt[:, None] + meant[:, None]
        out = wave + xt
        if length_pre_pad is not None:
            out = out[..., :length_pre_pad]
        return out


# -------------------------------------------------------------- inference

_JIT_APPLY: tp.Dict[int, tp.Any] = {}


def _jitted_apply(model: HTDemucs):
    """One cached jit wrapper per model instance: a fresh `jax.jit` per
    call would retrace (and recompile on cold caches) the whole network."""
    fn = _JIT_APPLY.get(id(model))
    if fn is None:
        if len(_JIT_APPLY) > 8:
            _JIT_APPLY.clear()
        fn = jax.jit(model.apply)
        _JIT_APPLY[id(model)] = fn
    return fn


def apply_demucs(model: HTDemucs, params, mix: np.ndarray,
                 overlap: float = 0.25,
                 jit: bool = True) -> np.ndarray:
    """Segmented overlap-add separation (`demucs/apply.py` apply_model,
    split mode, deterministic shifts=0). mix [B, C, T] float32 at
    `model.samplerate` -> stems [B, S, C, T].

    Each window is exactly `model.segment` seconds (the trained length),
    weighted by the triangle transition window, accumulated host-side.
    """
    mix = np.asarray(mix, np.float32)
    B, C, T = mix.shape
    segment = int(model.samplerate * model.segment)
    stride = int((1 - overlap) * segment)
    fwd = _jitted_apply(model) if jit else model.apply

    weight = np.concatenate([np.arange(1, segment // 2 + 1),
                             np.arange(segment - segment // 2, 0, -1)])
    weight = (weight / weight.max()).astype(np.float32)

    out = np.zeros((B, len(model.sources), C, T), np.float32)
    sum_weight = np.zeros((T,), np.float32)
    for start in range(0, max(T - segment, 0) + stride, stride):
        chunk = mix[..., start:start + segment]
        clen = chunk.shape[-1]
        if clen == 0:
            break
        if clen < segment:
            chunk = np.pad(chunk, ((0, 0), (0, 0), (0, segment - clen)))
        stems = np.asarray(fwd(params, jnp.asarray(chunk)))[..., :clen]
        out[..., start:start + clen] += weight[:clen] * stems
        sum_weight[start:start + clen] += weight[:clen]
        if start + segment >= T:
            break
    out /= np.maximum(sum_weight, 1e-8)
    return out


def separate_melody(model: HTDemucs, params, wav: np.ndarray,
                    sample_rate: int) -> np.ndarray:
    """Isolate the melodic stems (vocals + other) like the reference's
    ChromaStemConditioner (`conditioners.py:605-607,666-674`): resample to
    the demucs rate/channels, separate, sum the melodic stems, and mix
    back down at the input rate. wav [B, C, T] -> [B, 1, T']."""
    from ..data.audio_utils import convert_audio
    wav = np.asarray(wav, np.float32)
    x = np.asarray(convert_audio(wav, sample_rate, model.samplerate,
                                 model.audio_channels))
    stems = apply_demucs(model, params, x)
    keep = [i for i, s in enumerate(model.sources)
            if s in ("vocals", "other")]
    mix = stems[:, keep].sum(axis=1)                   # [B, C, T]
    return np.asarray(convert_audio(mix, model.samplerate, sample_rate, 1))


# ------------------------------------------------------- checkpoint lookup

_SEPARATOR_CACHE: tp.Dict[str, tp.Any] = {}


def get_stem_separator() -> tp.Optional[tp.Tuple[HTDemucs, tp.Any]]:
    """Return the (model, params) stem separator if an htdemucs checkpoint
    is available locally, else None.

    Lookup order: $DEMUCS_CHECKPOINT, then htdemucs.th under
    $AUDIOCRAFT_CACHE_DIR. The reference downloads `htdemucs` through the
    demucs package (`conditioners.py:605`); in the zero-egress image the
    checkpoint must be pre-placed. The result (including a miss) is cached
    per path for the process lifetime.
    """
    import os
    from pathlib import Path
    path = os.environ.get("DEMUCS_CHECKPOINT")
    if not path:
        cache = os.environ.get("AUDIOCRAFT_CACHE_DIR")
        if cache:
            cand = Path(cache) / "htdemucs.th"
            path = str(cand) if cand.exists() else None
    if not path or not Path(path).exists():
        return None
    if path not in _SEPARATOR_CACHE:
        from ..utils.torch_port import load_htdemucs_from_path
        _SEPARATOR_CACHE[path] = load_htdemucs_from_path(path)
    return _SEPARATOR_CACHE[path]
