"""Conversion-parity test for the native HTDemucs.

The `demucs` package is not installable in this image, so this test builds
a torch mirror of the htdemucs architecture whose state-dict keys follow
the demucs layout exactly (`demucs/htdemucs.py`, `demucs/hdemucs.py`,
`demucs/demucs.py` DConv, `demucs/transformer.py`), runs it with random
weights, converts the state dict through
`utils.torch_port.convert_htdemucs`, and asserts the JAX forward matches.
This pins every numerical convention of the converter (conv layouts,
transposed-conv flips, GLU/GELU/GroupNorm/LayerNorm semantics, packed MHA,
cac STFT plumbing, normalization statistics); the remaining risk vs the
real package is limited to the architecture spec itself.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from audiocraft_tpu.modules.demucs import HTDemucs  # noqa: E402
from audiocraft_tpu.utils.torch_port import (  # noqa: E402
    convert_htdemucs, infer_htdemucs_config)

# --- tiny config (structure identical to htdemucs, sizes shrunk) ---------
SOURCES = ("drums", "bass", "other", "vocals")
AUDIO_CH = 2
CHANNELS = 8
GROWTH = 2
DEPTH = 2
NFFT = 256
KERNEL = 8
STRIDE = 4
BOTTOM = 16
T_DEPTH = 3
T_HEADS = 2
DCONV_COMPRESS = 4
DCONV_DEPTH = 2
SR = 8000
SEGMENT = 0.5


class TLayerScale(nn.Module):
    def __init__(self, ch, init):
        super().__init__()
        self.scale = nn.Parameter(torch.full((ch,), init))

    def forward(self, x):
        # transformer usage: [B, T, C]; DConv usage applies on channel dim
        return self.scale * x


class TDConvScale(nn.Module):
    def __init__(self, ch, init):
        super().__init__()
        self.scale = nn.Parameter(torch.full((ch,), init))

    def forward(self, x):  # [B, C, T]
        return self.scale[:, None] * x


def make_dconv(ch):
    hidden = ch // DCONV_COMPRESS
    layers = nn.ModuleList()
    for d in range(DCONV_DEPTH):
        dil = 2 ** d
        layers.append(nn.Sequential(
            nn.Conv1d(ch, hidden, 3, dilation=dil, padding=dil),
            nn.GroupNorm(1, hidden), nn.GELU(),
            nn.Conv1d(hidden, 2 * ch, 1), nn.GroupNorm(1, 2 * ch),
            nn.GLU(1), TDConvScale(ch, 1e-3)))
    mod = nn.Module()
    mod.layers = layers
    return mod


class THEnc(nn.Module):
    def __init__(self, chin, chout, freq):
        super().__init__()
        self.freq = freq
        pad = KERNEL // 4
        if freq:
            self.conv = nn.Conv2d(chin, chout, (KERNEL, 1), (STRIDE, 1),
                                  (pad, 0))
            self.rewrite = nn.Conv2d(chout, 2 * chout, 1)
        else:
            self.conv = nn.Conv1d(chin, chout, KERNEL, STRIDE, pad)
            self.rewrite = nn.Conv1d(chout, 2 * chout, 1)
        self.dconv = make_dconv(chout)

    def forward(self, x):
        if not self.freq:
            le = x.shape[-1]
            if le % STRIDE:
                x = F.pad(x, (0, STRIDE - le % STRIDE))
        x = self.conv(x)
        x = F.gelu(x)
        if self.freq:
            B, C, Fr, T = x.shape
            y = x.permute(0, 2, 1, 3).reshape(-1, C, T)
        else:
            y = x
        for block in self.dconv.layers:
            y = y + block(y)
        if self.freq:
            x = y.view(B, Fr, C, T).permute(0, 2, 1, 3)
        else:
            x = y
        return F.glu(self.rewrite(x), dim=1)


class THDec(nn.Module):
    def __init__(self, chin, chout, freq, last):
        super().__init__()
        self.freq, self.last = freq, last
        self.pad = (KERNEL - STRIDE) // 2
        if freq:
            self.rewrite = nn.Conv2d(chin, 2 * chin, (3, 1), padding=(1, 0))
            self.conv_tr = nn.ConvTranspose2d(chin, chout, (KERNEL, 1),
                                              (STRIDE, 1))
        else:
            self.rewrite = nn.Conv1d(chin, 2 * chin, 3, padding=1)
            self.conv_tr = nn.ConvTranspose1d(chin, chout, KERNEL, STRIDE)

    def forward(self, x, skip, length):
        x = x + skip
        y = F.glu(self.rewrite(x), dim=1)
        z = self.conv_tr(y)
        if self.freq:
            z = z[..., self.pad:-self.pad, :]
        else:
            z = z[..., self.pad:self.pad + length]
        if not self.last:
            z = F.gelu(z)
        return z


class TSelfLayer(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, T_HEADS, batch_first=True)
        self.linear1 = nn.Linear(d, 4 * d)
        self.linear2 = nn.Linear(4 * d, d)
        self.norm1, self.norm2 = nn.LayerNorm(d), nn.LayerNorm(d)
        self.norm_out = nn.LayerNorm(d)
        self.gamma_1, self.gamma_2 = TLayerScale(d, 1e-4), TLayerScale(d, 1e-4)

    def forward(self, x):
        q = self.norm1(x)
        x = x + self.gamma_1(self.self_attn(q, q, q, need_weights=False)[0])
        h = self.linear2(F.gelu(self.linear1(self.norm2(x))))
        x = x + self.gamma_2(h)
        return self.norm_out(x)


class TCrossLayer(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.cross_attn = nn.MultiheadAttention(d, T_HEADS, batch_first=True)
        self.linear1 = nn.Linear(d, 4 * d)
        self.linear2 = nn.Linear(4 * d, d)
        self.norm1, self.norm2 = nn.LayerNorm(d), nn.LayerNorm(d)
        self.norm3, self.norm_out = nn.LayerNorm(d), nn.LayerNorm(d)
        self.gamma_1, self.gamma_2 = TLayerScale(d, 1e-4), TLayerScale(d, 1e-4)

    def forward(self, x, kv):
        q, k = self.norm1(x), self.norm2(kv)
        x = x + self.gamma_1(self.cross_attn(q, k, k,
                                             need_weights=False)[0])
        h = self.linear2(F.gelu(self.linear1(self.norm3(x))))
        x = x + self.gamma_2(h)
        return self.norm_out(x)


def t_sin_embedding(length, dim, max_period=10000.0):
    pos = torch.arange(length).float()[:, None]
    half = dim // 2
    adim = torch.arange(half).float()[None, :]
    phase = pos / (max_period ** (adim / (half - 1)))
    return torch.cat([torch.cos(phase), torch.sin(phase)], dim=-1)


def t_2d_sin_embedding(d_model, height, width, max_period=10000.0):
    pe = torch.zeros(d_model, height, width)
    half = d_model // 2
    div_term = torch.exp(torch.arange(0.0, half, 2)
                         * -(math.log(max_period) / half))
    pos_w = torch.arange(width).float()[:, None]
    pos_h = torch.arange(height).float()[:, None]
    pe[0:half:2] = torch.sin(pos_w * div_term).T[:, None, :].repeat(1, height, 1)
    pe[1:half:2] = torch.cos(pos_w * div_term).T[:, None, :].repeat(1, height, 1)
    pe[half::2] = torch.sin(pos_h * div_term).T[:, :, None].repeat(1, 1, width)
    pe[half + 1::2] = torch.cos(pos_h * div_term).T[:, :, None].repeat(1, 1, width)
    return pe


class TCrossTransformer(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.norm_in, self.norm_in_t = nn.LayerNorm(d), nn.LayerNorm(d)
        self.layers = nn.ModuleList()
        self.layers_t = nn.ModuleList()
        for i in range(T_DEPTH):
            klass = TSelfLayer if i % 2 == 0 else TCrossLayer
            self.layers.append(klass(d))
            self.layers_t.append(klass(d))

    def forward(self, x, xt):
        B, C, Fr, T1 = x.shape
        pe = t_2d_sin_embedding(C, Fr, T1).reshape(C, -1)  # [C, Fr*T1] f-major
        pe = pe.view(C, Fr, T1).permute(2, 1, 0).reshape(T1 * Fr, C)
        x = x.permute(0, 3, 2, 1).reshape(B, T1 * Fr, C)
        x = self.norm_in(x) + pe[None]
        T2 = xt.shape[-1]
        xt = xt.permute(0, 2, 1)
        xt = self.norm_in_t(xt) + t_sin_embedding(T2, C)[None]
        for i in range(T_DEPTH):
            if i % 2 == 0:
                x = self.layers[i](x)
                xt = self.layers_t[i](xt)
            else:
                old = x
                x = self.layers[i](x, xt)
                xt = self.layers_t[i](xt, old)
        x = x.view(B, T1, Fr, C).permute(0, 3, 2, 1)
        xt = xt.permute(0, 2, 1)
        return x, xt


class TScaledEmbedding(nn.Module):
    def __init__(self, n, d, scale=10.0):
        super().__init__()
        self.embedding = nn.Embedding(n, d)
        self.scale = scale

    def forward(self, x):
        return self.embedding(x) * self.scale


class TorchHTDemucs(nn.Module):
    """Mirror of demucs v4 HTDemucs with demucs state-dict key names."""

    def __init__(self):
        super().__init__()
        chs = [CHANNELS * GROWTH ** i for i in range(DEPTH)]
        self.encoder = nn.ModuleList(
            [THEnc(AUDIO_CH * 2 if i == 0 else chs[i - 1], chs[i], True)
             for i in range(DEPTH)])
        self.tencoder = nn.ModuleList(
            [THEnc(AUDIO_CH if i == 0 else chs[i - 1], chs[i], False)
             for i in range(DEPTH)])
        dec_in = chs[::-1]
        self.decoder = nn.ModuleList(
            [THDec(dec_in[i],
                   len(SOURCES) * AUDIO_CH * 2 if i == DEPTH - 1
                   else dec_in[i + 1], True, i == DEPTH - 1)
             for i in range(DEPTH)])
        self.tdecoder = nn.ModuleList(
            [THDec(dec_in[i],
                   len(SOURCES) * AUDIO_CH if i == DEPTH - 1
                   else dec_in[i + 1], False, i == DEPTH - 1)
             for i in range(DEPTH)])
        self.freq_emb = TScaledEmbedding(NFFT // 2 // STRIDE, chs[0])
        self.channel_upsampler = nn.Conv1d(chs[-1], BOTTOM, 1)
        self.channel_downsampler = nn.Conv1d(BOTTOM, chs[-1], 1)
        self.channel_upsampler_t = nn.Conv1d(chs[-1], BOTTOM, 1)
        self.channel_downsampler_t = nn.Conv1d(BOTTOM, chs[-1], 1)
        self.crosstransformer = TCrossTransformer(BOTTOM)

    def _spec(self, x):
        hl = NFFT // 4
        T = x.shape[-1]
        le = int(math.ceil(T / hl))
        pad = hl // 2 * 3
        x = F.pad(x, (pad, pad + le * hl - T), mode="reflect")
        B, C, Tp = x.shape
        z = torch.stft(x.view(-1, Tp), NFFT, hl,
                       window=torch.hann_window(NFFT), normalized=True,
                       center=True, pad_mode="reflect", return_complex=True)
        z = z.view(B, C, *z.shape[-2:])[..., :-1, :]
        return z[..., 2:2 + le]

    def _ispec(self, z, length):
        hl = NFFT // 4
        z = F.pad(z, (2, 2))
        z = F.pad(z, (0, 0, 0, 1))
        pad = hl // 2 * 3
        le = hl * int(math.ceil(length / hl)) + 2 * pad
        shape = z.shape
        x = torch.istft(z.reshape(-1, *shape[-2:]), NFFT, hl,
                        window=torch.hann_window(NFFT), normalized=True,
                        length=le)
        x = x.view(*shape[:-2], le)
        return x[..., pad:pad + length]

    def forward(self, mix):
        B, C, length = mix.shape
        z = self._spec(mix)
        B_, C_, Fq, T = z.shape
        mag = torch.view_as_real(z).permute(0, 1, 4, 2, 3).reshape(
            B, C * 2, Fq, T)
        mean = mag.mean(dim=(1, 2, 3), keepdim=True)
        std = mag.std(dim=(1, 2, 3), keepdim=True)
        x = (mag - mean) / (1e-5 + std)
        meant = mix.mean(dim=(1, 2), keepdim=True)
        stdt = mix.std(dim=(1, 2), keepdim=True)
        xt = (mix - meant) / (1e-5 + stdt)

        saved, saved_t, lengths_t = [], [], []
        for idx in range(DEPTH):
            lengths_t.append(xt.shape[-1])
            xt = self.tencoder[idx](xt)
            saved_t.append(xt)
            x = self.encoder[idx](x)
            if idx == 0:
                frs = torch.arange(x.shape[-2])
                emb = self.freq_emb(frs).t()[None, :, :, None].expand_as(x)
                x = x + 0.2 * emb
            saved.append(x)

        b, c, f, t = x.shape
        x = self.channel_upsampler(x.reshape(b, c, -1)).view(b, -1, f, t)
        xt = self.channel_upsampler_t(xt)
        x, xt = self.crosstransformer(x, xt)
        b, c2, f, t = x.shape
        x = self.channel_downsampler(x.reshape(b, c2, -1)).view(b, -1, f, t)
        xt = self.channel_downsampler_t(xt)

        for idx in range(DEPTH):
            x = self.decoder[idx](x, saved.pop(-1), 0)
            xt = self.tdecoder[idx](xt, saved_t.pop(-1), lengths_t.pop(-1))

        S = len(SOURCES)
        x = x.view(B, S, C * 2, Fq, T)
        x = x * std[:, None] + mean[:, None]
        zout = torch.view_as_complex(
            x.view(B, S, C, 2, Fq, T).permute(0, 1, 2, 4, 5, 3).contiguous())
        wave = self._ispec(zout, length)
        xt = xt.view(B, S, C, length)
        xt = xt * stdt[:, None] + meant[:, None]
        return wave + xt


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = TorchHTDemucs().eval()
    # non-degenerate LayerScales so the residual branches matter
    with torch.no_grad():
        for n, p in model.named_parameters():
            if n.endswith(".scale"):
                p.copy_(torch.rand_like(p) * 0.5 + 0.25)
    return model


def test_infer_config(torch_model):
    src = {k: v.detach().numpy() for k, v in
           torch_model.state_dict().items()}
    cfg = infer_htdemucs_config(src)
    assert cfg["depth"] == DEPTH
    assert cfg["channels"] == CHANNELS
    assert cfg["audio_channels"] == AUDIO_CH
    assert cfg["bottom_channels"] == BOTTOM
    assert cfg["t_depth"] == T_DEPTH
    assert cfg["dconv_compress"] == DCONV_COMPRESS
    assert cfg["nfft"] == NFFT


def test_htdemucs_forward_parity(torch_model):
    src = {k: v.detach().numpy() for k, v in
           torch_model.state_dict().items()}
    variables = convert_htdemucs(src)
    model = HTDemucs(sources=SOURCES, audio_channels=AUDIO_CH,
                     channels=CHANNELS, growth=GROWTH, depth=DEPTH,
                     nfft=NFFT, bottom_channels=BOTTOM, t_depth=T_DEPTH,
                     t_heads=T_HEADS, dconv_compress=DCONV_COMPRESS,
                     dconv_depth=DCONV_DEPTH, samplerate=SR,
                     segment=SEGMENT)
    x = np.random.RandomState(1).randn(2, AUDIO_CH, 4000).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x)).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert out.shape == ref.shape == (2, len(SOURCES), AUDIO_CH, 4000)
    err = np.abs(out - ref).max()
    scale = np.abs(ref).max()
    assert err < 2e-4 * max(scale, 1.0), (err, scale)
