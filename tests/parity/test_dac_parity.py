"""DAC parity: our JAX DAC vs a state-dict-compatible torch replica of
descript-audio-codec (the dac package is not installable here; the replica
reproduces dac/model/dac.py + dac/nn/quantize.py exactly, so its state dicts
share the naming of real facebook DAC checkpoints)."""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from audiocraft_tpu.models.dac import DAC, DACModel  # noqa: E402
from audiocraft_tpu.utils import torch_port  # noqa: E402

# tiny geometry (same structure, fewer channels)
ENC_DIM = 8
ENC_RATES = [2, 4]
DEC_DIM = 16
DEC_RATES = [4, 2]
N_CODEBOOKS = 3
CB_SIZE = 32
CB_DIM = 4
LATENT = ENC_DIM * (2 ** len(ENC_RATES))


def WNConv1d(*a, **k):
    return tnn.utils.weight_norm(tnn.Conv1d(*a, **k))


def WNConvTranspose1d(*a, **k):
    return tnn.utils.weight_norm(tnn.ConvTranspose1d(*a, **k))


class Snake1d(tnn.Module):
    def __init__(self, channels):
        super().__init__()
        self.alpha = tnn.Parameter(torch.ones(1, channels, 1))

    def forward(self, x):
        a = self.alpha
        return x + (1.0 / (a + 1e-9)) * torch.sin(a * x) ** 2


class ResidualUnit(tnn.Module):
    def __init__(self, dim, dilation=1):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.block = tnn.Sequential(
            Snake1d(dim), WNConv1d(dim, dim, 7, dilation=dilation,
                                   padding=pad),
            Snake1d(dim), WNConv1d(dim, dim, 1))

    def forward(self, x):
        return x + self.block(x)


class EncoderBlock(tnn.Module):
    def __init__(self, dim, stride):
        super().__init__()
        self.block = tnn.Sequential(
            ResidualUnit(dim // 2, 1), ResidualUnit(dim // 2, 3),
            ResidualUnit(dim // 2, 9), Snake1d(dim // 2),
            WNConv1d(dim // 2, dim, 2 * stride, stride=stride,
                     padding=math.ceil(stride / 2)))

    def forward(self, x):
        return self.block(x)


class Encoder(tnn.Module):
    def __init__(self):
        super().__init__()
        d = ENC_DIM
        block = [WNConv1d(1, d, 7, padding=3)]
        for stride in ENC_RATES:
            d *= 2
            block += [EncoderBlock(d, stride)]
        block += [Snake1d(d), WNConv1d(d, LATENT, 3, padding=1)]
        self.block = tnn.Sequential(*block)

    def forward(self, x):
        return self.block(x)


class DecoderBlock(tnn.Module):
    def __init__(self, in_dim, out_dim, stride):
        super().__init__()
        self.block = tnn.Sequential(
            Snake1d(in_dim),
            WNConvTranspose1d(in_dim, out_dim, 2 * stride, stride=stride,
                              padding=math.ceil(stride / 2)),
            ResidualUnit(out_dim, 1), ResidualUnit(out_dim, 3),
            ResidualUnit(out_dim, 9))

    def forward(self, x):
        return self.block(x)


class Decoder(tnn.Module):
    def __init__(self):
        super().__init__()
        layers = [WNConv1d(LATENT, DEC_DIM, 7, padding=3)]
        d = DEC_DIM
        for stride in DEC_RATES:
            layers += [DecoderBlock(d, d // 2, stride)]
            d //= 2
        layers += [Snake1d(d), WNConv1d(d, 1, 7, padding=3), tnn.Tanh()]
        self.model = tnn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class VectorQuantize(tnn.Module):
    def __init__(self):
        super().__init__()
        self.in_proj = WNConv1d(LATENT, CB_DIM, 1)
        self.out_proj = WNConv1d(CB_DIM, LATENT, 1)
        self.codebook = tnn.Embedding(CB_SIZE, CB_DIM)

    def decode_latents(self, latents):
        enc = latents.permute(0, 2, 1).reshape(-1, CB_DIM)
        cb = self.codebook.weight
        enc_n, cb_n = F.normalize(enc), F.normalize(cb)
        dist = (enc_n.pow(2).sum(1, keepdim=True)
                - 2 * enc_n @ cb_n.t() + cb_n.pow(2).sum(1, keepdim=True).t())
        idx = (-dist).max(1)[1].reshape(latents.shape[0], -1)
        return self.codebook(idx).transpose(1, 2), idx

    def forward(self, z):
        z_e = self.in_proj(z)
        z_q, idx = self.decode_latents(z_e)
        return self.out_proj(z_q), idx


class RVQ(tnn.Module):
    def __init__(self):
        super().__init__()
        self.quantizers = tnn.ModuleList(
            [VectorQuantize() for _ in range(N_CODEBOOKS)])

    def encode(self, z):
        residual = z
        codes = []
        for q in self.quantizers:
            z_q, idx = q(residual)
            residual = residual - z_q
            codes.append(idx)
        return torch.stack(codes, dim=1)

    def from_codes(self, codes):
        z_q = 0.0
        for i, q in enumerate(self.quantizers):
            z = q.codebook(codes[:, i]).transpose(1, 2)
            z_q = z_q + q.out_proj(z)
        return z_q


class TorchDAC(tnn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = Encoder()
        self.decoder = Decoder()
        self.quantizer = RVQ()


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    ref = TorchDAC().eval()
    src = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    model = DACModel(encoder_dim=ENC_DIM, encoder_rates=tuple(ENC_RATES),
                     decoder_dim=DEC_DIM, decoder_rates=tuple(DEC_RATES),
                     n_codebooks=N_CODEBOOKS, codebook_size=CB_SIZE,
                     codebook_dim=CB_DIM, sample_rate=16000)
    variables = torch_port.convert_dac_state(
        src, n_enc_blocks=len(ENC_RATES), n_dec_blocks=len(DEC_RATES),
        n_codebooks=N_CODEBOOKS)
    return ref, model, variables


def test_dac_encode_tokens_exact(pair):
    import jax.numpy as jnp
    ref, model, variables = pair
    rng = np.random.RandomState(0)
    x = (0.3 * rng.randn(2, 1, 64)).astype(np.float32)
    with torch.no_grad():
        z = ref.encoder(torch.from_numpy(x))
        ref_codes = ref.quantizer.encode(z).numpy()
    codes = np.asarray(model.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                                   method=DACModel.encode))
    assert codes.shape == ref_codes.shape
    agree = (codes == ref_codes).mean()
    assert agree == 1.0, f"dac token agreement {agree}"


def test_dac_decode_waveform_close(pair):
    import jax.numpy as jnp
    ref, model, variables = pair
    rng = np.random.RandomState(1)
    codes = rng.randint(0, CB_SIZE, (2, N_CODEBOOKS, 9)).astype(np.int64)
    with torch.no_grad():
        z_q = ref.quantizer.from_codes(torch.from_numpy(codes))
        ref_wav = ref.decoder(z_q).numpy()
    wav = np.asarray(model.apply(variables, jnp.asarray(codes.astype(np.int32)),
                                 method=DACModel.decode)).transpose(0, 2, 1)
    assert wav.shape == ref_wav.shape
    err = np.abs(wav - ref_wav).max()
    assert err < 2e-4, f"dac decode mismatch: {err}"


def test_dac_compression_model_interface(pair):
    import jax.numpy as jnp
    _, model, variables = pair
    dac = DAC(model, n_quantizers=2)
    assert dac.frame_rate == 16000 // 8
    assert dac.total_codebooks == N_CODEBOOKS
    assert dac.num_codebooks == 2
    x = jnp.asarray((0.1 * np.random.RandomState(2).randn(1, 1, 100)
                     ).astype(np.float32))
    codes, scale = dac.encode(variables, x)
    assert scale is None
    assert np.asarray(codes).shape[1] == 2  # n_quantizers respected
    out = dac.decode(variables, codes)
    assert np.asarray(out).shape[1] == 1
    lat = dac.decode_latent(variables, codes)
    assert np.asarray(lat).shape[-1] == LATENT
