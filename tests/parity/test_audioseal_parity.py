"""Numerical parity: AudioSeal generator/detector torch layout vs our port.

The audioseal package (github.com/facebookresearch/audioseal) is not in this
image, but its modules are thin compositions of the reference's own SEANet
(audioseal vendored audiocraft's seanet.py): generator = SEANetEncoder ->
MsgProcessor -> SEANetDecoder; detector = Sequential(SEANetEncoder +
reverse ConvTranspose1d ("SEANetEncoderKeepDimension"), 1x1 Conv1d head).
This test reconstructs that exact torch layout (state-dict-compatible with
facebook/audioseal checkpoints: `encoder.*`, `decoder.*`,
`msg_processor.msg_embeddings.weight`, `detector.0.*`, `detector.1.*`),
converts through torch_port, and asserts allclose outputs."""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_harness import import_reference  # noqa: E402

from audiocraft_tpu.models.watermark import (  # noqa: E402
    AudioSealDetector, AudioSealWM)
from audiocraft_tpu.utils import torch_port  # noqa: E402

NBITS = 4
DIM = 16
NF = 4
RATIOS = [4, 2]
OUTPUT_DIM = 8
SR = 16000


def _seanet_kwargs():
    return dict(channels=1, dimension=DIM, n_filters=NF,
                n_residual_layers=1, ratios=list(RATIOS), lstm=2,
                norm="weight_norm", causal=False, pad_mode="constant")


class TorchMsgProcessor(torch.nn.Module):
    """audioseal.MsgProcessor: per-(bit,value) embeddings summed into the
    latent; state dict key `msg_embeddings.weight`."""

    def __init__(self, nbits, hidden_size):
        super().__init__()
        self.nbits = nbits
        self.msg_embeddings = torch.nn.Embedding(2 * nbits, hidden_size)

    def forward(self, latent, msg):
        # latent [B, D, T]; msg [B, nbits]
        indices = 2 * torch.arange(self.nbits)[None, :] + msg.long()
        aux = self.msg_embeddings(indices).sum(dim=1)  # [B, D]
        return latent + aux[:, :, None]


class TorchGenerator(torch.nn.Module):
    """audioseal.AudioSealWM layout: encoder/decoder/msg_processor."""

    def __init__(self, seanet_mod):
        super().__init__()
        self.encoder = seanet_mod.SEANetEncoder(**_seanet_kwargs())
        self.decoder = seanet_mod.SEANetDecoder(**_seanet_kwargs())
        self.msg_processor = TorchMsgProcessor(NBITS, DIM)

    def get_watermark(self, x, message):
        latent = self.encoder(x)
        latent = self.msg_processor(latent, message)
        return self.decoder(latent)[..., :x.shape[-1]]


class TorchDetector(torch.nn.Module):
    """audioseal.AudioSealDetector layout: Sequential(encoder-keep-dim, 1x1)."""

    def __init__(self, seanet_mod):
        super().__init__()
        encoder = seanet_mod.SEANetEncoder(**_seanet_kwargs())
        hop = math.prod(RATIOS)
        encoder.reverse_convolution = torch.nn.ConvTranspose1d(
            DIM, OUTPUT_DIM, hop, stride=hop)
        last = torch.nn.Conv1d(OUTPUT_DIM, 2 + NBITS, 1)
        self.detector = torch.nn.Sequential(encoder, last)

    def forward(self, x):
        enc = self.detector[0]
        T = x.shape[-1]
        h = enc.model(x)
        h = enc.reverse_convolution(h)[..., :T]
        out = self.detector[1](h)
        out = torch.cat([torch.softmax(out[:, :2], dim=1), out[:, 2:]], dim=1)
        return out


def test_audioseal_generator_parity():
    import jax.numpy as jnp
    seanet_mod = import_reference("modules.seanet")
    torch.manual_seed(0)
    ref = TorchGenerator(seanet_mod).eval()
    src = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ours = AudioSealWM(nbits=NBITS, dimension=DIM, n_filters=NF,
                       ratios=tuple(RATIOS))
    params = torch_port.convert_audioseal_generator(src, ratios=RATIOS)
    rng = np.random.RandomState(0)
    x = (0.5 * rng.randn(2, 1, 257)).astype(np.float32)
    msg = rng.randint(0, 2, size=(2, NBITS)).astype(np.int32)
    with torch.no_grad():
        wm_ref = ref.get_watermark(torch.from_numpy(x),
                                   torch.from_numpy(msg)).numpy()
    wm = np.asarray(ours.apply(params, jnp.asarray(x), jnp.asarray(msg),
                               method=AudioSealWM.get_watermark))
    assert wm.shape == wm_ref.shape
    err = np.abs(wm - wm_ref).max()
    assert err < 2e-4, f"generator watermark mismatch: {err}"


def test_audioseal_detector_parity():
    import jax.numpy as jnp
    seanet_mod = import_reference("modules.seanet")
    torch.manual_seed(1)
    ref = TorchDetector(seanet_mod).eval()
    src = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ours = AudioSealDetector(nbits=NBITS, dimension=DIM, n_filters=NF,
                             output_dim=OUTPUT_DIM, ratios=tuple(RATIOS))
    params = torch_port.convert_audioseal_detector(src, ratios=RATIOS)
    rng = np.random.RandomState(1)
    x = (0.5 * rng.randn(2, 1, 257)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()
    out = np.asarray(ours.apply(params, jnp.asarray(x)))
    assert out.shape == ref_out.shape
    err = np.abs(out - ref_out).max()
    assert err < 2e-4, f"detector output mismatch: {err}"
    # detection probabilities sum to 1
    np.testing.assert_allclose(out[:, :2].sum(axis=1), 1.0, rtol=1e-5)
