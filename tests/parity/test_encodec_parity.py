"""Numerical parity: reference torch EncodecModel vs our JAX port.

Builds the *actual* reference model (audiocraft/models/encodec.py,
audiocraft/modules/seanet.py) on torch CPU with random weights, converts
its state dict through `torch_port.convert_encodec_state`, and asserts
token-exact encode and allclose decode. This is the conversion-correctness
evidence for any real checkpoint a user drops in the cache dir (real
pretrained weights are not shippable in this image)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_harness import import_reference  # noqa: E402

from audiocraft_tpu.models.encodec import EncodecModel  # noqa: E402
from audiocraft_tpu.modules.seanet import SEANetDecoder, SEANetEncoder  # noqa: E402
from audiocraft_tpu.quantization import ResidualVectorQuantizer  # noqa: E402
from audiocraft_tpu.utils import torch_port  # noqa: E402

RATIOS = (4, 2)
DIM = 16
NF = 4
NRES = 1
LSTM = 1
N_Q = 2
BINS = 32


def _build_reference():
    ref_seanet = import_reference("modules.seanet")
    ref_encodec = import_reference("models.encodec")
    ref_qt = import_reference("quantization.vq")
    kw = dict(channels=1, dimension=DIM, n_filters=NF,
              n_residual_layers=NRES, ratios=list(RATIOS), lstm=LSTM,
              norm="weight_norm", causal=True)
    torch.manual_seed(0)
    encoder = ref_seanet.SEANetEncoder(**kw)
    decoder = ref_seanet.SEANetDecoder(**kw)
    quantizer = ref_qt.ResidualVectorQuantizer(dimension=DIM, n_q=N_Q,
                                               bins=BINS)
    model = ref_encodec.EncodecModel(encoder, decoder, quantizer,
                                     frame_rate=2000, sample_rate=16000,
                                     channels=1, causal=True)
    model.eval()
    # mark codebooks initialized with random embeddings so encode is
    # deterministic (kmeans init never runs in eval)
    with torch.no_grad():
        for lay in model.quantizer.vq.layers:
            cb = lay._codebook
            cb.embed.normal_(0, 0.5)
            cb.embed_avg.copy_(cb.embed)
            cb.cluster_size.fill_(1.0)
            cb.inited.fill_(True)
    return model


def _build_ours():
    kw = dict(channels=1, dimension=DIM, n_filters=NF, n_residual_layers=NRES,
              ratios=RATIOS, lstm=LSTM, norm="weight_norm", causal=True)
    return EncodecModel(SEANetEncoder(**kw), SEANetDecoder(**kw),
                        ResidualVectorQuantizer(dimension=DIM, n_q=N_Q,
                                                bins=BINS, kmeans_init=False),
                        frame_rate=2000, sample_rate=16000, channels=1)


@pytest.fixture(scope="module")
def models():
    ref = _build_reference()
    src = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = torch_port.convert_encodec_state(
        src, ratios=RATIOS, n_residual_layers=NRES, lstm=LSTM, n_q=N_Q)
    ours = _build_ours()
    return ref, ours, variables


def test_encode_tokens_exact(models):
    ref, ours, variables = models
    rs = np.random.RandomState(42)
    x = rs.randn(2, 1, 1600).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_codes, _ = ref.encode(torch.from_numpy(x))
    codes, _ = ours.encode(variables, x)
    agree = (np.asarray(codes) == ref_codes.numpy()).mean()
    assert agree == 1.0, f"token agreement {agree:.4f} != 1.0"


def test_decode_waveform_close(models):
    ref, ours, variables = models
    rs = np.random.RandomState(43)
    codes = rs.randint(0, BINS, (2, N_Q, 25)).astype(np.int64)
    with torch.no_grad():
        ref_wav = ref.decode(torch.from_numpy(codes)).numpy()
    wav = np.asarray(ours.decode(variables, codes.astype(np.int32)))
    assert wav.shape == ref_wav.shape
    err = np.abs(wav - ref_wav).max() / max(np.abs(ref_wav).max(), 1e-9)
    assert err < 1e-4, f"relative decode error {err}"


def test_roundtrip_sisnr_matches(models):
    """End-to-end encode+decode SI-SNR must match the reference's to <0.01dB
    (BASELINE config #1-style check with in-image weights)."""
    ref, ours, variables = models
    rs = np.random.RandomState(44)
    x = (np.cumsum(rs.randn(1, 1, 3200), -1) / 30).astype(np.float32)

    def sisnr(est, refr):
        est, refr = est.reshape(-1), refr.reshape(-1)
        a = np.dot(est, refr) / np.dot(refr, refr)
        return 10 * np.log10(np.sum((a * refr) ** 2)
                             / max(np.sum((a * refr - est) ** 2), 1e-12))

    with torch.no_grad():
        codes_t, _ = ref.encode(torch.from_numpy(x))
        ref_out = ref.decode(codes_t).numpy()[..., :x.shape[-1]]
    codes, _ = ours.encode(variables, x)
    out = np.asarray(ours.decode(variables, codes))[..., :x.shape[-1]]
    s_ref, s_ours = sisnr(ref_out, x), sisnr(out, x)
    assert abs(s_ref - s_ours) < 1e-2, (s_ref, s_ours)
