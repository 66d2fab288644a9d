"""VGGish JAX port: parity vs a torchvggish-layout replica + FAD wiring
(`ref metrics/fad.py:29-123`)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _torchvggish_replica():
    """The torchvggish VGG module (github.com/harritaylor/torchvggish),
    state-dict compatible with its released vggish.pth."""
    import torch.nn as nn

    class VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(
                nn.Conv2d(1, 64, 3, padding=1), nn.ReLU(True),
                nn.MaxPool2d(2, 2),
                nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(True),
                nn.MaxPool2d(2, 2),
                nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(True),
                nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(True),
                nn.MaxPool2d(2, 2),
                nn.Conv2d(256, 512, 3, padding=1), nn.ReLU(True),
                nn.Conv2d(512, 512, 3, padding=1), nn.ReLU(True),
                nn.MaxPool2d(2, 2))
            self.embeddings = nn.Sequential(
                nn.Linear(512 * 4 * 6, 4096), nn.ReLU(True),
                nn.Linear(4096, 4096), nn.ReLU(True),
                nn.Linear(4096, 128), nn.ReLU(True))

        def forward(self, x):
            x = self.features(x)
            x = torch.transpose(x, 1, 3)
            x = torch.transpose(x, 1, 2)
            x = x.contiguous().view(x.size(0), -1)
            return self.embeddings(x)

    torch.manual_seed(0)
    return VGG().eval()


def test_vggish_forward_parity(tmp_path):
    import jax.numpy as jnp
    from audiocraft_tpu.metrics.vggish import load_vggish_params, vggish_apply

    ref = _torchvggish_replica()
    pth = tmp_path / "vggish.pth"
    torch.save(ref.state_dict(), pth)
    params = load_vggish_params(pth)

    rng = np.random.RandomState(0)
    examples = rng.randn(3, 96, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(examples)[:, None]).numpy()
    out = np.asarray(vggish_apply(params, jnp.asarray(examples)))
    assert out.shape == (3, 128) == ref_out.shape
    err = np.abs(out - ref_out).max()
    assert err < 2e-4, f"vggish embedding mismatch: {err}"


def test_waveform_to_examples_shapes():
    from audiocraft_tpu.metrics.vggish import waveform_to_examples
    sr = 16000
    wav = np.random.RandomState(0).randn(sr * 2).astype(np.float32) * 0.1
    ex = waveform_to_examples(wav, sr)
    # 2 s -> 199 frames -> 2 full 96-frame examples
    assert ex.shape == (2, 96, 64)
    # resampling path: 32 kHz input
    ex32 = waveform_to_examples(
        np.random.RandomState(0).randn(32000 * 2).astype(np.float32), 32000)
    assert ex32.shape == (2, 96, 64)
    # too-short input yields no examples, not an error
    assert waveform_to_examples(np.zeros(100, np.float32), sr).shape[0] == 0


def test_fad_uses_vggish_when_checkpoint_present(tmp_path, monkeypatch):
    from audiocraft_tpu.metrics.fad import FrechetAudioDistanceMetric

    ref = _torchvggish_replica()
    pth = tmp_path / "vggish.pth"
    torch.save(ref.state_dict(), pth)
    monkeypatch.setenv("VGGISH_CHECKPOINT", str(pth))
    metric = FrechetAudioDistanceMetric()
    assert metric.embed_kind == "vggish"

    sr = 16000
    rng = np.random.RandomState(0)
    preds = (0.1 * rng.randn(2, 1, sr * 2)).astype(np.float32)
    targets = (0.1 * rng.randn(2, 1, sr * 2)).astype(np.float32)
    sizes = np.asarray([sr * 2, sr * 2])
    srs = np.asarray([sr, sr])
    metric.update(preds, targets, sizes, srs)
    fad = metric.compute()
    assert np.isfinite(fad) and fad >= 0
    # identical sets give ~0 FAD
    metric2 = FrechetAudioDistanceMetric()
    metric2.update(preds, preds, sizes, srs)
    assert abs(metric2.compute()) < 1e-3


def test_fad_falls_back_without_checkpoint(monkeypatch):
    from audiocraft_tpu.metrics.fad import FrechetAudioDistanceMetric
    monkeypatch.delenv("VGGISH_CHECKPOINT", raising=False)
    monkeypatch.delenv("AUDIOCRAFT_CACHE_DIR", raising=False)
    metric = FrechetAudioDistanceMetric()
    assert metric.embed_kind == "logmel-fallback"


def test_frechet_distance_rank_deficient_is_finite_and_quiet():
    """Few samples -> singular covariances; the eps*I retry must keep the
    result finite without emitting scipy LinAlgWarning (`fad.py`)."""
    import warnings
    from audiocraft_tpu.metrics.fad import frechet_distance
    rng = np.random.RandomState(0)
    # 3 samples in 16-D: covariance rank <= 2, sqrtm of the product singular
    x = rng.randn(3, 16)
    y = rng.randn(3, 16) + 0.5
    mu_x, mu_y = x.mean(0), y.mean(0)
    cov_x = np.cov(x, rowvar=False)
    cov_y = np.cov(y, rowvar=False)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        fd = frechet_distance(mu_x, cov_x, mu_y, cov_y)
    assert np.isfinite(fd)
    # deterministic across calls
    assert fd == frechet_distance(mu_x, cov_x, mu_y, cov_y)
