"""JASCO end-to-end + metrics sanity tests."""
import numpy as np
import pytest


def test_jasco_train_and_generate():
    from audiocraft_tpu.solvers.jasco import JascoSolver
    s = JascoSolver({"seed": 0})
    wav = (0.1 * np.random.RandomState(0).randn(2, 1, 12800)).astype(np.float32)
    m = s.run_step(0, (wav, None), {})
    assert np.isfinite(m["loss"])
    j = s.jasco
    j.params = s.state.params
    j.set_generation_params(euler=True, euler_steps=3, duration=0.4)
    out = j.generate(["calm piano"], chords=None)
    assert out.shape == (1, 1, 12800)
    assert np.isfinite(np.asarray(out)).all()


def test_chroma_cosine_metric():
    from audiocraft_tpu.metrics import ChromaCosineSimilarityMetric
    rs = np.random.RandomState(0)
    x = (0.3 * rs.randn(2, 1, 16000)).astype(np.float32)
    m = ChromaCosineSimilarityMetric(sample_rate=16000, n_chroma=12,
                                     radix2_exp=10, argmax=False)
    m.update(x, x, sizes=np.array([16000, 16000]),
             sample_rates=np.array([16000, 16000]))
    assert m.compute() > 0.99  # identical audio -> ~1

    m2 = ChromaCosineSimilarityMetric(sample_rate=16000, n_chroma=12,
                                      radix2_exp=10, argmax=False)
    y = (0.3 * rs.randn(2, 1, 16000)).astype(np.float32)
    m2.update(x, y, sizes=np.array([16000, 16000]),
              sample_rates=np.array([16000, 16000]))
    assert m2.compute() < m.compute()


def test_fad_fallback_embedding():
    from audiocraft_tpu.metrics import FrechetAudioDistanceMetric
    rs = np.random.RandomState(0)
    x = (0.3 * rs.randn(4, 1, 32000)).astype(np.float32)
    y = x + 0.01 * rs.randn(*x.shape).astype(np.float32)
    z = (0.3 * rs.randn(4, 1, 32000)).astype(np.float32)
    m_close = FrechetAudioDistanceMetric()
    m_close.update(y, x, sizes=np.full(4, 32000), sample_rates=np.full(4, 16000))
    fad_close = m_close.compute()
    m_far = FrechetAudioDistanceMetric()
    m_far.update(z, x, sizes=np.full(4, 32000), sample_rates=np.full(4, 16000))
    # identical-ish pairs much closer than independent noise
    assert fad_close < m_far.compute()


def test_kld_metric_with_custom_classifier():
    from audiocraft_tpu.metrics import KLDivergenceMetric

    class DummyKLD(KLDivergenceMetric):
        def _get_label_distribution(self, x, sizes, sample_rates):
            e = np.abs(x).mean(axis=(1, 2), keepdims=True)
            p = np.concatenate([e, 1 - e], axis=-1)[:, 0]
            return np.clip(p, 1e-3, 1)

    m = DummyKLD()
    rs = np.random.RandomState(0)
    x = (0.3 * rs.randn(2, 1, 8000)).astype(np.float32)
    m.update(x, x, np.full(2, 8000), np.full(2, 16000))
    out = m.compute()
    assert abs(out["kld"]) < 1e-6  # identical distributions


def test_rvm_metric():
    from audiocraft_tpu.metrics import RelativeVolumeMel
    rs = np.random.RandomState(0)
    x = (0.3 * rs.randn(1, 24000)).astype(np.float32)
    rvm = RelativeVolumeMel(sample_rate=24000)
    same = rvm(x, x)
    noisy = rvm(x + 0.1 * rs.randn(*x.shape).astype(np.float32), x)
    assert float(same["rvm"]) < float(noisy["rvm"])


def test_miou():
    from audiocraft_tpu.metrics import calculate_miou
    a = np.array([[1, 1, 0, 0]]).astype(float)
    b = np.array([[1, 0, 0, 0]]).astype(float)
    assert calculate_miou(a, a) == 1.0
    assert calculate_miou(a, b) == 0.5


def test_loudness_losses():
    from audiocraft_tpu.losses.loudnessloss import TFLoudnessRatio, basic_loudness
    import jax.numpy as jnp
    rs = np.random.RandomState(0)
    x = jnp.asarray((0.3 * rs.randn(2, 1, 16000)).astype(np.float32))
    loud = basic_loudness(x, 16000)
    assert np.isfinite(np.asarray(loud)).all()
    loss = TFLoudnessRatio(sample_rate=16000, segment=0.5, n_bands=2)
    quiet_wm = loss(x + 0.001 * rs.randn(2, 1, 16000).astype(np.float32), x)
    loud_wm = loss(x + 0.3 * rs.randn(2, 1, 16000).astype(np.float32), x)
    assert float(quiet_wm) < float(loud_wm)
