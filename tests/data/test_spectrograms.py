"""Spectrogram dump helpers (`ref data/audio.py:234-320`)."""
import numpy as np

from audiocraft_tpu.data.audio import get_spec, save_spectrograms


def test_get_spec_shape_and_range():
    sr = 16000
    t = np.arange(sr) / sr
    y = 0.5 * np.sin(2 * np.pi * 440 * t)
    spec = get_spec(y, sr=sr, n_fft=1024, hop_length=256, dur=1.0)
    assert spec.ndim == 2 and spec.shape[0] == 128
    assert spec.max() <= 0.0 and spec.min() >= -80.0
    # a pure tone concentrates energy: the max-energy bin beats the median
    assert spec.max() - np.median(spec) > 20


def test_save_spectrograms_writes_png(tmp_path):
    sr = 16000
    rng = np.random.RandomState(0)
    ys = [0.1 * rng.randn(sr), 0.1 * rng.randn(sr)]
    out = tmp_path / "plots" / "spec.png"
    save_spectrograms(ys, sr, str(out), ["a", "b"], n_fft=1024,
                      hop_length=256, dur=1.0)
    assert out.exists() and out.stat().st_size > 1000
