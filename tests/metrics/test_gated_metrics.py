"""Dependency-gated metrics really run when the dependency is supplied:
fake-PaSST KLD, fake-CLAP text consistency, and a fake `pesq` module
injection (VERDICT weak #9 — the gated paths need committed fixtures)."""
import sys
import types

import numpy as np
import pytest


def test_passt_kld_with_injected_classifier():
    from audiocraft_tpu.metrics.kld import PasstKLDivergenceMetric

    rng = np.random.RandomState(0)

    def fake_passt(wav, sr):
        # deterministic "classifier": softmax over per-sample energy stats
        feats = np.stack([
            np.abs(wav).mean(axis=(1, 2)) * (i + 1) for i in range(527)],
            axis=-1)
        e = np.exp(feats - feats.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    metric = PasstKLDivergenceMetric(classifier_fn=fake_passt)
    preds = (0.1 * rng.randn(3, 1, 8000)).astype(np.float32)
    targets = (0.1 * rng.randn(3, 1, 8000)).astype(np.float32)
    metric.update(preds, targets, np.asarray([8000] * 3),
                  np.asarray([16000] * 3))
    out = metric.compute()
    assert set(out) == {"kld", "kld_pq", "kld_qp", "kld_both"}
    assert all(np.isfinite(v) for v in out.values())
    # identical inputs -> zero divergence
    metric2 = PasstKLDivergenceMetric(classifier_fn=fake_passt)
    metric2.update(preds, preds, np.asarray([8000] * 3),
                   np.asarray([16000] * 3))
    assert abs(metric2.compute()["kld"]) < 1e-9


def test_passt_kld_gates_without_classifier():
    from audiocraft_tpu.metrics.kld import PasstKLDivergenceMetric
    metric = PasstKLDivergenceMetric()
    with pytest.raises(RuntimeError, match="PaSST"):
        metric._get_label_distribution(np.zeros((1, 1, 10)), [10], [16000])


def test_clap_consistency_with_injected_embedders():
    from audiocraft_tpu.metrics.clap_consistency import (
        CLAPTextConsistencyMetric)

    def embed_audio(wav, sr):
        B = wav.shape[0]
        v = np.stack([np.full(4, 1.0)] * B)
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    def embed_text(texts):
        out = []
        for t in texts:
            v = np.full(4, 1.0 if "match" in t else -1.0)
            out.append(v / np.linalg.norm(v))
        return np.stack(out)

    metric = CLAPTextConsistencyMetric(embed_audio_fn=embed_audio,
                                       embed_text_fn=embed_text)
    audio = np.zeros((2, 1, 100), np.float32)
    metric.update(audio, ["match one", "no overlap"], [100, 100],
                  [16000, 16000])
    # cos(+1) and cos(-1) average to 0
    assert abs(metric.compute()) < 1e-6


def test_pesq_with_injected_module(monkeypatch):
    """Simulate the pesq C extension being installed."""
    calls = []

    def fake_pesq(sr, ref, deg, mode="wb"):
        calls.append((sr, mode))
        return 3.5

    fake_mod = types.ModuleType("pesq")
    fake_mod.pesq = fake_pesq
    monkeypatch.setitem(sys.modules, "pesq", fake_mod)
    # reload so the module-level gate sees the injected package
    import importlib

    import audiocraft_tpu.metrics.pesq as pesq_metric_mod
    importlib.reload(pesq_metric_mod)
    try:
        metric = pesq_metric_mod.PesqMetric(sample_rate=16000)
        rng = np.random.RandomState(0)
        preds = (0.1 * rng.randn(2, 1, 16000)).astype(np.float32)
        targets = (0.1 * rng.randn(2, 1, 16000)).astype(np.float32)
        metric.update(preds, targets)
        assert abs(metric.compute() - 3.5) < 1e-6
        assert len(calls) == 2
    finally:
        monkeypatch.delitem(sys.modules, "pesq")
        importlib.reload(pesq_metric_mod)
