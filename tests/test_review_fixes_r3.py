"""Regression tests for the round-3 review findings: restore/warm-start
semantics, per-key metric weights, KLD size cropping, and FAD backend
routing."""
import json
from pathlib import Path

import numpy as np
import pytest


# ------------------------------------------------------------------ restore

def _mini_solver(tmp_path, epochs=2):
    from audiocraft_tpu.solvers.compression import CompressionSolver
    from tests.models.test_solvers import _tiny_manifest
    manifest = _tiny_manifest(tmp_path, sr=32000)
    cfg = {
        "seed": 0, "sample_rate": 32000, "channels": 1,
        "solver": "compression",
        "datasource": {"train": manifest, "valid": manifest},
        "dataset": {"batch_size": 2, "segment_duration": 0.5,
                    "num_workers": 0, "train": {"num_samples": 2},
                    "valid": {"num_samples": 2}},
        "optim": {"epochs": epochs, "updates_per_epoch": 1, "lr": 1e-4},
        "encodec": {"autoencoder": "seanet", "quantizer": "rvq",
                    "sample_rate": 32000, "channels": 1},
        "seanet": {"dimension": 8, "n_filters": 2, "n_residual_layers": 1,
                   "ratios": [8, 4], "lstm": 0},
        "rvq": {"dimension": 8, "n_q": 2, "bins": 16},
        "folder": str(tmp_path / "xp"),
    }
    return CompressionSolver(cfg)


def test_warm_start_does_not_restore_donor_epoch(tmp_path):
    """`continue_from` takes only the params: a donor that finished
    optim.epochs=N must not make the new run think it is at epoch N
    (it would then silently train zero epochs)."""
    donor = _mini_solver(tmp_path / "donor", epochs=1)
    donor.run()
    donor_ckpt = Path(donor.cfg["folder"]) / "checkpoint.th"
    assert donor_ckpt.exists()
    assert donor.epoch >= 1

    warm = _mini_solver(tmp_path / "warm", epochs=1)
    assert warm.restore(str(donor_ckpt))
    assert warm.epoch == 0, \
        f"warm start restored donor epoch {warm.epoch}; would train 0 epochs"


def test_own_checkpoint_wins_over_continue_from(tmp_path):
    """A preempted run restarted with the same config (still naming the
    donor) must resume its own progress, not reload the donor
    (`ref base.py:364-377`)."""
    donor = _mini_solver(tmp_path / "donor", epochs=1)
    donor.run()
    donor_ckpt = Path(donor.cfg["folder"]) / "checkpoint.th"

    mine = _mini_solver(tmp_path / "mine", epochs=1)
    mine.run()  # writes its own checkpoint at epoch 1
    resumed = _mini_solver(tmp_path / "mine", epochs=1)
    assert resumed.restore(str(donor_ckpt))
    assert resumed.epoch == 1, "own checkpoint must win over continue_from"


# ----------------------------------------------------------- average_metrics

def test_average_metrics_weights_single_host():
    from audiocraft_tpu.parallel import distrib
    out = distrib.average_metrics(
        {"ce": 2.0, "fad": 1.5, "kld": 0.0}, 4,
        weights={"fad": 1.0, "kld": 0.0})
    assert out["ce"] == 2.0 and out["fad"] == 1.5
    assert "kld" not in out, "zero-weight keys must drop from the result"


# ------------------------------------------------------------------ KLD sizes

def test_kld_crops_padded_tail():
    """Zero-padded tails must not contribute probability mass
    (`ref kld.py:139-145`): the classifier sees each item cropped to its
    valid length."""
    from audiocraft_tpu.metrics.kld import PasstKLDivergenceMetric
    seen = []

    def probe(wav, sr):
        seen.append(wav.shape)
        p = np.full((wav.shape[0], 527), 1.0 / 527, np.float32)
        return p

    metric = PasstKLDivergenceMetric(classifier_fn=probe)
    wav = np.zeros((2, 1, 1000), np.float32)
    metric.update(wav, wav, sizes=np.asarray([1000, 250]),
                  sample_rates=np.asarray([16000, 16000]))
    lengths = sorted(s[-1] for s in seen)
    assert lengths[:2] == [250, 250], \
        f"short item was not cropped to its size: {seen}"
    assert lengths[-1] == 1000


# ----------------------------------------------------------------- FAD builder

def test_get_fad_tf_routes_to_native(monkeypatch):
    monkeypatch.delenv("VGGISH_CHECKPOINT", raising=False)
    monkeypatch.delenv("AUDIOCRAFT_CACHE_DIR", raising=False)
    from audiocraft_tpu.solvers import builders
    metric = builders.get_fad({"model": "tf",
                               "tf": {"bin": "/nonexistent/google_fad"}})
    assert metric.embed_kind in ("vggish", "logmel-fallback")


def test_fad_compute_empty_is_assertion():
    """An empty shard raises AssertionError (caught by the solver's
    per-metric guard), not ValueError from np.concatenate."""
    from audiocraft_tpu.metrics.fad import FrechetAudioDistanceMetric
    metric = FrechetAudioDistanceMetric(embed_fn=lambda w, sr: np.zeros((1, 4)))
    with pytest.raises(AssertionError):
        metric.compute()


# ------------------------------------------------------------------ CLAP probe

def test_clap_probe_requires_tokenizer(tmp_path, monkeypatch):
    """A CLAP checkpoint without RoBERTa tokenizer files must report
    unavailable up front, not crash at the first update()."""
    torch = pytest.importorskip("torch")
    from tests.metrics.test_clap import _tiny_clap
    ckpt = tmp_path / "clap.pt"
    torch.save(_tiny_clap().state_dict(), ckpt)
    from audiocraft_tpu.metrics.clap_consistency import (
        CLAPTextConsistencyMetric)
    audio_fn, text_fn = CLAPTextConsistencyMetric._probe_native_embedders(
        str(ckpt))
    assert audio_fn is None and text_fn is None
