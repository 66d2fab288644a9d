"""Solver-level generative-metric wiring: `evaluate` must emit fad/kld/
text_consistency/chroma_cosine through the *solver* path when local
checkpoints exist, and degrade per-metric (not blanket-skip) when they
don't (`ref solvers/musicgen.py:597-739`)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.metrics.test_clap import _tiny_clap, _tiny_tokenizer_dir  # noqa: E402
from tests.metrics.test_passt import _passt_replica  # noqa: E402
from tests.metrics.test_vggish import _torchvggish_replica  # noqa: E402
from tests.models.test_solvers import _tiny_manifest  # noqa: E402


def _solver(tmp_path, metrics_flags, metrics_cfg=None):
    from audiocraft_tpu.solvers.musicgen import MusicGenSolver
    manifest = _tiny_manifest(tmp_path, sr=32000)
    cfg = {
        "seed": 0, "sample_rate": 32000, "channels": 1,
        "compression_model_checkpoint": "debug",
        "datasource": {"evaluate": manifest},
        # >= 1 s of valid audio per clip so VGGish gets >1 FAD windows
        "dataset": {"batch_size": 2, "segment_duration": 2.0,
                    "num_workers": 0, "evaluate": {"num_samples": 2}},
        "generate": {"lm": {"gen_duration": 2.0}},
        "evaluate": {"metrics": metrics_flags, "max_generation_batches": 1},
        "folder": str(tmp_path / "xp"),
    }
    if metrics_cfg:
        cfg["metrics"] = metrics_cfg
    return MusicGenSolver(cfg)


def test_evaluate_emits_all_generative_metrics(tmp_path, monkeypatch):
    """With local VGGish/PaSST/CLAP checkpoints present, the solver evaluate
    stage computes every requested generative metric."""
    torch.save(_torchvggish_replica().state_dict(), tmp_path / "vggish.pth")
    torch.save(_passt_replica().state_dict(), tmp_path / "passt.pt")
    torch.save(_tiny_clap().state_dict(), tmp_path / "clap.pt")
    tok = _tiny_tokenizer_dir(tmp_path)
    monkeypatch.setenv("VGGISH_CHECKPOINT", str(tmp_path / "vggish.pth"))
    monkeypatch.setenv("PASST_CHECKPOINT", str(tmp_path / "passt.pt"))
    monkeypatch.setenv("CLAP_CHECKPOINT", str(tmp_path / "clap.pt"))
    monkeypatch.setenv("CLAP_TOKENIZER", str(tok))

    solver = _solver(tmp_path, {"fad": True, "kld": True,
                                "text_consistency": True,
                                "chroma_cosine": True})
    m = solver.evaluate()
    for key in ("ce", "fad", "kld", "kld_both", "text_consistency",
                "chroma_cosine"):
        assert key in m, f"missing {key} in {sorted(m)}"
        assert np.isfinite(m[key]), f"{key} not finite: {m[key]}"
    assert m["fad"] >= 0 and m["kld"] >= 0
    assert -1.0 <= m["text_consistency"] <= 1.0


def test_evaluate_degrades_per_metric_without_checkpoints(tmp_path,
                                                          monkeypatch):
    """No checkpoints: kld/text_consistency are skipped individually, FAD
    falls back to the labeled log-mel embedding — not a blanket skip."""
    for var in ("VGGISH_CHECKPOINT", "PASST_CHECKPOINT", "CLAP_CHECKPOINT",
                "CLAP_TOKENIZER", "AUDIOCRAFT_CACHE_DIR"):
        monkeypatch.delenv(var, raising=False)
    solver = _solver(tmp_path, {"fad": True, "kld": True,
                                "text_consistency": True})
    m = solver.evaluate()
    assert "fad_logmel" in m and np.isfinite(m["fad_logmel"])
    assert "fad" not in m
    assert "kld" not in m and "text_consistency" not in m
    assert "ce" in m  # the CE/PPL eval still ran


def test_evaluate_use_gt_paths(tmp_path, monkeypatch):
    """use_gt routes the codec-compressed ground truth instead of generated
    audio (`ref musicgen.py:665-668, 705-717`)."""
    torch.save(_torchvggish_replica().state_dict(), tmp_path / "vggish.pth")
    monkeypatch.setenv("VGGISH_CHECKPOINT", str(tmp_path / "vggish.pth"))
    solver = _solver(tmp_path, {"fad": True},
                     {"fad": {"use_gt": True, "model": "vggish"}})
    m = solver.evaluate()
    assert "fad" in m and np.isfinite(m["fad"]) and m["fad"] >= 0
