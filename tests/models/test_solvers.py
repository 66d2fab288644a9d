"""Solver smoke tests: one real training step per solver on tiny shapes."""
import numpy as np
import pytest

from audiocraft_tpu.data.audio_dataset import AudioMeta


def _fake_batch(B=2, C=1, T=3200, sr=16000):
    from audiocraft_tpu.data.info_audio_dataset import AudioInfo
    rs = np.random.RandomState(0)
    wav = (0.1 * rs.randn(B, C, T)).astype(np.float32)
    infos = [AudioInfo(AudioMeta("x.wav", T / sr, sr), 0.0, T, T, sr, C)
             for _ in range(B)]
    return wav, infos


def test_musicgen_solver_step():
    from audiocraft_tpu.solvers.musicgen import MusicGenSolver
    solver = MusicGenSolver({"seed": 0, "sample_rate": 32000,
                             "compression_model_checkpoint": "debug"})
    wav, infos = _fake_batch(T=12800, sr=32000)
    # attach description conditions
    from audiocraft_tpu.data.music_dataset import MusicInfo
    infos = [MusicInfo(**i.to_dict(), description="test tune") for i in infos]
    m = solver.run_step(0, (wav, infos), {})
    assert np.isfinite(m["ce"].item())
    m2 = solver.run_step(1, (wav, infos), {})
    assert np.isfinite(m2["ce"].item())


def test_magnet_solver_step():
    from audiocraft_tpu.solvers.magnet import MagnetSolver
    solver = MagnetSolver({"seed": 0, "sample_rate": 32000,
                           "compression_model_checkpoint": "debug",
                           "dataset": {"segment_duration": 0.4},
                           "masking": {"span_len": 3}})
    wav, infos = _fake_batch(T=12800, sr=32000)
    from audiocraft_tpu.data.music_dataset import MusicInfo
    infos = [MusicInfo(**i.to_dict(), description="masked tune") for i in infos]
    m = solver.run_step(0, (wav, infos), {})
    assert np.isfinite(m["ce"].item())


def test_diffusion_solver_step():
    from audiocraft_tpu.solvers.diffusion import DiffusionSolver
    solver = DiffusionSolver({
        "seed": 0, "sample_rate": 32000, "channels": 1,
        "compression_model_checkpoint": "debug",
        "schedule": {"num_steps": 10},
        "diffusion_unet": {"hidden": 4, "depth": 2, "codec_dim": 32,
                           "norm_groups": 2},
        "processor": {"name": "multi_band_processor", "use": True,
                      "n_bands": 4},
        "dataset": {"segment_duration": 0.2},
    })
    wav, _ = _fake_batch(T=6400, sr=32000)
    m = solver.run_step(0, (wav, None), {})
    assert np.isfinite(m["loss"])


def test_watermark_solver_step():
    from audiocraft_tpu.solvers.watermark import WatermarkSolver
    solver = WatermarkSolver({
        "seed": 0, "sample_rate": 16000,
        "audioseal": {"nbits": 4, "dimension": 16, "n_filters": 2,
                      "ratios": [8, 4]},
        "dataset": {"segment_duration": 0.2},
        "msspec": {"range_start": 6, "range_end": 8, "n_mels": 8},
        "tf_loudnessratio": {"segment": 0.1, "n_bands": 2},
    })
    wav, _ = _fake_batch(T=3200, sr=16000)
    m = solver.run_step(0, (wav, None), {})
    assert np.isfinite(m["d_loss"]) and np.isfinite(m["mb_loss"])
    m2 = solver.run_step(1, (wav, None), {})
    assert np.isfinite(m2["percep_loss"])
