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


def _tiny_manifest(tmp_path, n=2, sr=16000):
    from audiocraft_tpu.data.audio import audio_write
    from audiocraft_tpu.data.audio_dataset import AudioMeta, save_audio_meta
    metas = []
    rs = np.random.RandomState(0)
    for i in range(n):
        wav = (0.2 * np.sin(2 * np.pi * (200 + 100 * i)
                            * np.arange(sr) / sr)).astype(np.float32)[None]
        path = audio_write(tmp_path / f"{i}", wav, sr)
        metas.append(AudioMeta(path=str(path), duration=1.0, sample_rate=sr))
    manifest = tmp_path / "data.jsonl"
    save_audio_meta(manifest, metas)
    return str(manifest)


def test_musicgen_solver_evaluate_and_generate_stages(tmp_path):
    """Evaluate (CE/PPL, no dropout) + generate (SampleManager) stages
    (`solvers/musicgen.py:511-739`)."""
    from audiocraft_tpu.solvers.musicgen import MusicGenSolver
    manifest = _tiny_manifest(tmp_path, sr=32000)
    solver = MusicGenSolver({
        "seed": 0, "sample_rate": 32000, "channels": 1,
        "compression_model_checkpoint": "debug",
        "datasource": {"evaluate": manifest, "generate": manifest},
        "dataset": {"batch_size": 2, "segment_duration": 1.0,
                    "num_workers": 0,
                    "evaluate": {"num_samples": 2},
                    "generate": {"num_samples": 2}},
        "generate": {"lm": {"gen_duration": 0.4, "prompted_samples": True,
                            "prompt_duration": 0.2}},
        "folder": str(tmp_path / "xp"),
    })
    ev = solver.evaluate()
    assert np.isfinite(ev["ce"]) and ev["ppl"] > 1
    gen = solver.generate()
    assert gen["generated_samples"] == 2
    wavs = list((tmp_path / "xp" / "samples").rglob("*.wav"))
    assert len(wavs) >= 4  # prompted + unprompted + references


def test_compression_solver_evaluate_stage(tmp_path):
    """SI-SNR/RVM eval over the evaluate split (`compression.py:183-238`)."""
    from audiocraft_tpu.solvers.compression import CompressionSolver
    manifest = _tiny_manifest(tmp_path, sr=16000)
    solver = CompressionSolver({
        "seed": 0, "sample_rate": 16000, "channels": 1,
        "datasource": {"evaluate": manifest},
        "dataset": {"batch_size": 2, "segment_duration": 0.5,
                    "num_workers": 0, "evaluate": {"num_samples": 2}},
        "folder": str(tmp_path / "xp"),
    })
    m = solver.evaluate()
    assert np.isfinite(m["sisnr"]) and np.isfinite(m["rvm"])


def test_musicgen_cached_batch_flow(tmp_path):
    """Token-cache write then cached training (`musicgen.py:50-63,617-634`)."""
    from audiocraft_tpu.solvers.musicgen import MusicGenSolver
    manifest = _tiny_manifest(tmp_path, sr=32000)
    base = {
        "seed": 0, "sample_rate": 32000, "channels": 1,
        "compression_model_checkpoint": "debug",
        "datasource": {"train": manifest},
        "dataset": {"batch_size": 2, "segment_duration": 1.0,
                    "num_workers": 0, "train": {"num_samples": 2}},
        "optim": {"epochs": 1, "updates_per_epoch": 1},
    }
    w = MusicGenSolver({**base, "cache": {"path": str(tmp_path / "tok"),
                                          "write": True},
                        "folder": str(tmp_path / "xp_w")})
    w.run()
    shards = list((tmp_path / "tok").rglob("*.zip"))
    assert len(shards) == 1
    r = MusicGenSolver({**base, "cache": {"path": str(tmp_path / "tok")},
                        "folder": str(tmp_path / "xp_r")})
    hist = r.run()
    assert np.isfinite(hist[0]["train"]["ce"])
