"""Compressed-audio IO via the native libav wrapper.

Mirrors the reference's PyAV decode contract (`audiocraft/data/audio.py:72-145`)
and the mp3/aac round-trip augmentations (`audiocraft/data/audio_utils.py:233-316`).
"""
import numpy as np
import pytest

from audiocraft_tpu.data import _native
from audiocraft_tpu.data.audio import audio_info, audio_read, audio_write
from audiocraft_tpu.data.audio_utils import get_aac, get_mp3

pytestmark = pytest.mark.skipif(
    not _native.av_available(), reason="native libav wrapper not built")


def _sine(sr=32000, dur=2.0, ch=2, freq=440.0):
    t = np.arange(int(sr * dur)) / sr
    wav = 0.5 * np.sin(2 * np.pi * freq * t)
    return np.stack([wav] * ch).astype(np.float32)


@pytest.mark.parametrize("fmt", ["mp3", "ogg", "flac"])
def test_write_read_round_trip(tmp_path, fmt):
    sr = 32000
    wav = _sine(sr)
    path = audio_write(tmp_path / "clip", wav, sr, format=fmt,
                       normalize=False, strategy="clip")
    assert path.suffix == "." + fmt
    info = audio_info(path)
    assert info.sample_rate == sr
    assert info.channels == 2
    assert abs(info.duration - 2.0) < 0.15
    back, back_sr = audio_read(path)
    assert back_sr == sr
    n = min(back.shape[-1], wav.shape[-1])
    assert n > 0.95 * wav.shape[-1]
    mae = np.abs(back[:, :n] - wav[:, :n]).mean()
    tol = 1e-3 if fmt == "flac" else 0.05
    assert mae < tol, f"{fmt} round trip mae {mae}"


def test_seek_is_sample_accurate_mp3(tmp_path):
    sr = 32000
    rng = np.random.RandomState(0)
    wav = (0.3 * rng.randn(1, sr * 3)).clip(-1, 1).astype(np.float32)
    path = audio_write(tmp_path / "noise", wav, sr, format="mp3",
                       normalize=False, strategy="clip")
    full, _ = audio_read(path)
    seg, seg_sr = audio_read(path, seek_time=1.0, duration=0.5)
    assert seg_sr == sr
    assert seg.shape[-1] == sr // 2
    ref = full[:, sr:sr + seg.shape[-1]]
    assert np.abs(ref - seg).max() < 1e-6  # bit-identical to the full decode


def test_read_pad_on_short_file(tmp_path):
    sr = 16000
    wav = _sine(sr, dur=0.5, ch=1)
    path = audio_write(tmp_path / "short", wav, sr, format="mp3",
                       normalize=False, strategy="clip")
    out, _ = audio_read(path, seek_time=0.0, duration=2.0, pad=True)
    assert out.shape[-1] == 2 * sr


def test_get_mp3_batch_shape_and_error():
    sr = 16000
    rng = np.random.RandomState(1)
    batch = (0.2 * rng.randn(3, 1, sr)).clip(-1, 1).astype(np.float32)
    out = get_mp3(batch, sr, "128k")
    assert out.shape == batch.shape
    # lossy but close
    assert np.abs(out - batch).mean() < 0.1
    assert not np.allclose(out, batch)


def test_get_aac_batch_shape():
    sr = 16000
    rng = np.random.RandomState(2)
    batch = (0.2 * rng.randn(2, 2, sr)).clip(-1, 1).astype(np.float32)
    out = get_aac(batch, sr, "128k")
    assert out.shape == batch.shape
    assert np.abs(out - batch).mean() < 0.1


def test_mp3_attack_under_jit_with_grad():
    import jax
    import jax.numpy as jnp
    from audiocraft_tpu.utils.audio_effects import AudioEffects

    sr = 16000
    rng = np.random.RandomState(3)
    x = jnp.asarray((0.2 * rng.randn(2, 1, sr)).clip(-1, 1), jnp.float32)

    def loss(w):
        y = AudioEffects.mp3_compression(w, sample_rate=sr)
        return jnp.mean(y ** 2)

    val, grad = jax.jit(jax.value_and_grad(loss))(x)
    assert np.isfinite(float(val))
    # straight-through: gradient flows as identity
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).sum()) > 0


def test_reference_asset_decodes_if_present():
    import pathlib
    asset = pathlib.Path("/root/reference/assets/bach.mp3")
    if not asset.exists():
        pytest.skip("reference assets unavailable")
    info = audio_info(asset)
    assert info.sample_rate == 44100
    assert info.channels == 2
    wav, sr = audio_read(asset, seek_time=1.0, duration=2.0)
    assert sr == 44100
    assert wav.shape == (2, 2 * 44100)
    assert float(np.abs(wav).max()) > 0.01
