"""HTDemucs wiring tests: segmented inference, melody-stem helper, the
ChromaStemConditioner separator hookup, and checkpoint loading via
$DEMUCS_CHECKPOINT (`ref modules/conditioners.py:596-607,666-674`)."""
import importlib.util
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiocraft_tpu.modules.demucs import (HTDemucs, apply_demucs,
                                           separate_melody)

TINY = dict(sources=("drums", "bass", "other", "vocals"), audio_channels=2,
            channels=8, growth=2, depth=2, nfft=256, bottom_channels=16,
            t_depth=3, t_heads=2, dconv_compress=4, samplerate=8000,
            segment=0.5)


@pytest.fixture(scope="module")
def tiny_model():
    model = HTDemucs(**TINY)
    x = jnp.zeros((1, 2, int(TINY["samplerate"] * TINY["segment"])))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_apply_demucs_shapes(tiny_model):
    model, params = tiny_model
    # 2.6 segments -> 4 overlapping windows at 25% overlap
    T = int(2.6 * TINY["samplerate"] * TINY["segment"])
    mix = np.random.RandomState(0).randn(1, 2, T).astype(np.float32) * 0.1
    out = apply_demucs(model, params, mix, jit=False)
    assert out.shape == (1, 4, 2, T)
    assert np.isfinite(out).all()


def test_apply_demucs_short_input(tiny_model):
    model, params = tiny_model
    # shorter than one segment: padded internally, cropped back
    T = int(0.3 * TINY["samplerate"])
    mix = np.random.RandomState(1).randn(1, 2, T).astype(np.float32) * 0.1
    out = apply_demucs(model, params, mix, jit=False)
    assert out.shape == (1, 4, 2, T)
    assert np.isfinite(out).all()


def test_separate_melody_mixes_down(tiny_model):
    model, params = tiny_model
    # input at a different rate/channel count than the separator
    T = 6000
    wav = np.random.RandomState(2).randn(1, 1, T).astype(np.float32) * 0.1
    mel = separate_melody(model, params, wav, sample_rate=12000)
    assert mel.shape[0] == 1 and mel.shape[1] == 1
    # back at the input rate: same length within resampling slack
    assert abs(mel.shape[-1] - T) <= 2
    assert np.isfinite(mel).all()


def test_chroma_conditioner_uses_separator(tiny_model, monkeypatch):
    from audiocraft_tpu.modules import conditioners as cond_mod
    from audiocraft_tpu.modules import demucs as demucs_mod
    from audiocraft_tpu.modules.conditioners import (ChromaStemConditioner,
                                                     WavCondition)
    monkeypatch.setattr(demucs_mod, "get_stem_separator", lambda: tiny_model)
    cond = ChromaStemConditioner(dim=12, output_dim=16, sample_rate=8000,
                                 n_chroma=12, radix2_exp=9, duration=1.0,
                                 match_len_on_eval=False)
    wav = np.random.RandomState(3).randn(2, 1, 8000).astype(np.float32) * 0.1
    x = WavCondition(wav, np.array([8000, 0]), sample_rate=[8000, 8000],
                     path=[None, None])
    tok = cond.tokenize(x)
    # the separator path precomputes chroma host-side
    assert isinstance(tok, dict) and "chroma" in tok
    n_frames = 1 + 8000 // (2 ** 9 // 4)
    assert tok["chroma"].shape == (2, n_frames, 12)
    # null row (length 0) gets zero chroma
    assert np.abs(tok["chroma"][1]).max() == 0.0
    assert np.abs(tok["chroma"][0]).max() > 0.0
    variables = cond.init(jax.random.PRNGKey(0), tok)
    embeds, mask = cond.apply(variables, tok)
    assert embeds.shape == (2, n_frames, 16)
    assert np.asarray(mask)[1].max() == 0.0


def test_load_htdemucs_from_env(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    # build the torch mirror from the parity test and save a demucs-style
    # payload ({'klass', 'kwargs', 'state'}, `demucs/states.py`)
    spec = importlib.util.spec_from_file_location(
        "demucs_mirror",
        Path(__file__).parent.parent / "parity" / "test_demucs_parity.py")
    mirror = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mirror)
    tm = mirror.TorchHTDemucs().eval()
    payload = {"klass": "HTDemucs",
               "kwargs": {"sources": list(mirror.SOURCES),
                          "samplerate": mirror.SR,
                          "segment": mirror.SEGMENT},
               "state": tm.state_dict()}
    path = tmp_path / "htdemucs.th"
    torch.save(payload, path)

    from audiocraft_tpu.modules import demucs as demucs_mod
    monkeypatch.setenv("DEMUCS_CHECKPOINT", str(path))
    demucs_mod._SEPARATOR_CACHE.clear()
    sep = demucs_mod.get_stem_separator()
    assert sep is not None
    model, variables = sep
    assert model.sources == mirror.SOURCES
    assert model.samplerate == mirror.SR
    assert model.nfft == mirror.NFFT
    assert model.bottom_channels == mirror.BOTTOM
    out = model.apply(variables,
                      jnp.zeros((1, 2, int(mirror.SR * mirror.SEGMENT))))
    assert out.shape == (1, 4, 2, int(mirror.SR * mirror.SEGMENT))
    demucs_mod._SEPARATOR_CACHE.clear()


def test_no_separator_keeps_wav_tokenize(monkeypatch):
    from audiocraft_tpu.modules import demucs as demucs_mod
    from audiocraft_tpu.modules.conditioners import (ChromaStemConditioner,
                                                     WavCondition)
    monkeypatch.setattr(demucs_mod, "get_stem_separator", lambda: None)
    cond = ChromaStemConditioner(dim=12, output_dim=16, sample_rate=8000,
                                 n_chroma=12, radix2_exp=9, duration=1.0)
    wav = np.zeros((1, 1, 8000), np.float32)
    x = WavCondition(wav, np.array([8000]), sample_rate=[8000], path=[None])
    tok = cond.tokenize(x)
    assert isinstance(tok, WavCondition)
