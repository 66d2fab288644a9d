"""End-to-end debug-size MusicGen tests (cf. reference
`tests/models/test_musicgen.py:13-65`)."""
import jax.numpy as jnp
import numpy as np
import pytest

from audiocraft_tpu.models import MusicGen

HOP = 1280  # debug codec: 32000 / 25


@pytest.fixture(scope="module")
def mg():
    mg = MusicGen.get_pretrained("debug")
    mg.set_generation_params(duration=0.5, extend_stride=0.25)
    return mg


def test_base(mg):
    assert mg.frame_rate == 25
    assert mg.sample_rate == 32000
    assert mg.audio_channels == 1


def test_generate_unconditional(mg):
    wav = mg.generate_unconditional(2)
    n_tok = int(0.5 * 25)
    assert list(wav.shape) == [2, 1, n_tok * HOP]
    assert np.isfinite(np.asarray(wav)).all()


def test_generate_text(mg):
    wav, tokens = mg.generate(["90s rock song with loud guitars"],
                              return_tokens=True)
    n_tok = int(0.5 * 25)
    assert tokens.shape == (1, 4, n_tok)
    assert list(wav.shape) == [1, 1, n_tok * HOP]
    assert (np.asarray(tokens) >= 0).all()
    assert (np.asarray(tokens) < 400).all()


def test_generate_continuation(mg):
    prompt = np.random.randn(1, 1, 6400).astype(np.float32) * 0.1
    wav, tokens = mg.generate_continuation(prompt, 32000,
                                           descriptions=["calm piano"],
                                           return_tokens=True)
    n_tok = int(0.5 * 25)
    assert tokens.shape == (1, 4, n_tok)
    assert list(wav.shape) == [1, 1, n_tok * HOP]
    # the prompt tokens must be retained verbatim in the output
    from audiocraft_tpu.models.musicgen import MusicGen as MG
    prompt_tokens, _ = mg.compression_model.encode(
        mg.compression_variables, jnp.asarray(prompt))
    np.testing.assert_array_equal(
        np.asarray(tokens[..., :prompt_tokens.shape[-1]]),
        np.asarray(prompt_tokens))


def test_generate_long_window():
    """duration > max_duration triggers the sliding re-prompt window."""
    mg2 = MusicGen.get_pretrained("debug")
    mg2.max_duration = 0.6
    mg2.set_generation_params(duration=1.2, extend_stride=0.3)
    wav, tokens = mg2.generate(["techno"], return_tokens=True)
    assert tokens.shape[-1] >= int(1.2 * 25)
    assert wav.shape[2] == tokens.shape[-1] * HOP


def test_generate_stereo():
    """Interleaved-stereo preset: 2-channel audio from 2x-n_q codes
    (cf. reference `test_musicgen.py` stereo cases)."""
    mg = MusicGen.get_pretrained("debug-stereo")
    mg.set_generation_params(duration=0.25, top_k=10)
    assert mg.audio_channels == 2
    assert mg.compression_model.num_codebooks == 8
    wav, tokens = mg.generate(["stereo"], return_tokens=True)
    n_tok = int(0.25 * 25)
    assert tokens.shape == (1, 8, n_tok)
    assert list(wav.shape) == [1, 2, n_tok * HOP]
    assert np.isfinite(np.asarray(wav)).all()


def test_generate_style_and_set_params():
    """MusicGen-Style preset: style-conditioned generation + runtime
    bottleneck knobs (reference `musicgen.py:134-153`)."""
    mg = MusicGen.get_pretrained("debug-style")
    mg.set_generation_params(duration=0.25, top_k=10)
    ref = np.random.RandomState(0).randn(1, 1, 16000).astype(np.float32)
    wav = np.asarray(mg.generate_with_chroma(["styled"], ref, 32000))
    assert wav.shape[0] == 1 and np.isfinite(wav).all()
    mg.set_style_conditioner_params(eval_q=1, excerpt_length=0.03,
                                    ds_factor=3, encodec_n_q=2)
    wav2 = np.asarray(mg.generate_with_chroma(["styled"], ref, 32000))
    assert wav2.shape == wav.shape and np.isfinite(wav2).all()
    # text-only (null style) still generates
    wav3 = np.asarray(mg.generate(["plain"]))
    assert wav3.shape == wav.shape


def test_determinism_with_seed(mg):
    mg.set_seed(42)
    w1 = np.asarray(mg.generate(["jazz"]))
    mg.set_seed(42)
    w2 = np.asarray(mg.generate(["jazz"]))
    np.testing.assert_array_equal(w1, w2)
