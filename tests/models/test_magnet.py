"""MAGNeT debug-size end-to-end tests (cf. reference
`tests/models/test_magnet.py`)."""
import numpy as np
import pytest

from audiocraft_tpu.models.magnet import MAGNeT


@pytest.fixture(scope="module")
def magnet():
    m = MAGNeT.get_pretrained("debug")
    m.set_generation_params(duration=0.48, decoding_steps=[3, 2, 2, 2])
    return m


def test_magnet_generate(magnet):
    wav, tokens = magnet.generate(["electro dance"], return_tokens=True)
    n_tok = int(0.48 * 25)
    assert tokens.shape == (1, 4, n_tok)
    assert (np.asarray(tokens) >= 0).all()
    assert (np.asarray(tokens) < 400).all()
    assert wav.shape == (1, 1, n_tok * 1280)
    assert np.isfinite(np.asarray(wav)).all()


def test_magnet_stride1(magnet):
    magnet.set_generation_params(duration=0.48, decoding_steps=[3, 2, 2, 2],
                                 span_arrangement="stride1")
    wav, tokens = magnet.generate(["rock"], return_tokens=True)
    assert (np.asarray(tokens) < 400).all()
    magnet.set_generation_params(duration=0.48, decoding_steps=[3, 2, 2, 2])


def test_stage_attn_bias():
    from audiocraft_tpu.models.builders import get_debug_magnet_lm_model
    model, _ = get_debug_magnet_lm_model()
    assert model.stage_attn_bias(0, 12) is None
    bias = model.stage_attn_bias(1, 12)
    assert bias.shape == (12, 12)
    # |delta| <= 5 context window
    assert bias[0, 5] == 0.0 and bias[0, 6] < -1e30


def test_least_probable_span_masking():
    from audiocraft_tpu.models.lm_magnet import least_probable_span_masking
    scores = np.array([0., 0., 10., 10., 10., 0., 0., 0., 0., 0.])
    mask = least_probable_span_masking(scores, 4, span_len=3)
    assert mask.sum() >= 3
    assert mask[2:5].all()  # the high-score span is masked
