"""InterleaveStereoCompressionModel code-layout round-trip tests
(ref audiocraft/models/encodec.py:397-506)."""
import jax.numpy as jnp
import numpy as np
import pytest

from audiocraft_tpu.models.builders import get_debug_compression_model
from audiocraft_tpu.models.encodec import InterleaveStereoCompressionModel


@pytest.fixture(scope="module")
def codec():
    model, variables = get_debug_compression_model(32000)
    return model, variables


@pytest.mark.parametrize("per_timestep", [False, True])
def test_interleave_roundtrip_codes(codec, per_timestep):
    """get_left_right_codes(encode(x)) must exactly recover each channel's
    mono codes — interleaving must not scramble channels."""
    model, variables = codec
    stereo = InterleaveStereoCompressionModel(model=model,
                                              per_timestep=per_timestep)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 2, 32000).astype(np.float32) * 0.1)
    codes, _ = stereo.encode(variables, x)
    left_ref, _ = model.encode(variables, x[:, 0:1])
    right_ref, _ = model.encode(variables, x[:, 1:2])
    left, right = stereo.get_left_right_codes(codes)
    np.testing.assert_array_equal(np.asarray(left), np.asarray(left_ref))
    np.testing.assert_array_equal(np.asarray(right), np.asarray(right_ref))


@pytest.mark.parametrize("per_timestep", [False, True])
def test_interleave_decode_channels_unscrambled(codec, per_timestep):
    """decode(encode(x)) must keep channel identity: each output channel
    equals the mono round-trip of the corresponding input channel."""
    model, variables = codec
    stereo = InterleaveStereoCompressionModel(model=model,
                                              per_timestep=per_timestep)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 2, 32000).astype(np.float32) * 0.1)
    codes, scales = stereo.encode(variables, x)
    out = stereo.decode(variables, codes, scales)
    mono_l = model.decode(variables, model.encode(variables, x[:, 0:1])[0])
    mono_r = model.decode(variables, model.encode(variables, x[:, 1:2])[0])
    np.testing.assert_allclose(np.asarray(out[:, 0]),
                               np.asarray(mono_l[:, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 1]),
                               np.asarray(mono_r[:, 0]), atol=1e-5)


def test_num_codebooks_semantics(codec):
    """per_timestep keeps K; codebook-interleave doubles it
    (ref encodec.py:424-432)."""
    model, variables = codec
    k = model.num_codebooks
    assert InterleaveStereoCompressionModel(
        model=model, per_timestep=True).num_codebooks == k
    assert InterleaveStereoCompressionModel(
        model=model, per_timestep=False).num_codebooks == 2 * k
