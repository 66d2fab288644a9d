"""SEANet shape laws: encoder downsamples by prod(ratios), decoder mirrors."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiocraft_tpu.modules.seanet import SEANetDecoder, SEANetEncoder


@pytest.mark.parametrize("causal", [False, True])
def test_seanet_roundtrip_shapes(causal):
    ratios = (4, 2)
    hop = int(np.prod(ratios))
    enc = SEANetEncoder(channels=1, dimension=16, n_filters=4, n_residual_layers=1,
                        ratios=ratios, lstm=1, causal=causal, pad_mode="constant",
                        norm="weight_norm")
    dec = SEANetDecoder(channels=1, dimension=16, n_filters=4, n_residual_layers=1,
                        ratios=ratios, lstm=1, causal=causal, pad_mode="constant",
                        norm="weight_norm")
    T = 57
    x = jnp.asarray(np.random.RandomState(0).randn(2, T, 1).astype(np.float32))
    pe = enc.init(jax.random.PRNGKey(0), x)
    z = enc.apply(pe, x)
    assert z.shape == (2, -(-T // hop), 16)
    pd = dec.init(jax.random.PRNGKey(1), z)
    y = dec.apply(pd, z)
    assert y.shape[1] >= T and y.shape[2] == 1


def test_seanet_disable_norm_outer_blocks():
    enc = SEANetEncoder(channels=1, dimension=8, n_filters=2, n_residual_layers=1,
                        ratios=(2,), norm="time_group_norm",
                        disable_norm_outer_blocks=3, pad_mode="constant")
    x = jnp.ones((1, 16, 1))
    params = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(params, x)
    assert y.shape == (1, 8, 8)
