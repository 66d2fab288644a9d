"""LSTM parity with torch nn.LSTM (gate order i,f,g,o) + skip behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from audiocraft_tpu.modules.lstm import LSTMLayer, StreamableLSTM


def test_lstm_layer_matches_torch():
    B, T, C, H = 2, 11, 6, 6
    torch.manual_seed(0)
    tlstm = torch.nn.LSTM(C, H, num_layers=1, batch_first=True)
    x = np.random.RandomState(0).randn(B, T, C).astype(np.float32)
    with torch.no_grad():
        ref, _ = tlstm(torch.from_numpy(x))

    layer = LSTMLayer(H)
    sd = {k: v.detach().numpy() for k, v in tlstm.state_dict().items()}
    params = {"params": {
        "w_ih": jnp.asarray(sd["weight_ih_l0"].T),
        "w_hh": jnp.asarray(sd["weight_hh_l0"].T),
        "b_ih": jnp.asarray(sd["bias_ih_l0"]),
        "b_hh": jnp.asarray(sd["bias_hh_l0"]),
    }}
    y, _ = layer.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), atol=1e-4)


def test_streamable_lstm_skip():
    B, T, C = 1, 5, 4
    m = StreamableLSTM(C, num_layers=2)
    x = jnp.asarray(np.random.RandomState(1).randn(B, T, C).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (B, T, C)
    # skip connection: zero lstm output at init is unlikely; just check not equal
    assert not np.allclose(np.asarray(y), np.asarray(x))
