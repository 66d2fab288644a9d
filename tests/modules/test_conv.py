"""Conv padding-law tests, incl. numerical parity against torch (CPU).

Mirrors the intent of the reference's `tests/modules/test_conv.py`: shape laws
for causal/non-causal, stride/dilation combos, and exact agreement with torch
Conv1d / ConvTranspose1d so checkpoint porting is bit-faithful.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audiocraft_tpu.modules.conv import (
    StreamableConv1d, StreamableConvTranspose1d, get_extra_padding_for_conv1d,
    pad1d, unpad1d)


def test_pad_unpad_roundtrip():
    x = jnp.arange(24, dtype=jnp.float32).reshape(1, 12, 2)
    y = pad1d(x, (3, 2))
    assert y.shape == (1, 17, 2)
    z = unpad1d(y, (3, 2))
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))


def test_reflect_pad_short_input():
    x = jnp.ones((1, 2, 1), jnp.float32)
    y = pad1d(x, (4, 4), mode="reflect")
    assert y.shape == (1, 10, 1)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("ksize,stride,dilation", [(7, 1, 1), (8, 4, 1), (3, 1, 2), (4, 2, 1)])
def test_streamable_conv_length_law(causal, ksize, stride, dilation):
    T = 57
    conv = StreamableConv1d(2, 4, ksize, stride=stride, dilation=dilation,
                            causal=causal, pad_mode="constant")
    x = jnp.ones((1, T, 2))
    params = conv.init(jax.random.PRNGKey(0), x)
    y = conv.apply(params, x)
    # Streamable padding guarantees ceil(T / stride) output frames.
    assert y.shape[1] == -(-T // stride), y.shape


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("ratio", [2, 5, 8])
def test_conv_transpose_inverts_length(causal, ratio):
    """down(stride=r) then up(stride=r) restores ceil-multiple lengths."""
    T = 40
    down = StreamableConv1d(2, 2, ratio * 2, stride=ratio, causal=causal,
                            pad_mode="constant")
    up = StreamableConvTranspose1d(2, 2, ratio * 2, stride=ratio, causal=causal)
    x = jnp.ones((1, T, 2))
    pd = down.init(jax.random.PRNGKey(0), x)
    h = down.apply(pd, x)
    pu = up.init(jax.random.PRNGKey(1), h)
    y = up.apply(pu, h)
    assert y.shape[1] >= T  # trimmed to >= input, caller trims to exact length


def _torch_manual_seed_conv(cin, cout, k, groups=1):
    torch.manual_seed(0)
    return torch.nn.Conv1d(cin, cout, k, groups=groups)


def test_norm_conv_matches_torch():
    """Same weights -> same outputs as torch Conv1d (valid padding)."""
    cin, cout, k, T = 3, 5, 7, 32
    tconv = _torch_manual_seed_conv(cin, cout, k)
    x = np.random.RandomState(0).randn(2, cin, T).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    from audiocraft_tpu.modules.conv import NormConv1d
    conv = NormConv1d(cin, cout, k)
    # torch weight [Cout, Cin, K] -> ours [K, Cin, Cout]
    w = tconv.weight.detach().numpy().transpose(2, 1, 0)
    b = tconv.bias.detach().numpy()
    params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
    y = conv.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=1e-5)


def test_conv_transpose_matches_torch():
    cin, cout, k, stride, T = 4, 3, 8, 4, 16
    torch.manual_seed(1)
    tconv = torch.nn.ConvTranspose1d(cin, cout, k, stride=stride)
    x = np.random.RandomState(1).randn(2, cin, T).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    from audiocraft_tpu.modules.conv import NormConvTranspose1d
    conv = NormConvTranspose1d(cin, cout, k, stride=stride)
    # torch weight [Cin, Cout, K] -> ours [K, Cin, Cout]
    w = tconv.weight.detach().numpy().transpose(2, 0, 1)
    b = tconv.bias.detach().numpy()
    params = {"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
    y = conv.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=1e-5)


def test_weight_norm_conv_matches_torch():
    cin, cout, k, T = 3, 6, 5, 20
    torch.manual_seed(2)
    tconv = torch.nn.utils.weight_norm(torch.nn.Conv1d(cin, cout, k))
    x = np.random.RandomState(2).randn(1, cin, T).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    from audiocraft_tpu.modules.conv import NormConv1d
    conv = NormConv1d(cin, cout, k, norm="weight_norm")
    sd = {k_: v.detach().numpy() for k_, v in tconv.state_dict().items()}
    v = sd["weight_v"].transpose(2, 1, 0)   # [K, Cin, Cout]
    g = sd["weight_g"].reshape(-1)          # [Cout]
    b = sd["bias"]
    params = {"params": {"kernel_v": jnp.asarray(v), "kernel_g": jnp.asarray(g),
                         "bias": jnp.asarray(b)}}
    y = conv.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=1e-5)


def test_extra_padding_math():
    # kernel 4, stride 2, padding_total 2 on length 7 -> 1 extra pad
    assert get_extra_padding_for_conv1d(7, 4, 2, 2) == 1
    assert get_extra_padding_for_conv1d(8, 4, 2, 2) == 0
