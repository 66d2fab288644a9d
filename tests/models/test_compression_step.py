"""EnCodec GAN training step: one jitted update on a tiny model."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiocraft_tpu.losses import Balancer
from audiocraft_tpu.models.builders import get_debug_compression_model
from audiocraft_tpu.solvers.compression import (
    CompressionTrainState, get_adversarial_losses, get_aux_losses,
    make_compression_train_step, make_compression_valid_step)


def test_compression_gan_step():
    model, variables = get_debug_compression_model(sample_rate=16000)
    sr = 16000
    cfg = {
        "adversarial": {"adversaries": ["msstftd"], "adv_loss": "hinge",
                        "feat_loss": "l1", "every": 1},
        "msstftd": {"filters": 2, "n_ffts": [128, 64], "hop_lengths": [32, 16],
                    "win_lengths": [128, 64]},
        "mel": {"n_fft": 256, "hop_length": 64, "win_length": 256, "n_mels": 16},
        "msspec": {"range_start": 6, "range_end": 8, "n_mels": 8,
                   "normalized": True, "alphas": False},
        "sisnr": {"segment": 0.05},
        "mrstft": {},
    }
    aux = get_aux_losses(cfg, sr)
    advs = get_adversarial_losses(cfg, sr)
    weights = {"adv": 4.0, "feat": 4.0, "l1": 0.1, "msspec": 2.0,
               "mel": 0.0, "sisnr": 0.0}
    balancer = Balancer({}, monitor=True)
    optimizer = optax.adam(3e-4, b1=0.5, b2=0.9)

    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 1600).astype(np.float32) * 0.1)
    adv_states = {n: a.init(jax.random.PRNGKey(1), x) for n, a in advs.items()}
    # the factory fills in the balancer weights; init its state afterwards
    step = make_compression_train_step(model, advs, aux, weights, balancer,
                                       optimizer, disc_every=1, max_norm=1.0)
    state = CompressionTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_vars=variables,
        gen_opt_state=optimizer.init(variables["params"]),
        adv_states=adv_states,
        balancer_state=balancer.init_state())
    # state is donated to the step; snapshot a param before calling
    p0 = np.asarray(jax.tree_util.tree_leaves(state.gen_vars["params"])[0])
    new_state, metrics = step(state, x, jax.random.PRNGKey(2))
    assert int(new_state.step) == 1
    for key in ("bandwidth", "penalty", "g_loss", "d_loss", "l1", "msspec",
                "adv_msstftd", "feat_msstftd", "mel", "sisnr"):
        assert key in metrics, key
        assert np.isfinite(float(metrics[key])), key
    # generator params actually moved
    p1 = jax.tree_util.tree_leaves(new_state.gen_vars["params"])[0]
    assert not np.allclose(p0, np.asarray(p1))
    # second step runs from the new state (donated buffers OK)
    state2, m2 = step(new_state, x, jax.random.PRNGKey(3))
    assert int(state2.step) == 2

    valid = make_compression_valid_step(model, aux, advs)
    vm = valid(state2.gen_vars, state2.adv_states, x)
    assert np.isfinite(float(vm["l1"]))
