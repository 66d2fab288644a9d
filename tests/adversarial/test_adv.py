"""Adversarial: discriminator shapes + GAN step smoke test."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from audiocraft_tpu.adversarial import (AdversarialLoss, FeatureMatchingLoss,
                                        MultiScaleSTFTDiscriminator,
                                        get_adv_criterion, get_fake_criterion,
                                        get_real_criterion)


def _tiny_disc():
    return MultiScaleSTFTDiscriminator(filters=2, n_ffts=(128, 64),
                                       hop_lengths=(32, 16),
                                       win_lengths=(128, 64))


def test_msstftd_output_structure():
    disc = _tiny_disc()
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 1600).astype(np.float32))
    params = disc.init(jax.random.PRNGKey(0), x)
    logits, fmaps = disc.apply(params, x)
    assert len(logits) == 2 and len(fmaps) == 2
    assert all(len(f) == 5 for f in fmaps)  # 1 + 3 dilated + 1
    assert all(l.ndim == 4 for l in logits)


def test_adversarial_loss_train_and_forward():
    disc = _tiny_disc()
    adv = AdversarialLoss(disc, optax.adam(1e-3),
                          loss=get_adv_criterion("hinge"),
                          loss_real=get_real_criterion("hinge"),
                          loss_fake=get_fake_criterion("hinge"),
                          loss_feat=FeatureMatchingLoss())
    rs = np.random.RandomState(0)
    real = jnp.asarray(rs.randn(2, 1, 1600).astype(np.float32))
    fake = jnp.asarray(rs.randn(2, 1, 1600).astype(np.float32))
    state = adv.init(jax.random.PRNGKey(0), real)
    new_state, d_loss = adv.train_adv(state, fake, real)
    assert np.isfinite(float(d_loss))
    # params changed
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))

    adv_loss, feat_loss = adv.forward(new_state.params, fake, real)
    assert np.isfinite(float(adv_loss)) and float(feat_loss) > 0
    # generator gradient flows through fake
    g = jax.grad(lambda f: adv.forward(new_state.params, f, real)[0])(fake)
    assert float(jnp.abs(g).sum()) > 0
