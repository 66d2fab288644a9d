"""Adversarial losses: generator + discriminator objectives.

Parity: `audiocraft/adversarial/losses.py:26-228`. Functional design: the
`AdversarialLoss` holds the adversary module + optimizer statically; the
discriminator step `train_adv(disc_state, fake, real)` and the generator-side
`forward(disc_params, fake, real)` are pure functions, so both jit and shard
under pjit (the reference's `eager_sync_model` is implicit).
"""
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

ADVERSARIAL_LOSSES = frozenset(["mse", "hinge", "hinge2"])
AdvLossType = tp.Callable[[jax.Array], jax.Array]


# ----------------------------------------------------------------- criteria

def mse_real_loss(x: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(x - 1.0))


def mse_fake_loss(x: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(x))


def hinge_real_loss(x: jax.Array) -> jax.Array:
    return -jnp.mean(jnp.minimum(x - 1.0, 0.0))


def hinge_fake_loss(x: jax.Array) -> jax.Array:
    return -jnp.mean(jnp.minimum(-x - 1.0, 0.0))


def mse_loss(x: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(x - 1.0))


def hinge_loss(x: jax.Array) -> jax.Array:
    return -jnp.mean(x)


def hinge2_loss(x: jax.Array) -> jax.Array:
    return -jnp.mean(jnp.minimum(x - 1.0, 0.0))


def get_adv_criterion(loss_type: str) -> AdvLossType:
    assert loss_type in ADVERSARIAL_LOSSES
    return {"mse": mse_loss, "hinge": hinge_loss, "hinge2": hinge2_loss}[loss_type]


def get_fake_criterion(loss_type: str) -> AdvLossType:
    assert loss_type in ADVERSARIAL_LOSSES
    return {"mse": mse_fake_loss, "hinge": hinge_fake_loss,
            "hinge2": hinge_fake_loss}[loss_type]


def get_real_criterion(loss_type: str) -> AdvLossType:
    assert loss_type in ADVERSARIAL_LOSSES
    return {"mse": mse_real_loss, "hinge": hinge_real_loss,
            "hinge2": hinge_real_loss}[loss_type]


class FeatureMatchingLoss:
    """L1 feature matching across discriminator fmaps
    (`losses.py:201-228`)."""

    def __init__(self, normalize: bool = True):
        self.normalize = normalize

    def __call__(self, fmap_fake: tp.List[jax.Array],
                 fmap_real: tp.List[jax.Array]) -> jax.Array:
        assert len(fmap_fake) == len(fmap_real) and len(fmap_fake) > 0
        feat_loss = jnp.zeros(())
        for feat_fake, feat_real in zip(fmap_fake, fmap_real):
            assert feat_fake.shape == feat_real.shape
            feat_loss = feat_loss + jnp.mean(jnp.abs(feat_fake - feat_real))
        if self.normalize:
            feat_loss = feat_loss / len(fmap_fake)
        return feat_loss


@struct.dataclass
class AdversaryState:
    """Discriminator params + its optimizer state."""
    params: tp.Any
    opt_state: tp.Any


class AdversarialLoss:
    """Generator/discriminator loss pair with the adversary optimizer inside
    (`losses.py:26-135`)."""

    def __init__(self, adversary: nn.Module,
                 optimizer: optax.GradientTransformation,
                 loss: AdvLossType, loss_real: AdvLossType,
                 loss_fake: AdvLossType,
                 loss_feat: tp.Optional[FeatureMatchingLoss] = None,
                 normalize: bool = True):
        self.adversary = adversary
        self.optimizer = optimizer
        self.loss = loss
        self.loss_real = loss_real
        self.loss_fake = loss_fake
        self.loss_feat = loss_feat
        self.normalize = normalize

    def init(self, rng: jax.Array, example: jax.Array) -> AdversaryState:
        params = self.adversary.init(rng, example)
        return AdversaryState(params=params, opt_state=self.optimizer.init(params))

    def get_adversary_pred(self, params, x: jax.Array):
        """Run the adversary; returns (logits list, fmaps list)
        (`losses.py:63-88`)."""
        return self.adversary.apply(params, x)

    def train_adv(self, state: AdversaryState, fake: jax.Array,
                  real: jax.Array) -> tp.Tuple[AdversaryState, jax.Array]:
        """One discriminator update (`losses.py:89-113`). Pure; jit me."""
        fake = jax.lax.stop_gradient(fake)
        real = jax.lax.stop_gradient(real)

        def disc_loss(params):
            all_logits_fake, _ = self.get_adversary_pred(params, fake)
            all_logits_real, _ = self.get_adversary_pred(params, real)
            loss = jnp.zeros(())
            for lf, lr in zip(all_logits_fake, all_logits_real):
                loss = loss + self.loss_fake(lf) + self.loss_real(lr)
            if self.normalize:
                loss = loss / len(all_logits_fake)
            return loss

        loss, grads = jax.value_and_grad(disc_loss)(state.params)
        updates, new_opt = self.optimizer.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)
        return AdversaryState(params=new_params, opt_state=new_opt), loss

    def forward(self, disc_params, fake: jax.Array, real: jax.Array
                ) -> tp.Tuple[jax.Array, jax.Array]:
        """Generator-side losses: adversarial + feature matching
        (`losses.py:115-135`). Gradients flow into `fake` only."""
        all_logits_fake, all_fmap_fake = self.get_adversary_pred(disc_params, fake)
        _, all_fmap_real = self.get_adversary_pred(
            disc_params, jax.lax.stop_gradient(real))
        n = len(all_logits_fake)
        adv = jnp.zeros(())
        feat = jnp.zeros(())
        for logit_fake in all_logits_fake:
            adv = adv + self.loss(logit_fake)
        if self.loss_feat:
            for fmap_fake, fmap_real in zip(all_fmap_fake, all_fmap_real):
                feat = feat + self.loss_feat(fmap_fake, fmap_real)
        if self.normalize:
            adv = adv / n
            feat = feat / n
        return adv, feat
