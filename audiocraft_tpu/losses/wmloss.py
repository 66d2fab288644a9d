"""Watermark losses: localized detection + multi-bit message decoding.

Parity: `audiocraft/losses/wmloss.py:13-130`. The reference's
`masked_select` (dynamic shapes) becomes mask-weighted means — identical
values, static shapes.
"""
import typing as tp

import jax
import jax.numpy as jnp


class WMDetectionLoss:
    """Sample-level detection NLL (`wmloss.py:13-53`)."""

    def __init__(self, p_weight: float = 1.0, n_weight: float = 1.0) -> None:
        self.p_weight = p_weight
        self.n_weight = n_weight

    def _nll(self, probs: jax.Array, target_ones: jax.Array) -> jax.Array:
        """NLLLoss on log-softmaxed 2-class probs [B, 2, T] with integer
        targets [B, T]."""
        logp = jnp.log(jnp.maximum(probs, 1e-12))
        picked = jnp.take_along_axis(logp, target_ones[:, None, :], axis=1)[:, 0]
        return -jnp.mean(picked)

    def __call__(self, positive: jax.Array, negative: jax.Array,
                 mask: jax.Array, message=None) -> jax.Array:
        positive = positive[:, :2, :]
        negative = negative[:, :2, :]
        ones = jnp.ones_like(positive[:, 0, :], dtype=jnp.int32)
        zeros = jnp.zeros_like(ones)
        all_ones = jnp.all(mask == 1)

        def masked_case(_):
            # mask flips the target from 1 to 0 where the watermark is masked
            pos_classes = ones * mask[:, 0, :].astype(jnp.int32)
            return self.p_weight * self._nll(positive, pos_classes)

        def full_case(_):
            loss_p = self.p_weight * self._nll(positive, ones)
            loss_n = self.n_weight * self._nll(negative, zeros)
            return loss_p + loss_n

        return jax.lax.cond(all_ones, full_case, masked_case, None)


class WMMbLoss:
    """Message decoding loss (`wmloss.py:55-130`)."""

    def __init__(self, temperature: float, loss_type: str = "bce") -> None:
        assert loss_type in ("bce", "mse")
        self.loss_type = loss_type
        self.temperature = temperature

    def __call__(self, positive: jax.Array, negative: jax.Array,
                 mask: jax.Array, message: jax.Array) -> jax.Array:
        if message.shape[0] == 0:
            return jnp.zeros(())
        positive = positive[:, 2:, :]  # [B, nbits, T]
        assert positive.shape[-2] == message.shape[1], \
            "in decoding loss: enc and dec don't share nbits"
        msg = jnp.broadcast_to(message[..., None].astype(jnp.float32),
                               positive.shape)
        logits = positive / self.temperature
        if self.loss_type == "bce":
            per = (jnp.maximum(logits, 0) - logits * msg
                   + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        else:
            per = jnp.square(logits - msg)
        # mask-weighted mean over watermarked positions only
        w = jnp.broadcast_to(mask.astype(jnp.float32), positive.shape)
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)
