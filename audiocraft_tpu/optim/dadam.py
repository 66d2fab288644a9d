"""D-Adaptation Adam: learning-rate-free Adam (arXiv 2301.07733).

Parity: `audiocraft/optim/dadam.py:26-248` (used by the watermark solver's
"all" optimizer). Implemented as an optax GradientTransformation with the
global d-estimate carried in the state; all-reduce of the numerator terms is
implicit under pjit (global arrays).
"""
import typing as tp

import chex
import jax
import jax.numpy as jnp
import optax


class DAdaptAdamState(tp.NamedTuple):
    step: chex.Array
    exp_avg: chex.Array       # pytree: m
    exp_avg_sq: chex.Array    # pytree: v
    s: chex.Array             # pytree: weighted grad sum
    d: chex.Array             # scalar d-estimate
    gsq_weighted: chex.Array  # scalar


def dadapt_adam(learning_rate: float = 1.0, betas=(0.9, 0.999),
                eps: float = 1e-8, weight_decay: float = 0.0,
                d0: float = 1e-6, growth_rate: float = float("inf")
                ) -> optax.GradientTransformation:
    """LR-free Adam (`dadam.py:26-100`). `learning_rate` is a multiplier on
    the adapted step size (usually 1.0)."""
    beta1, beta2 = betas

    def init_fn(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return DAdaptAdamState(step=jnp.zeros((), jnp.int32),
                               exp_avg=zeros(), exp_avg_sq=zeros(), s=zeros(),
                               d=jnp.asarray(d0, jnp.float32),
                               gsq_weighted=jnp.zeros(()))

    def update_fn(grads, state, params=None):
        d = state.d
        dlr = d * learning_rate
        sqrt_beta2 = beta2 ** 0.5

        # gsq accumulation (`dadam.py:170-190`)
        g_sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                   for g in jax.tree.leaves(grads))
        gsq_weighted = (state.gsq_weighted * beta2
                        + g_sq * (dlr ** 2) * (1 - beta2))

        exp_avg = jax.tree.map(
            lambda m, g: m * beta1 + g.astype(m.dtype) * dlr * (1 - beta1),
            state.exp_avg, grads)
        exp_avg_sq = jax.tree.map(
            lambda v, g: v * beta2 + jnp.square(g.astype(v.dtype)) * (1 - beta2),
            state.exp_avg_sq, grads)
        s = jax.tree.map(
            lambda s_, g: s_ * sqrt_beta2 + g.astype(s_.dtype) * dlr * (1 - sqrt_beta2),
            state.s, grads)

        # d-estimate (`dadam.py:192-210`)
        sk_l1 = sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(s))
        sk_sq_denom = sum(
            jnp.sum(jnp.square(x) / (jnp.sqrt(v) + eps))
            for x, v in zip(jax.tree.leaves(s), jax.tree.leaves(exp_avg_sq)))
        d_hat = (sk_sq_denom / (1 - beta2) - gsq_weighted / (1 - beta2)) / \
            jnp.maximum(sk_l1, 1e-12)
        new_d = jnp.where(sk_l1 > 0,
                          jnp.minimum(jnp.maximum(d, d_hat), d * growth_rate),
                          d)

        updates = jax.tree.map(
            lambda m, v: -m / (jnp.sqrt(v) + eps),
            exp_avg, exp_avg_sq)
        if weight_decay > 0 and params is not None:
            updates = jax.tree.map(
                lambda u, p: u - weight_decay * dlr * p.astype(u.dtype),
                updates, params)

        return updates, DAdaptAdamState(
            step=state.step + 1, exp_avg=exp_avg, exp_avg_sq=exp_avg_sq, s=s,
            d=new_d, gsq_weighted=gsq_weighted)

    return optax.GradientTransformation(init_fn, update_fn)
