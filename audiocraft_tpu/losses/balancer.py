"""Gradient-norm loss balancer.

Parity: `audiocraft/losses/balancer.py:14-136`. Functional formulation: the
per-loss partial gradients wrt the model output come from `jax.vjp`/
`jax.grad` pulls, EMA norm state is an explicit pytree, and the balanced
output-gradient is back-propagated through the model with a single vjp pull —
the same math as the reference's `input.backward(out_grad)` without autograd
side effects, so the whole GAN step jits. Under pjit the EMA-norm averaging
across workers (`balancer.py:106-108`) is implicit: norms are computed on
global arrays.
"""
import typing as tp

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class BalancerState:
    """Debiased EMA of per-loss gradient norms (flashy.averager equivalent)."""
    avg: tp.Dict[str, jax.Array]
    count: jax.Array

    @classmethod
    def create(cls, names: tp.Sequence[str]) -> "BalancerState":
        return cls(avg={n: jnp.zeros(()) for n in sorted(names)},
                   count=jnp.zeros(()))


class Balancer:
    """Rescale per-loss gradients so each contributes its configured share of
    the total gradient norm (`balancer.py:14-76`)."""

    def __init__(self, weights: tp.Dict[str, float], balance_grads: bool = True,
                 total_norm: float = 1., ema_decay: float = 0.999,
                 per_batch_item: bool = True, epsilon: float = 1e-12,
                 monitor: bool = False):
        self.weights = weights
        self.per_batch_item = per_batch_item
        self.total_norm = total_norm or 1.
        self.ema_decay = ema_decay or 1.
        self.epsilon = epsilon
        self.monitor = monitor
        self.balance_grads = balance_grads

    def init_state(self) -> BalancerState:
        return BalancerState.create(list(self.weights.keys()))

    def _grad_norm(self, grad: jax.Array) -> jax.Array:
        if self.per_batch_item:
            dims = tuple(range(1, grad.ndim))
            return jnp.mean(jnp.sqrt(jnp.sum(jnp.square(grad), axis=dims)))
        return jnp.sqrt(jnp.sum(jnp.square(grad)))

    def compute_out_grad(self, losses: tp.Dict[str, jax.Array],
                         grads: tp.Dict[str, jax.Array],
                         state: BalancerState
                         ) -> tp.Tuple[jax.Array, jax.Array, BalancerState,
                                       tp.Dict[str, jax.Array]]:
        """Given per-loss values and per-loss gradients wrt the model output,
        return (out_grad, effective_loss, new_state, metrics)
        (`balancer.py:77-136`).
        """
        assert set(losses.keys()) == set(self.weights.keys()), \
            (losses.keys(), self.weights.keys())
        norms = {name: self._grad_norm(g) for name, g in grads.items()}

        # flashy.averager semantics: sum_k = beta*sum_{k-1} + v;
        # total_k = beta*total_{k-1} + 1; avg = sum/total. beta=1 -> plain
        # mean, beta<1 -> debiased EMA.
        beta = self.ema_decay
        count = state.count * beta + 1
        new_avg = {k: state.avg[k] * beta + norms[k] for k in norms}
        avg_norms = {k: new_avg[k] / count for k in new_avg}
        new_state = BalancerState(avg=new_avg, count=count)

        total = sum(avg_norms.values())
        metrics = {}
        if self.monitor:
            for k, v in avg_norms.items():
                metrics[f"ratio_{k}"] = v / total

        total_weights = sum([self.weights[k] for k in avg_norms])
        assert total_weights > 0.
        desired_ratios = {k: w / total_weights for k, w in self.weights.items()}

        out_grad = None
        effective_loss = jnp.zeros(())
        for name, avg_norm in avg_norms.items():
            if self.balance_grads:
                scale = desired_ratios[name] * self.total_norm / (self.epsilon + avg_norm)
            else:
                scale = jnp.asarray(self.weights[name])
            g = grads[name] * scale
            out_grad = g if out_grad is None else out_grad + g
            effective_loss = effective_loss + scale * jax.lax.stop_gradient(losses[name])
        return out_grad, effective_loss, new_state, metrics

    def backward(self, loss_fns: tp.Dict[str, tp.Callable[[jax.Array], jax.Array]],
                 y: jax.Array, state: BalancerState):
        """Convenience: compute each loss and its grad wrt y, then balance.

        Returns (out_grad, effective_loss, losses, new_state, metrics). The
        caller backpropagates `out_grad` through the generator with its own
        vjp pull (see `solvers/compression.py`).
        """
        losses = {}
        grads = {}
        for name, fn in loss_fns.items():
            loss, grad = jax.value_and_grad(fn)(y)
            losses[name] = loss
            grads[name] = grad
        out_grad, effective_loss, new_state, metrics = self.compute_out_grad(
            losses, grads, state)
        return out_grad, effective_loss, losses, new_state, metrics
