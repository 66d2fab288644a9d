"""EMA over parameter pytrees.

Parity: `audiocraft/optim/ema.py:40-85` (ModuleDictEMA — unbiased EMA over
named tensors incl. buffers). Functional: the EMA shadow is a pytree matching
the params; non-float leaves are copied.
"""
import typing as tp

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EMAState:
    shadow: tp.Any
    count: jax.Array


def ema_init(params) -> EMAState:
    return EMAState(shadow=jax.tree.map(jnp.zeros_like, params),
                    count=jnp.zeros(()))


def ema_update(state: EMAState, params, decay: float = 0.999,
               unbias: bool = True) -> EMAState:
    """One EMA step (`ema.py:60-80`)."""
    if unbias:
        count = state.count + 1

        def upd(s, p):
            if not jnp.issubdtype(p.dtype, jnp.floating):
                return p
            return s * decay + p.astype(s.dtype) * (1 - decay)
        shadow = jax.tree.map(upd, state.shadow, params)
        return EMAState(shadow=shadow, count=count)
    shadow = jax.tree.map(
        lambda s, p: p if not jnp.issubdtype(p.dtype, jnp.floating)
        else s * decay + p.astype(s.dtype) * (1 - decay),
        state.shadow, params)
    return EMAState(shadow=shadow, count=state.count + 1)


def ema_params(state: EMAState, decay: float = 0.999,
               unbias: bool = True):
    """Debiased EMA parameters for evaluation swap
    (`solvers/base.py:197-223`)."""
    if not unbias:
        return state.shadow
    w = 1 - decay ** jnp.maximum(state.count, 1)

    def get(s):
        if not jnp.issubdtype(s.dtype, jnp.floating):
            return s
        return s / w.astype(s.dtype)
    return jax.tree.map(get, state.shadow)
