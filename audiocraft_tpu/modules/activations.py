"""Activation functions incl. the GLU family.

Parity: `audiocraft/modules/activations.py:13-96`.
"""
import typing as tp

import jax
import jax.numpy as jnp

ActivationFn = tp.Callable[[jax.Array], jax.Array]


def _elu(alpha: float = 1.0) -> ActivationFn:
    return lambda x: jax.nn.elu(x, alpha=alpha)


_ACTIVATIONS: tp.Dict[str, ActivationFn] = {
    "relu": jax.nn.relu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "elu": jax.nn.elu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "leaky_relu": jax.nn.leaky_relu,
    "identity": lambda x: x,
}


def glu(kind: str) -> ActivationFn:
    """Gated linear units: split last dim in two, gate one half with the other.

    ``kind`` in {"reglu", "geglu", "swiglu", "glu"}
    (`activations.py:13-66`).
    """
    gate = {"reglu": jax.nn.relu, "geglu": jax.nn.gelu,
            "swiglu": jax.nn.silu, "glu": jax.nn.sigmoid}[kind]

    def fn(x: jax.Array) -> jax.Array:
        a, b = jnp.split(x, 2, axis=-1)
        return a * gate(b)

    return fn


def get_activation_fn(activation: tp.Union[str, ActivationFn],
                      **params) -> ActivationFn:
    """Map a name to an activation callable (`activations.py:78-96`)."""
    if callable(activation):
        return activation
    name = activation.lower()
    if name in ("reglu", "geglu", "swiglu", "glu"):
        return glu(name)
    if name == "elu" and params:
        return _elu(**params)
    if name in _ACTIVATIONS:
        return _ACTIVATIONS[name]
    raise ValueError(f"Unknown activation: {activation!r}")
