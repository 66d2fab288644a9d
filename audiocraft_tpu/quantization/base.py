"""Quantizer base types.

Parity: `audiocraft/quantization/base.py:19-99`. Functional design: quantizers
are plain Python objects holding *static* config; all mutable state (EMA
codebooks) lives in explicit pytrees passed in/out of pure functions, so the
whole training step jits and shards under pjit with no side effects.
"""
import dataclasses
import typing as tp

import jax
from flax import struct


@struct.dataclass
class QuantizedResult:
    """Result of a quantizer forward (`base.py:19-24`).

    x: dequantized representation ``[B, T, D]`` (channels-last).
    codes: integer codes ``[B, K, T]``.
    bandwidth: kb/s used, per batch item.
    penalty: optional scalar loss term (commitment etc.).
    metrics: dict of logging scalars.
    """
    x: jax.Array
    codes: jax.Array
    bandwidth: jax.Array
    penalty: tp.Optional[jax.Array] = None
    metrics: tp.Dict[str, jax.Array] = struct.field(default_factory=dict)


@dataclasses.dataclass
class BaseQuantizer:
    """Static-config base for quantizers (`base.py:27-60`).

    Subclasses implement pure ``forward(state, x, frame_rate, ...)``,
    ``encode(state, x)``, ``decode(state, codes)``.
    """

    @property
    def total_codebooks(self) -> int:
        raise NotImplementedError()

    @property
    def num_codebooks(self) -> int:
        raise NotImplementedError()

    def set_num_codebooks(self, n: int):
        raise NotImplementedError()


@dataclasses.dataclass
class DummyQuantizer(BaseQuantizer):
    """Passthrough quantizer (`base.py:63-99`). State is an empty dict."""

    def init(self, rng=None):
        return {}

    def forward(self, state, x: jax.Array, frame_rate: int, **_):
        import jax.numpy as jnp
        q = x[:, None]
        bw = jnp.asarray(q.size * 32 * frame_rate / 1000 / len(x), x.dtype)
        return QuantizedResult(x, q, bw), state

    def encode(self, state, x: jax.Array) -> jax.Array:
        return x[:, None]

    def decode(self, state, codes: jax.Array) -> jax.Array:
        return codes[:, 0]

    @property
    def total_codebooks(self) -> int:
        return 1

    @property
    def num_codebooks(self) -> int:
        return 1

    def set_num_codebooks(self, n: int):
        raise AttributeError("Cannot override the number of codebooks for the dummy quantizer")
