"""Rotary positional embedding (RoPE) + xPos decay.

Parity: `audiocraft/modules/rope.py:13-125`. Pure functions — the rotation
table is recomputed per call from static position offsets; XLA constant-folds
it for fixed shapes, so there is no mutable cache to carry around.

The reference rotates keys over the *whole* past each decode step
(`rope.py:106-125`); here keys are rotated once at cache-write time — the
per-position rotation is fixed, so the results are identical while doing
O(1) work per step.
"""
import dataclasses
import typing as tp

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RopeConfig:
    """Static RoPE parameters (`rope.py:50-77`)."""
    dim: int                      # head dim (twice the number of frequencies)
    max_period: float = 10000.0
    xpos: bool = False
    scale: float = 1.0
    # xPos decay parameters (`rope.py:13-47`)
    smoothing: float = 0.4
    base_scale: int = 512


def _rotation(cfg: RopeConfig, positions: jax.Array) -> tp.Tuple[jax.Array, jax.Array]:
    """cos/sin tables [T, dim/2] for given integer positions [T]."""
    half = cfg.dim // 2
    adim = jnp.arange(half, dtype=jnp.float32)
    frequencies = 1.0 / (cfg.max_period ** (2 * adim / cfg.dim))
    angles = positions.astype(jnp.float32)[:, None] * frequencies[None, :]
    return jnp.cos(angles), jnp.sin(angles)


def _xpos_decay(cfg: RopeConfig, positions: jax.Array) -> jax.Array:
    """xPos decay scale [T, dim/2] (`rope.py:38-47`)."""
    half = cfg.dim // 2
    adim = jnp.arange(half, dtype=jnp.float32)
    decay_rates = (adim / half + cfg.smoothing) / (1.0 + cfg.smoothing)
    power = positions.astype(jnp.float32) / cfg.base_scale
    return decay_rates[None, :] ** power[:, None]


def rope_rotate(cfg: RopeConfig, x: jax.Array, positions: jax.Array,
                invert_decay: bool = False) -> jax.Array:
    """Rotate x [..., T, H, D] at the given positions [T] (`rope.py:84-106`).

    Consecutive feature pairs (2i, 2i+1) form the complex plane, matching
    torch `view_as_complex` on [..., D/2, 2].
    """
    cos, sin = _rotation(cfg, positions)         # [T, D/2]
    if cfg.xpos:
        decay = _xpos_decay(cfg, positions)
        if invert_decay:
            decay = 1.0 / decay
        cos = cos * decay
        sin = sin * decay
    # scaled rotation: rot*scale + (1-scale)  (`rope.py:101`)
    cos = cos * cfg.scale + (1.0 - cfg.scale)
    sin = sin * cfg.scale
    # broadcast over batch and heads: x is [B, T, H, D]
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    xf = x.astype(jnp.float32)
    x_even = xf[..., 0::2]
    x_odd = xf[..., 1::2]
    out_even = x_even * cos - x_odd * sin
    out_odd = x_even * sin + x_odd * cos
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


def rope_rotate_qk(cfg: RopeConfig, query: jax.Array, key: jax.Array,
                   start: tp.Union[int, jax.Array] = 0
                   ) -> tp.Tuple[jax.Array, jax.Array]:
    """Rotate q and k [B, T, H, D] with a shared start offset (`rope.py:108-125`).

    When streaming, q may be shorter than k; q positions are offset so the
    last q step aligns with the last k step.
    """
    Tq, Tk = query.shape[1], key.shape[1]
    q_pos = jnp.arange(Tq) + start + (Tk - Tq)
    k_pos = jnp.arange(Tk) + start
    return (rope_rotate(cfg, query, q_pos),
            rope_rotate(cfg, key, k_pos, invert_decay=True))
