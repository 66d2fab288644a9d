"""Streamable LSTM with skip connection (parity: `audiocraft/modules/lstm.py:10-31`).

TPU-first design: the recurrence runs as a single `lax.scan` over time with all
gate matmuls batched as one ``[B, 4H]`` MXU matmul per step; input projections
for the whole sequence are precomputed as one large matmul (hoisted out of the
scan) so only the hidden-state recurrence is sequential.

Gate ordering matches torch ``nn.LSTM`` (i, f, g, o) so checkpoints port by
direct transpose.
"""
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp


class LSTMLayer(nn.Module):
    """Single torch-compatible LSTM layer over ``[B, T, C]``."""
    hidden_size: int
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 initial_state: tp.Optional[tp.Tuple[jax.Array, jax.Array]] = None
                 ) -> tp.Tuple[jax.Array, tp.Tuple[jax.Array, jax.Array]]:
        B, T, C = x.shape
        H = self.hidden_size
        k = 1.0 / (H ** 0.5)
        uinit = nn.initializers.uniform(scale=2 * k)

        def pinit(key, shape, dtype):
            return uinit(key, shape, dtype) - k

        w_ih = self.param("w_ih", pinit, (C, 4 * H), self.param_dtype)
        w_hh = self.param("w_hh", pinit, (H, 4 * H), self.param_dtype)
        b_ih = self.param("b_ih", pinit, (4 * H,), self.param_dtype)
        b_hh = self.param("b_hh", pinit, (4 * H,), self.param_dtype)

        dtype = self.dtype
        # Hoist the input projection out of the recurrence: one big MXU matmul.
        gates_x = (x.astype(dtype) @ w_ih.astype(dtype)
                   + (b_ih + b_hh).astype(dtype))  # [B, T, 4H]

        if initial_state is None:
            h0 = jnp.zeros((B, H), dtype)
            c0 = jnp.zeros((B, H), dtype)
        else:
            h0, c0 = initial_state

        w_hh_d = w_hh.astype(dtype)

        def step(carry, gx):
            h, c = carry
            gates = gx + h @ w_hh_d
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        (h, c), ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(gates_x, 0, 1))
        return jnp.swapaxes(ys, 0, 1), (h, c)


class StreamableLSTM(nn.Module):
    """Multi-layer LSTM with optional residual skip (`lstm.py:10-31`)."""
    dimension: int
    num_layers: int = 2
    skip: bool = True
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = x
        for i in range(self.num_layers):
            y, _ = LSTMLayer(self.dimension, dtype=self.dtype,
                             param_dtype=self.param_dtype, name=f"lstm_{i}")(y)
        if self.skip:
            y = y + x
        return y
