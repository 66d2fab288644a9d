"""Attention ops: XLA path + (optional) Pallas flash-attention for TPU.

Replaces the reference's xformers `memory_efficient_attention` / torch SDPA
(`audiocraft/modules/transformer.py:402-416`). The XLA einsum path is the
portable default — XLA fuses the softmax chain and maps the batched matmuls
onto the MXU. `flash_attention` (ops/flash_attention.py) is used automatically
for long self-attention sequences on TPU.

Layouts: q [B, Tq, H, D]; k/v [B, Tk, Hkv, D] with H = Hkv * kv_repeat (GQA).
"""
import typing as tp

import jax
import jax.numpy as jnp


def repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """GQA repeat-interleave on the heads axis (`transformer.py:92-109`)."""
    if n_rep == 1:
        return x
    B, T, H, D = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (B, T, H, n_rep, D)).reshape(
        B, T, H * n_rep, D)


def make_causal_bias(q_pos: jax.Array, k_pos: jax.Array,
                     past_context: tp.Optional[int] = None,
                     k_valid: tp.Optional[jax.Array] = None,
                     dtype=jnp.float32) -> jax.Array:
    """Additive attention bias [Tq, Tk] (or [B, Tq, Tk] if k_valid is [B, Tk]).

    Mirrors `transformer.py:233-264`: key allowed iff
    0 <= q_pos - k_pos (<= past_context), and optionally key slot is valid
    (used for ring/static KV caches).
    """
    delta = q_pos[:, None] - k_pos[None, :]
    valid = delta >= 0
    if past_context is not None:
        valid &= delta <= past_context
    if k_valid is not None:
        if k_valid.ndim == 1:
            valid &= k_valid[None, :]
        else:
            valid = valid[None] & k_valid[:, None, :]
    neg = jnp.asarray(jnp.finfo(dtype).min, dtype)
    return jnp.where(valid, jnp.zeros((), dtype), neg)


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          bias: tp.Optional[jax.Array] = None,
                          as_float32: bool = True) -> jax.Array:
    """Scaled dot-product attention, softmax in f32.

    bias broadcasts against [B, H, Tq, Tk] (2d/3d accepted).
    """
    B, Tq, H, D = q.shape
    out_dtype = q.dtype
    scale = 1.0 / (D ** 0.5)
    compute = jnp.float32 if as_float32 else q.dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(compute) * scale,
                        k.astype(compute),
                        preferred_element_type=jnp.float32)
    if bias is not None:
        if bias.ndim == 2:
            bias = bias[None, None]
        elif bias.ndim == 3:
            bias = bias[:, None]
        logits = logits + bias.astype(logits.dtype)
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(compute), v.astype(compute),
                     preferred_element_type=compute)
    return out.astype(out_dtype)
