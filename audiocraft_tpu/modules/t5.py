"""Native JAX T5 encoder for text conditioning.

Replaces the reference's dependency on HF torch `T5EncoderModel`
(`audiocraft/modules/conditioners.py:422-569`). Implemented from the T5 paper
spec so it runs as part of the jitted conditioning step on TPU; weights port
from HF torch checkpoints via `models/loaders.py`.

Architecture notes (t5 v1.0, e.g. `t5-base`):
  * RMS layer norm (no mean subtraction, no bias), pre-norm blocks
  * attention WITHOUT 1/sqrt(d) scaling (absorbed in init, per T5)
  * shared relative-position bucket bias, held by layer 0, reused by all
  * ReLU FFN (v1.0) or gated-GELU (flan/v1.1)
"""
import dataclasses
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5EncoderConfig:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    gated_ffn: bool = False  # True for flan-t5 / v1.1

    _PRESETS: tp.ClassVar[dict] = {
        "t5-small": dict(d_model=512, d_kv=64, d_ff=2048, num_layers=6, num_heads=8),
        "t5-base": dict(d_model=768, d_kv=64, d_ff=3072, num_layers=12, num_heads=12),
        "t5-large": dict(d_model=1024, d_kv=64, d_ff=4096, num_layers=24, num_heads=16),
        "t5-3b": dict(d_model=1024, d_kv=128, d_ff=16384, num_layers=24, num_heads=32),
        "t5-11b": dict(d_model=1024, d_kv=128, d_ff=65536, num_layers=24, num_heads=128),
        "google/flan-t5-small": dict(d_model=512, d_kv=64, d_ff=1024, num_layers=8,
                                     num_heads=6, gated_ffn=True),
        "google/flan-t5-base": dict(d_model=768, d_kv=64, d_ff=2048, num_layers=12,
                                    num_heads=12, gated_ffn=True),
        "google/flan-t5-large": dict(d_model=1024, d_kv=64, d_ff=2816, num_layers=24,
                                     num_heads=16, gated_ffn=True),
    }

    @classmethod
    def for_model(cls, name: str) -> "T5EncoderConfig":
        if name not in cls._PRESETS:
            raise ValueError(f"Unknown T5 model {name!r}")
        return cls(**cls._PRESETS[name])


class T5LayerNorm(nn.Module):
    """RMS norm without bias/mean-centering."""
    epsilon: float = 1e-6
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],),
                            self.param_dtype)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.epsilon)
        return (x * weight.astype(jnp.float32)).astype(self.dtype)


def relative_position_bucket(relative_position: np.ndarray,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> np.ndarray:
    """T5 bidirectional relative-position bucketing (host-side numpy; the
    table is a compile-time constant for a given sequence length)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(np.int64)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_if_large)


class T5Attention(nn.Module):
    cfg: T5EncoderConfig
    has_relative_bias: bool = False
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array,
                 position_bias: tp.Optional[jax.Array] = None
                 ) -> tp.Tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        B, T, _ = x.shape
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda name: nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        q = dense("q")(x).reshape(B, T, cfg.num_heads, cfg.d_kv)
        k = dense("k")(x).reshape(B, T, cfg.num_heads, cfg.d_kv)
        v = dense("v")(x).reshape(B, T, cfg.num_heads, cfg.d_kv)

        if position_bias is None:
            if self.has_relative_bias:
                rel_pos = (np.arange(T)[None, :] - np.arange(T)[:, None])
                buckets = relative_position_bucket(
                    rel_pos, cfg.relative_attention_num_buckets,
                    cfg.relative_attention_max_distance)
                table = self.param(
                    "relative_attention_bias",
                    nn.initializers.normal(1.0 / np.sqrt(cfg.d_model)),
                    (cfg.relative_attention_num_buckets, cfg.num_heads),
                    self.param_dtype)
                position_bias = jnp.transpose(table[jnp.asarray(buckets)],
                                              (2, 0, 1))[None]  # [1, H, T, T]
            else:
                position_bias = jnp.zeros((1, cfg.num_heads, T, T), jnp.float32)

        # T5: no 1/sqrt(d) scaling
        logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32))
        logits = logits + position_bias.astype(jnp.float32)
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask[:, None, None, :].astype(bool), logits, neg)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v.astype(jnp.float32))
        out = out.reshape(B, T, inner).astype(self.dtype)
        out = nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="o")(out)
        return out, position_bias


class T5Block(nn.Module):
    cfg: T5EncoderConfig
    has_relative_bias: bool = False
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, position_bias=None):
        cfg = self.cfg
        h = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="ln_attn")(x)
        attn, position_bias = T5Attention(cfg, self.has_relative_bias,
                                          dtype=self.dtype,
                                          param_dtype=self.param_dtype,
                                          name="attn")(h, mask, position_bias)
        x = x + attn
        h = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="ln_ff")(x)
        dense = lambda dim, name: nn.Dense(dim, use_bias=False, dtype=self.dtype,
                                           param_dtype=self.param_dtype, name=name)
        if cfg.gated_ffn:
            g = jax.nn.gelu(dense(cfg.d_ff, "wi_0")(h), approximate=True)
            h = g * dense(cfg.d_ff, "wi_1")(h)
        else:
            h = jax.nn.relu(dense(cfg.d_ff, "wi")(h))
        x = x + dense(cfg.d_model, "wo")(h)
        return x, position_bias


class T5Encoder(nn.Module):
    """T5 encoder stack; returns [B, T, d_model] (not masked — callers apply
    the mask, matching `conditioners.py:560-567`)."""
    cfg: T5EncoderConfig
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, mask: jax.Array) -> jax.Array:
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="shared")(tokens)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = T5Block(cfg, has_relative_bias=(i == 0),
                                       dtype=self.dtype,
                                       param_dtype=self.param_dtype,
                                       name=f"block_{i}")(x, mask, position_bias)
        x = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="final_ln")(x)
        return x
