"""U-Net transformer: StreamingTransformer + skip connections between halves.

Parity: `audiocraft/modules/unet_transformer.py:6-69` (used by JASCO flow
matching).
"""
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp

from .transformer import (LayerCache, StreamingTransformer,
                          create_sin_embedding)


class UnetTransformer(StreamingTransformer):
    """Transformer with U-Net skips: first-half layer outputs are concatenated
    to mirrored second-half inputs and projected back to d_model."""
    skip_connections: bool = False
    layer_dropout_p: tp.Optional[float] = None

    def setup(self):
        super().setup()
        if self.skip_connections:
            self.skip_projections = [
                nn.Dense(self.d_model, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"skip_proj_{i}")
                for i in range(self.num_layers // 2)]

    def __call__(self, x: jax.Array, *,
                 cross_attention_src: tp.Optional[jax.Array] = None,
                 caches=None, attn_bias=None, deterministic: bool = True,
                 offset=0):
        B, T, C = x.shape
        x = x.astype(self.dtype)
        if self.positional_embedding in ["sin", "sin_rope"]:
            positions = jnp.arange(T).reshape(1, -1, 1) + offset
            pos_emb = create_sin_embedding(positions, C,
                                           max_period=self.max_period)
            x = x + self.positional_scale * pos_emb.astype(x.dtype)

        drop_p = max(min(self.layer_dropout_p, 1.0), 0.0) \
            if self.layer_dropout_p is not None else 0.0
        skips: tp.List[jax.Array] = []
        for i, layer in enumerate(self.layers):
            if self.skip_connections and i >= self.num_layers // 2:
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = self.skip_projections[i % len(self.skip_projections)](x)
            x, _ = layer(x, cross_attention_src=cross_attention_src,
                         attn_bias=attn_bias, deterministic=deterministic)
            if self.skip_connections and i < self.num_layers // 2:
                if not deterministic and drop_p > 0:
                    keep = jax.random.bernoulli(
                        self.make_rng("dropout"), 1.0 - drop_p)
                    skips.append(jnp.where(keep, x, jnp.zeros_like(x)))
                else:
                    skips.append(x)
        return x, None
