"""Streaming transformer with causal/finite-context attention and functional
KV caches.

Parity: `audiocraft/modules/transformer.py:138-755` (StreamingMultiheadAttention
with fused qkv + GQA kv_repeat, qk layernorm, attention-as-f32, cross-attention
layers, LayerScale, sin/rope/sin_rope positions, per-layer activation
checkpointing).

TPU-first design:
  * No mutable `StreamingModule` state dicts: the KV cache is an explicit
    pytree threaded through `__call__`, so the decode step jits once and runs
    under `lax.scan`.
  * Static-shape caches: a fixed-size buffer + write index; masking handles
    validity and the finite `past_context` window, so decoding never reshapes.
  * Keys are rope-rotated once at cache-write time (O(1)/step) rather than
    re-rotating the whole past each step like the reference.
  * Cross-attention K/V are precomputed once per generation
    (`precompute_cross_kv`) instead of re-projected every step.
  * `checkpointing='torch'` maps to `jax.checkpoint` over each layer with
    full in-layer recompute (reference torch.utils.checkpoint semantics);
    'dots' keeps matmul outputs (`jax.checkpoint_policies.dots_saveable`).
"""
import typing as tp

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from ..ops.attention import (dot_product_attention, flash_causal_attention,
                             flash_causal_eligible, make_causal_bias,
                             repeat_kv)
from ..ops.quant import qdot
from .activations import get_activation_fn
from .rope import RopeConfig, rope_rotate

_GLU_KINDS = ("reglu", "geglu", "swiglu", "glu")

# checkpointing='dots': keep matmul outputs AND every Pallas kernel output —
# the flash-attention custom-VJP backward needs the kernel's o AND lse
# residuals, and neither is a dot: plain dots_saveable would re-run the whole
# kernel in backward on top of its own internal recompute (measured as the
# 0.163/0.155-MFU failure modes; saving only the name-tagged output o still
# re-runs the kernel for lse). With no Pallas call in the graph this is
# exactly dots_saveable.
def _pallas_outputs_saveable(prim, *_, **__) -> bool:
    return getattr(prim, "name", "") == "pallas_call"


DOTS_REMAT_POLICY = jax.checkpoint_policies.save_from_both_policies(
    jax.checkpoint_policies.dots_saveable, _pallas_outputs_saveable)

# checkpointing='dots_nb': save only UNBATCHED dot outputs — the qkv/out
# projections and FFN matmuls — and recompute the batched attention chain
# (logits, softmax, PV) in backward. The [B, H, T, T] logits are exactly the
# tensor that makes 'dots' OOM at T=1500; recomputing them costs ~20% of a
# forward (~7% of the step) while the saved set shrinks to ~18 KB/token/layer.
DOTS_NB_REMAT_POLICY = jax.checkpoint_policies.save_from_both_policies(
    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    _pallas_outputs_saveable)

_REMAT_POLICIES = {"torch": None, "dots": DOTS_REMAT_POLICY,
                   "dots_nb": DOTS_NB_REMAT_POLICY}

_EFFICIENT_ATTENTION_BACKEND = "xla"


def set_efficient_attention_backend(backend: str = "xla") -> None:
    """Select the decode-attention implementation
    (parity: `transformer.py:91-99`, where the choice is torch vs xformers).

    'xla' (default): fused einsum path — XLA already emits a near
    bandwidth-bound kernel for single-query attention.
    'pallas': route single-step causal self-attention through the Pallas
    flash-decode kernel (`ops/flash_attention.py`) — logits never touch HBM.
    Benchmarks on v5e are within ~10% of each other either way.
    """
    global _EFFICIENT_ATTENTION_BACKEND
    assert backend in ("xla", "pallas"), backend
    _EFFICIENT_ATTENTION_BACKEND = backend


def create_sin_embedding(positions: jax.Array, dim: int,
                         max_period: float = 10000.0,
                         dtype=jnp.float32) -> jax.Array:
    """Sinusoidal positional embedding [B, T, C] (`transformer.py:69-89`)."""
    assert dim % 2 == 0
    half_dim = dim // 2
    positions = positions.astype(dtype)
    adim = jnp.arange(half_dim, dtype=dtype).reshape(1, 1, -1)
    phase = positions / (max_period ** (adim / (half_dim - 1)))
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)


@struct.dataclass
class KVCache:
    """Static-size self-attention cache: buffers [B, S, Hkv, D] + write index.

    With dtype int8 the buffers hold per-(step, head) symmetrically
    quantized values and `k_scale`/`v_scale` hold the dequant scales
    [B, S, Hkv, 1] — halving decode cache traffic (the HBM bottleneck)
    vs bf16 at <1e-2 relative attention error."""
    k: jax.Array
    v: jax.Array
    index: jax.Array  # scalar int32: number of valid steps written
    k_scale: tp.Optional[jax.Array] = None
    v_scale: tp.Optional[jax.Array] = None

    @classmethod
    def create(cls, batch: int, max_len: int, num_kv_heads: int, head_dim: int,
               dtype=jnp.float32) -> "KVCache":
        z = jnp.zeros((batch, max_len, num_kv_heads, head_dim), dtype)
        scales = None
        if dtype == jnp.int8:
            scales = jnp.zeros((batch, max_len, num_kv_heads, 1), jnp.bfloat16)
        return cls(k=z, v=z, index=jnp.zeros((), jnp.int32),
                   k_scale=scales, v_scale=scales)

    def write(self, k: jax.Array, v: jax.Array, offset) -> "KVCache":
        """Write a [B, T, Hkv, D] chunk at `offset` (quantizing if int8)."""
        if self.k.dtype == jnp.int8:
            k_s = jnp.max(jnp.abs(k), axis=-1, keepdims=True) / 127.0
            v_s = jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0
            k_q = jnp.round(k / jnp.maximum(k_s, 1e-8)).astype(jnp.int8)
            v_q = jnp.round(v / jnp.maximum(v_s, 1e-8)).astype(jnp.int8)
            return KVCache(
                k=jax.lax.dynamic_update_slice(self.k, k_q, (0, offset, 0, 0)),
                v=jax.lax.dynamic_update_slice(self.v, v_q, (0, offset, 0, 0)),
                index=offset + k.shape[1],
                k_scale=jax.lax.dynamic_update_slice(
                    self.k_scale, k_s.astype(self.k_scale.dtype),
                    (0, offset, 0, 0)),
                v_scale=jax.lax.dynamic_update_slice(
                    self.v_scale, v_s.astype(self.v_scale.dtype),
                    (0, offset, 0, 0)))
        return KVCache(
            k=jax.lax.dynamic_update_slice(self.k, k.astype(self.k.dtype),
                                           (0, offset, 0, 0)),
            v=jax.lax.dynamic_update_slice(self.v, v.astype(self.v.dtype),
                                           (0, offset, 0, 0)),
            index=offset + k.shape[1])

    def read(self, dtype) -> tp.Tuple[jax.Array, jax.Array]:
        """Full dequantized buffers in `dtype` (fused into the consumer)."""
        if self.k.dtype == jnp.int8:
            return (self.k.astype(dtype) * self.k_scale.astype(dtype),
                    self.v.astype(dtype) * self.v_scale.astype(dtype))
        return self.k.astype(dtype), self.v.astype(dtype)


class QDense(nn.Module):
    """`nn.Dense` drop-in whose kernel may be a `QTensor` (the W8A8 int8
    serving mode, `ops/quant.py`). Param names/paths match `nn.Dense`
    ("kernel"/"bias") so bf16 checkpoints load unchanged; with plain-array
    kernels the math is identical to `nn.Dense`."""
    features: int
    use_bias: bool = True
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32
    kernel_init: tp.Any = nn.initializers.lecun_normal()
    bias_init: tp.Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), self.param_dtype)
        y = qdot(x.astype(self.dtype), kernel, self.dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


class LayerScale(nn.Module):
    """Diagonal residual rescaling (`transformer.py:112-136`)."""
    channels: int
    init: float = 1e-4
    param_dtype: tp.Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale",
                           nn.initializers.constant(self.init),
                           (self.channels,), self.param_dtype)
        return x * scale.astype(x.dtype)


class StreamingMultiheadAttention(nn.Module):
    """MHA with streaming KV cache, causal masking with optional finite
    `past_context`, GQA `kv_repeat` and optional qk layernorm
    (`transformer.py:138-452`)."""
    embed_dim: int
    num_heads: int
    use_bias: bool = True
    causal: bool = False
    past_context: tp.Optional[int] = None
    rope: tp.Optional[RopeConfig] = None
    cross_attention: bool = False
    qk_layer_norm: bool = False
    kv_repeat: int = 1
    attention_as_float32: bool = False
    dropout: float = 0.0
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    def setup(self):
        if self.cross_attention:
            assert not self.causal, "Causal cannot work with cross attention."
            assert self.rope is None, "Rope cannot work with cross attention."
            assert self.kv_repeat == 1
        assert self.num_heads % self.kv_repeat == 0
        num_kv = self.num_heads // self.kv_repeat
        head_dim = self.embed_dim // self.num_heads
        kv_dim = head_dim * num_kv
        out_dim = self.embed_dim + 2 * kv_dim
        # Fused in-projection, torch MHA convention (q | k | v columns).
        # Declared as raw params (not Dense) because cross-attention only ever
        # uses slices of it.
        bound = 1.0 / (self.embed_dim ** 0.5)
        self.in_proj_weight = self.param(
            "in_proj_weight",
            lambda key, shape, dt: jax.random.uniform(key, shape, dt, -bound, bound),
            (self.embed_dim, out_dim), self.param_dtype)
        if self.use_bias:
            # torch convention: in_proj bias zeroed (`transformer.py:203-205`)
            self.in_proj_bias = self.param("in_proj_bias", nn.initializers.zeros,
                                           (out_dim,), self.param_dtype)
        self.out_proj = QDense(self.embed_dim, use_bias=self.use_bias,
                               bias_init=nn.initializers.zeros,
                               dtype=self.dtype, param_dtype=self.param_dtype,
                               name="out_proj")
        if self.qk_layer_norm:
            assert self.kv_repeat == 1
            self.q_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                             param_dtype=self.param_dtype)
            self.k_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                             param_dtype=self.param_dtype)

    def _split_heads(self, x: jax.Array, heads: int) -> jax.Array:
        B, T, _ = x.shape
        return x.reshape(B, T, heads, -1)

    def _project_q(self, query: jax.Array) -> jax.Array:
        w = self.in_proj_weight[:, :self.embed_dim]
        q = qdot(query, w, query.dtype)
        if self.use_bias:
            q = q + self.in_proj_bias[:self.embed_dim].astype(q.dtype)
        return q

    def project_kv(self, src: jax.Array) -> tp.Tuple[jax.Array, jax.Array]:
        """Project keys/values only (cross-attention precompute)."""
        E = self.embed_dim
        w = self.in_proj_weight[:, E:]
        kv = qdot(src.astype(self.dtype), w, self.dtype)
        if self.use_bias:
            kv = kv + self.in_proj_bias[E:].astype(kv.dtype)
        k, v = jnp.split(kv, 2, axis=-1)
        if self.qk_layer_norm:
            k = self.k_layer_norm(k)
        num_kv = self.num_heads // self.kv_repeat
        return self._split_heads(k, num_kv), self._split_heads(v, num_kv)

    def _attn_dropout_args(self, deterministic: bool) -> dict:
        """Attention-probs dropout kwargs (`transformer.py:411,436`): active
        only in train mode; draws from the 'dropout' rng collection."""
        if deterministic or self.dropout <= 0.0:
            return {}
        return {"dropout_rate": self.dropout,
                "dropout_rng": self.make_rng("dropout")}

    def __call__(self, query: jax.Array, key: jax.Array, value: jax.Array, *,
                 cache: tp.Optional[KVCache] = None,
                 cross_kv: tp.Optional[tp.Tuple[jax.Array, jax.Array]] = None,
                 attn_bias: tp.Optional[jax.Array] = None,
                 deterministic: bool = True,
                 ) -> tp.Tuple[jax.Array, tp.Optional[KVCache]]:
        """Returns (out [B, T, E], updated cache or None).

        Self-attention: query is key is value, causal bias auto-built.
        Cross-attention: keys/values from `key`/`value` (or `cross_kv`
        precomputed [B, Tk, H, D] pairs); no cache needed.
        """
        B, T, _ = query.shape
        num_kv = self.num_heads // self.kv_repeat
        dtype = self.dtype
        query = query.astype(dtype)

        if self.cross_attention:
            q = self._project_q(query)
            if self.qk_layer_norm:
                q = self.q_layer_norm(q)
            q = self._split_heads(q, self.num_heads)
            if cross_kv is not None:
                k, v = cross_kv
            else:
                k, v = self.project_kv(key.astype(dtype))
            x = dot_product_attention(q, k, v, bias=attn_bias,
                                      as_float32=self.attention_as_float32,
                                      **self._attn_dropout_args(deterministic))
            return self.out_proj(x.reshape(B, T, -1)), cache

        # --- self-attention: fused qkv ---
        projected = qdot(query, self.in_proj_weight, dtype)
        if self.use_bias:
            projected = projected + self.in_proj_bias.astype(dtype)
        E = self.embed_dim
        head_dim = E // self.num_heads
        kv_dim = head_dim * num_kv
        q = projected[..., :E]
        k = projected[..., E:E + kv_dim]
        v = projected[..., E + kv_dim:]
        if self.qk_layer_norm:
            q = self.q_layer_norm(q)
            k = self.k_layer_norm(k)
        q = self._split_heads(q, self.num_heads)
        k = self._split_heads(k, num_kv)
        v = self._split_heads(v, num_kv)

        if cache is not None:
            offset = cache.index
            q_pos = jnp.arange(T) + offset
            if self.rope is not None:
                q = rope_rotate(self.rope, q, q_pos)
                k = rope_rotate(self.rope, k, q_pos, invert_decay=True)
            # write current chunk into the static buffer
            cache = cache.write(k, v, offset)
            if (T == 1 and self.causal and attn_bias is None
                    and self.kv_repeat == 1
                    and _EFFICIENT_ATTENTION_BACKEND == "pallas"):
                from ..ops.flash_attention import decode_attention
                if cache.k.dtype == jnp.int8:
                    # int8 buffers go to the kernel as-is; dequant in VMEM
                    x = decode_attention(q[:, 0], cache.k, cache.v,
                                         offset + T,
                                         past_context=self.past_context,
                                         k_scale=cache.k_scale,
                                         v_scale=cache.v_scale)
                else:
                    x = decode_attention(q[:, 0], cache.k.astype(dtype),
                                         cache.v.astype(dtype), offset + T,
                                         past_context=self.past_context)
                return self.out_proj(x.reshape(B, T, -1)), cache
            S = cache.k.shape[1]
            k_pos = jnp.arange(S)
            k_valid = k_pos < (offset + T)
            bias = make_causal_bias(q_pos, k_pos,
                                    self.past_context if self.causal else None,
                                    k_valid=k_valid)
            if not self.causal:
                # only validity masking
                neg = jnp.finfo(jnp.float32).min
                bias = jnp.where(k_valid[None, :], 0.0, neg)
            k_all, v_all = cache.read(dtype)
        else:
            if self.rope is not None:
                pos = jnp.arange(T)
                q = rope_rotate(self.rope, q, pos)
                k = rope_rotate(self.rope, k, pos, invert_decay=True)
            if (self.causal and self.past_context is None
                    and attn_bias is None
                    # f32-logit configs and attention-probs dropout need the
                    # XLA path: the Pallas kernel keeps bf16 logits (f32
                    # softmax only) and has no dropout
                    and not self.attention_as_float32
                    and (deterministic or self.dropout <= 0.0)
                    and flash_causal_eligible(T, T, self.embed_dim
                                              // self.num_heads)):
                # full-sequence causal training/prefill forward via the
                # Pallas flash kernel (fwd + custom-VJP bwd; never
                # materializes the [B, H, T, T] logits). OPT-IN: off by
                # default — under the production full-layer remat the
                # kernel's internal bwd recompute stacks on the layer
                # recompute and loses (measured 0.163 vs 0.241 MFU at
                # T=1500); see ops/attention.py for the full measurement
                # table and set_train_attention_backend("auto") to enable.
                x = flash_causal_attention(q, repeat_kv(k, self.kv_repeat),
                                           repeat_kv(v, self.kv_repeat))
                return self.out_proj(x.reshape(B, T, -1)), cache
            bias = None
            if self.causal:
                pos = jnp.arange(T)
                bias = make_causal_bias(pos, pos, self.past_context)
            k_all, v_all = k, v

        if attn_bias is not None:
            bias = attn_bias if bias is None else bias + attn_bias
        k_all = repeat_kv(k_all, self.kv_repeat)
        v_all = repeat_kv(v_all, self.kv_repeat)
        x = dot_product_attention(q, k_all, v_all, bias=bias,
                                  as_float32=self.attention_as_float32,
                                  **self._attn_dropout_args(deterministic))
        return self.out_proj(x.reshape(B, T, -1)), cache


@struct.dataclass
class LayerCache:
    """Per-layer streaming state: self-attn KV + precomputed cross K/V."""
    self_attn: KVCache
    cross_k: tp.Optional[jax.Array] = None  # [B, Tc, H, D]
    cross_v: tp.Optional[jax.Array] = None


class StreamingTransformerLayer(nn.Module):
    """Pre/post-norm transformer layer with optional cross-attention
    (`transformer.py:454-575`)."""
    d_model: int
    num_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.0
    attention_dropout: tp.Optional[float] = None
    use_bias_ff: bool = True
    use_bias_attn: bool = True
    causal: bool = False
    past_context: tp.Optional[int] = None
    attention_as_float32: bool = False
    qk_layer_norm: bool = False
    qk_layer_norm_cross: bool = False
    cross_attention: bool = False
    layer_scale: tp.Optional[float] = None
    rope: tp.Optional[RopeConfig] = None
    kv_repeat: int = 1
    norm_first: bool = True
    activation: str = "gelu"
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    def setup(self):
        common = dict(embed_dim=self.d_model, num_heads=self.num_heads,
                      use_bias=self.use_bias_attn,
                      attention_as_float32=self.attention_as_float32,
                      dropout=self.dropout if self.attention_dropout is None
                      else self.attention_dropout,
                      dtype=self.dtype, param_dtype=self.param_dtype)
        self.self_attn = StreamingMultiheadAttention(
            causal=self.causal, past_context=self.past_context, rope=self.rope,
            qk_layer_norm=self.qk_layer_norm, kv_repeat=self.kv_repeat, **common)
        ffn_mult = 2 if self.activation in _GLU_KINDS else 1
        self.linear1 = QDense(self.dim_feedforward * ffn_mult,
                              use_bias=self.use_bias_ff, dtype=self.dtype,
                              param_dtype=self.param_dtype)
        self.linear2 = QDense(self.d_model, use_bias=self.use_bias_ff,
                              dtype=self.dtype, param_dtype=self.param_dtype)
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        if self.layer_scale is not None:
            self.layer_scale_1 = LayerScale(self.d_model, self.layer_scale,
                                            param_dtype=self.param_dtype)
            self.layer_scale_2 = LayerScale(self.d_model, self.layer_scale,
                                            param_dtype=self.param_dtype)
        if self.cross_attention:
            self.cross_attn = StreamingMultiheadAttention(
                cross_attention=True, qk_layer_norm=self.qk_layer_norm_cross,
                **common)
            self.norm_cross = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                           param_dtype=self.param_dtype)
            if self.layer_scale is not None:
                self.layer_scale_cross = LayerScale(
                    self.d_model, self.layer_scale, param_dtype=self.param_dtype)
        self.dropout_layer = nn.Dropout(self.dropout)

    def _scale(self, name: str, x: jax.Array) -> jax.Array:
        if self.layer_scale is None:
            return x
        return getattr(self, name)(x)

    def _ff_block(self, x: jax.Array, deterministic: bool) -> jax.Array:
        act = get_activation_fn(self.activation)
        h = act(self.linear1(x))
        h = self.dropout_layer(h, deterministic=deterministic)
        return self.dropout_layer(self.linear2(h), deterministic=deterministic)

    def _sa_block(self, x, cache, attn_bias, deterministic):
        y, cache = self.self_attn(x, x, x, cache=cache, attn_bias=attn_bias,
                                  deterministic=deterministic)
        return self.dropout_layer(y, deterministic=deterministic), cache

    def _cross_block(self, x, src, cross_kv, deterministic):
        y, _ = self.cross_attn(x, src, src, cross_kv=cross_kv,
                               deterministic=deterministic)
        return self.dropout_layer(y, deterministic=deterministic)

    def precompute_cross_kv(self, src: jax.Array):
        assert self.cross_attention
        return self.cross_attn.project_kv(src)

    def __call__(self, x: jax.Array, *,
                 cross_attention_src: tp.Optional[jax.Array] = None,
                 cache: tp.Optional[LayerCache] = None,
                 attn_bias: tp.Optional[jax.Array] = None,
                 deterministic: bool = True
                 ) -> tp.Tuple[jax.Array, tp.Optional[LayerCache]]:
        self_cache = cache.self_attn if cache is not None else None
        cross_kv = None
        if cache is not None and cache.cross_k is not None:
            cross_kv = (cache.cross_k, cache.cross_v)
        has_cross = (cross_attention_src is not None) or (cross_kv is not None)
        if self.cross_attention:
            assert has_cross
        else:
            assert not has_cross

        x = x.astype(self.dtype)
        if self.norm_first:
            y, self_cache = self._sa_block(self.norm1(x), self_cache, attn_bias,
                                           deterministic)
            x = x + self._scale("layer_scale_1", y)
            if has_cross:
                x = x + self._scale("layer_scale_cross", self._cross_block(
                    self.norm_cross(x), cross_attention_src, cross_kv,
                    deterministic))
            x = x + self._scale("layer_scale_2", self._ff_block(self.norm2(x),
                                                                deterministic))
        else:
            y, self_cache = self._sa_block(x, self_cache, attn_bias, deterministic)
            x = self.norm1(x + self._scale("layer_scale_1", y))
            if has_cross:
                x = self.norm_cross(x + self._scale(
                    "layer_scale_cross",
                    self._cross_block(x, cross_attention_src, cross_kv,
                                      deterministic)))
            x = self.norm2(x + self._scale("layer_scale_2",
                                           self._ff_block(x, deterministic)))
        new_cache = None
        if cache is not None:
            new_cache = LayerCache(self_attn=self_cache, cross_k=cache.cross_k,
                                   cross_v=cache.cross_v)
        return x, new_cache


class StreamingTransformer(nn.Module):
    """Stack of StreamingTransformerLayers with sin/rope/sin_rope positions
    (`transformer.py:577-713`)."""
    d_model: int
    num_heads: int
    num_layers: int
    dim_feedforward: int = 2048
    dropout: float = 0.0
    attention_dropout: tp.Optional[float] = None
    use_bias_ff: bool = True
    use_bias_attn: bool = True
    causal: bool = False
    past_context: tp.Optional[int] = None
    attention_as_float32: bool = False
    cross_attention: bool = False
    layer_scale: tp.Optional[float] = None
    positional_embedding: str = "sin"
    max_period: float = 10000.0
    positional_scale: float = 1.0
    xpos: bool = False
    qk_layer_norm: bool = False
    qk_layer_norm_cross: bool = False
    kv_repeat: int = 1
    norm_first: bool = True
    activation: str = "gelu"
    # 'none' | 'torch' | 'dots' | 'dots_nb'. 'torch' matches the reference's
    # torch.utils.checkpoint semantics (`transformer.py:141-149`): save only
    # layer-boundary activations and recompute everything inside the layer
    # in backward — the only policy whose activation footprint fits 30 s
    # sequences (T=1500) on one 16 GB v5e chip, and the MEASURED best there
    # (0.241 useful-MFU vs 'dots_nb' 0.183 and flash-under-'dots' 0.162;
    # README "30s-shape training MFU"). 'dots' (DOTS_REMAT_POLICY) keeps
    # matmul + Pallas outputs: ~9% step cost at 10 s shapes where the
    # [B, H, T, T] logits still fit. 'dots_nb' (DOTS_NB_REMAT_POLICY) keeps
    # only unbatched dots, recomputing the attention chain in backward.
    checkpointing: str = "none"
    # Opt-in train/prefill path: `lax.scan` over ONE layer body with the
    # per-layer param subtrees stacked on a leading axis at trace time.
    # XLA compiles a single layer program instead of `num_layers` unrolled
    # copies — ~L× smaller HLO (the T=1500 24-layer train step is the
    # motivating case: the unrolled program crashes this image's
    # remote-compile helper under the flash custom-VJP kernel). Checkpoint
    # layout is unchanged: init still creates `layers_{i}` subtrees and the
    # stack is a pure gather inside the jitted step. Decode (caches) keeps
    # the unrolled path — stacked KV caches are not worth the churn there.
    layer_scan: bool = False
    # lr/weight_decay overrides for per-module optim groups (`transformer.py:715-721`)
    lr: tp.Optional[float] = None
    weight_decay: tp.Optional[float] = None
    dtype: tp.Any = jnp.float32
    param_dtype: tp.Any = jnp.float32

    def setup(self):
        assert self.d_model % self.num_heads == 0
        assert self.positional_embedding in ["sin", "rope", "sin_rope"]
        rope = None
        if self.positional_embedding in ["rope", "sin_rope"]:
            rope = RopeConfig(dim=self.d_model // self.num_heads,
                              max_period=self.max_period,
                              xpos=self.xpos, scale=self.positional_scale)
        self.layers = [
            StreamingTransformerLayer(
                d_model=self.d_model, num_heads=self.num_heads,
                dim_feedforward=self.dim_feedforward, dropout=self.dropout,
                attention_dropout=self.attention_dropout,
                use_bias_ff=self.use_bias_ff, use_bias_attn=self.use_bias_attn,
                causal=self.causal, past_context=self.past_context,
                attention_as_float32=self.attention_as_float32,
                qk_layer_norm=self.qk_layer_norm,
                qk_layer_norm_cross=self.qk_layer_norm_cross,
                cross_attention=self.cross_attention,
                layer_scale=self.layer_scale, rope=rope,
                kv_repeat=self.kv_repeat, norm_first=self.norm_first,
                activation=self.activation, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"layers_{i}")
            for i in range(self.num_layers)]

    def init_cache(self, batch: int, max_len: int,
                   dtype=None) -> tp.List[LayerCache]:
        """Fresh empty caches for all layers (host-side helper)."""
        num_kv = self.num_heads // self.kv_repeat
        head_dim = self.d_model // self.num_heads
        dtype = dtype or self.dtype
        return [LayerCache(self_attn=KVCache.create(batch, max_len, num_kv,
                                                    head_dim, dtype))
                for _ in range(self.num_layers)]

    def precompute_cross_kv(self, src: jax.Array,
                            caches: tp.List[LayerCache]) -> tp.List[LayerCache]:
        """Fill each layer cache with projected cross-attention K/V."""
        out = []
        for layer, cache in zip(self.layers, caches):
            k, v = layer.precompute_cross_kv(src)
            out.append(LayerCache(self_attn=cache.self_attn, cross_k=k, cross_v=v))
        return out

    def __call__(self, x: jax.Array, *,
                 offset: tp.Union[int, jax.Array] = 0,
                 cross_attention_src: tp.Optional[jax.Array] = None,
                 caches: tp.Optional[tp.List[LayerCache]] = None,
                 attn_bias: tp.Optional[jax.Array] = None,
                 deterministic: bool = True,
                 ) -> tp.Tuple[jax.Array, tp.Optional[tp.List[LayerCache]]]:
        B, T, C = x.shape
        x = x.astype(self.dtype)
        if caches is not None:
            offset = caches[0].self_attn.index
        if self.positional_embedding in ["sin", "sin_rope"]:
            positions = jnp.arange(T).reshape(1, -1, 1) + offset
            pos_emb = create_sin_embedding(positions, C, max_period=self.max_period,
                                           dtype=jnp.float32)
            x = x + self.positional_scale * pos_emb.astype(x.dtype)

        if (self.layer_scan and caches is None
                and not self.is_initializing()):
            return self._scan_layers(x, cross_attention_src, attn_bias,
                                     deterministic), None

        new_caches: tp.Optional[tp.List[LayerCache]] = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            cache_i = caches[i] if caches is not None else None
            if self.checkpointing == "none" or cache_i is not None:
                x, new_cache = layer(x, cross_attention_src=cross_attention_src,
                                     cache=cache_i, attn_bias=attn_bias,
                                     deterministic=deterministic)
            else:
                # jax.checkpoint: recompute layer activations in backward
                assert self.checkpointing in _REMAT_POLICIES, \
                    self.checkpointing

                def apply_layer(mdl, h):
                    y, _ = mdl(h, cross_attention_src=cross_attention_src,
                               attn_bias=attn_bias, deterministic=deterministic)
                    return y
                policy = _REMAT_POLICIES[self.checkpointing]
                x = nn.checkpoint(apply_layer, policy=policy)(layer, x)
                new_cache = None
            if new_caches is not None:
                new_caches.append(new_cache)
        return x, new_caches

    def _scan_layers(self, x: jax.Array,
                     cross_attention_src: tp.Optional[jax.Array],
                     attn_bias: tp.Optional[jax.Array],
                     deterministic: bool) -> jax.Array:
        """`lax.scan` over one layer body with stacked per-layer params.

        Math-identical to the unrolled loop (equality-tested in
        tests/modules/test_transformer.py); `checkpointing` applies to the
        scan body, so 'torch' = classic scan-plus-remat per-layer
        checkpointing with an L× smaller program than the unrolled loop."""
        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[layer.variables["params"] for layer in self.layers])
        # an unbound clone of layer 0 (all layers share the config) whose
        # `.apply` runs one body functionally inside the scan
        body_mod = self.layers[0].clone(parent=None)
        use_rng = not deterministic and self.has_rng("dropout")
        keys = (jax.random.split(self.make_rng("dropout"), self.num_layers)
                if use_rng else jnp.zeros((self.num_layers, 2), jnp.uint32))

        def body_fn(h, lp, key):
            y, _ = body_mod.apply(
                {"params": lp}, h, cross_attention_src=cross_attention_src,
                attn_bias=attn_bias, deterministic=deterministic,
                rngs={"dropout": key} if use_rng else None)
            return y

        if self.checkpointing in ("torch", "dots", "dots_nb"):
            body_fn = jax.checkpoint(
                body_fn, policy=_REMAT_POLICIES[self.checkpointing])

        def scan_step(h, per_layer):
            lp, key = per_layer
            return body_fn(h, lp, key), None

        x, _ = jax.lax.scan(scan_step, x, (stacked, keys))
        return x

    def make_optim_group(self, params) -> dict:
        group: tp.Dict[str, tp.Any] = {"params": params}
        if self.lr is not None:
            group["lr"] = self.lr
        if self.weight_decay is not None:
            group["weight_decay"] = self.weight_decay
        return group
