"""Pallas TPU kernels: fused single-query (decode) attention.

Replaces the reference's xformers CUDA attention for the AR decode hot loop
(`audiocraft/modules/transformer.py:402-416`): one kernel computes
softmax(q.K^T * scale + validity mask) . V over the static KV cache, keeping
the logits in VMEM (never materialized in HBM) with f32 accumulation.

Layouts: q [B, H, D]; k/v caches [B, S, H, D]; length scalar = valid prefix.
Flash-decode structure: grid (B, S/S_BLK) streams the KV cache through VMEM
one [S_BLK, H, D] chunk at a time with an online-softmax running (max, sum,
acc) state in VMEM scratch — VMEM stays bounded no matter how long the cache
is. The reductions are VPU element-wise ops (decode attention is
bandwidth-bound; a single query has no matmul-shaped reuse).
"""
import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# online-softmax max floor: masked-out chunks have all scores at NEG_INF and
# must contribute exp(NEG_INF - m) == 0, so m never sinks below this.
_M_FLOOR = -1e4


def _decode_attn_kernel(length_ref, q_ref, k_ref, v_ref, *rest,
                        s_blk: int, n_blk: int,
                        past_context: tp.Optional[int],
                        quantized: bool):
    """Grid: (B, S//s_blk). Blocks: q/out [1, H, D]; k/v [1, s_blk, H, D].

    With `quantized`, k/v blocks are int8 and two extra inputs carry the
    per-(step, head) dequant scales as [1, s_blk, H] blocks; dequantization
    happens in VMEM so the int8 cache is the only HBM traffic.
    """
    if quantized:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    sb = pl.program_id(1)

    @pl.when(sb == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _M_FLOOR)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    length = length_ref[0]
    q = q_ref[0].astype(jnp.float32)                  # [H, D]
    k = k_ref[0].astype(jnp.float32)                  # [s_blk, H, D]
    if quantized:
        k = k * ks_ref[0].astype(jnp.float32)[:, :, None]
    D = q.shape[-1]
    scale = 1.0 / (D ** 0.5)
    # scores[s, h] = sum_d q[h, d] * k[s, h, d]  (VPU multiply-reduce)
    scores = jnp.sum(q[None] * scale * k, axis=-1)    # [s_blk, H]
    s_idx = sb * s_blk + jax.lax.broadcasted_iota(jnp.int32, (s_blk, 1), 0)
    valid = s_idx < length
    if past_context is not None:
        # same window as make_causal_bias: 0 <= q_pos - k_pos <= past_context
        # with q_pos == length - 1
        valid &= s_idx >= (length - 1 - past_context)
    scores = jnp.where(valid, scores, NEG_INF)

    m_prev = m_ref[...]                               # [1, H]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=0, keepdims=True))
    m_new = jnp.maximum(m_new, _M_FLOOR)
    alpha = jnp.exp(m_prev - m_new)                   # [1, H]
    e = jnp.exp(scores - m_new)                       # [s_blk, H]
    v = v_ref[0].astype(jnp.float32)                  # [s_blk, H, D]
    if quantized:
        v = v * vs_ref[0].astype(jnp.float32)[:, :, None]
    m_ref[...] = m_new
    l_ref[...] = l_ref[...] * alpha + jnp.sum(e, axis=0, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha[0][:, None] \
        + jnp.sum(e[:, :, None] * v, axis=0)          # [H, D]

    @pl.when(sb == n_blk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[...] / l_ref[...][0][:, None]).astype(o_ref.dtype)


def _pick_block(S: int, target: int = 512) -> int:
    """Largest divisor of S that is <= target (prefer multiples of 8)."""
    for cand in range(min(S, target), 0, -1):
        if S % cand == 0 and (cand % 8 == 0 or cand == S or cand < 8):
            return cand
    return S


@functools.partial(jax.jit, static_argnames=("past_context",))
def decode_attention(q: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                     length: jax.Array,
                     past_context: tp.Optional[int] = None,
                     k_scale: tp.Optional[jax.Array] = None,
                     v_scale: tp.Optional[jax.Array] = None) -> jax.Array:
    """Fused single-query attention over a static KV cache.

    q [B, H, D]; k_cache/v_cache [B, S, H, D]; length: scalar int32 count of
    valid cache slots (the current step is the last valid one).
    With an int8-quantized cache (`KVCache` dtype int8), pass the
    per-(step, head) `k_scale`/`v_scale` buffers ([B, S, H, 1] or [B, S, H]):
    dequantization happens inside the kernel, so HBM traffic stays int8.
    Returns [B, H, D] in q.dtype.

    Measured (v5e, B=512 S=512 H=16 D=64 int8): XLA's fused
    dequant+attention runs this shape at ~400 GB/s of int8 reads vs this
    kernel's ~61 GB/s — the (B, 1) grid gives one small VPU-bound program
    per batch row and no cross-row pipelining, so XLA stays the default
    backend (`modules/transformer.py:34`); the kernel is the building block
    for shapes XLA handles poorly (very long caches that blow the logits
    buffer, finite `past_context` windows over long S).
    """
    B, H, D = q.shape
    S = k_cache.shape[1]
    s_blk = _pick_block(S)
    n_blk = S // s_blk
    length_arr = jnp.full((1,), length, jnp.int32)
    # fail fast on half-specified quantization (a lone k_scale would only
    # crash later with an opaque AttributeError on v_scale.reshape)
    assert (k_scale is None) == (v_scale is None), \
        "pass both k_scale and v_scale or neither"
    quantized = k_scale is not None
    assert not quantized or k_cache.dtype == jnp.int8, \
        f"scales require int8 caches, got {k_cache.dtype}"
    # NOTE: CI exercises the quantized 3-D scale BlockSpec only through the
    # Pallas interpreter (interpret=True off-TPU); the Mosaic lowering of
    # the int8 path is covered by the TPU-marked test in
    # tests/ops/test_flash_attention.py (runs when a real TPU is attached)
    # and was measured on-chip 2026-08-18.
    kernel = functools.partial(_decode_attn_kernel, s_blk=s_blk, n_blk=n_blk,
                               past_context=past_context, quantized=quantized)
    kv_spec = pl.BlockSpec((1, s_blk, H, D), lambda b, s: (b, s, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, H, D), lambda b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        kv_spec,
        kv_spec,
    ]
    operands = [length_arr, q, k_cache, v_cache]
    if quantized:
        scale_spec = pl.BlockSpec((1, s_blk, H), lambda b, s: (b, s, 0),
                                  memory_space=pltpu.VMEM)
        in_specs += [scale_spec, scale_spec]
        operands += [k_scale.reshape(B, S, H), v_scale.reshape(B, S, H)]
    # Mosaic lowering is TPU-only; fall back to the Pallas interpreter on CPU
    # so the kernel stays testable on the host mesh.
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        kernel,
        grid=(B, n_blk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, D), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, H), jnp.float32),   # running max
            pltpu.VMEM((1, H), jnp.float32),   # running denom
            pltpu.VMEM((H, D), jnp.float32),   # running numerator
        ],
        interpret=interpret,
    )(*operands)
