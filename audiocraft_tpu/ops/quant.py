"""W8A8 int8 serving quantization for the LM decode path.

Small-batch AR decode is weight-streaming-bound (musicgen-small streams
~600 MB of bf16 weights per step). The only int8 weight formulation that
wins on TPU through XLA is W8A8 via a native int8 MXU dot
(`lax.dot_general(..., preferred_element_type=int32)`): weight-only int8
with an XLA dequant materializes a bf16 copy in HBM and runs 3.7x SLOWER
(measured, `scripts/bench_int8_weights.py`; 2026-08-18 v5e sweep: bf16
3.07 ms/iter vs W8A8 2.46 ms/iter = 1.25x on a 1 GB weight-stream chain).

Scheme: per-output-channel symmetric int8 weights (scale = colmax/127),
dynamic per-row symmetric int8 activations quantized on the fly, int32
accumulation on the MXU, f32 rescale. No reference counterpart — the
reference serves bf16/fp16 only (ref `models/lm.py:420-587`).

`QTensor` is a pytree that drops into a flax param tree in place of a 2-D+
kernel; matmul call-sites dispatch through `qdot`/`qdot_general` (plain
arrays take the unquantized path, so one code path serves both modes).
"""
import typing as tp

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class QTensor:
    """Per-output-channel symmetric int8 weight + dequant scale.

    w: int8 [..., d_in, d_out]; scale: f32 [..., 1, d_out].
    Supports the column slicing the fused-qkv attention uses
    (`in_proj_weight[:, :E]`), applied to weight and scale alike.
    """
    w: jax.Array
    scale: jax.Array

    @property
    def shape(self):
        return self.w.shape

    @property
    def ndim(self):
        return self.w.ndim

    def __getitem__(self, idx) -> "QTensor":
        return QTensor(w=self.w[idx], scale=self.scale[idx])


def quantize_weight(w: jax.Array) -> QTensor:
    """Per-output-channel symmetric int8 quantization (axis -2 = d_in is
    reduced). The max-abs scale is floored at 1e-8 so an all-zero column
    quantizes to zeros instead of 0/0 = NaN."""
    w32 = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w32), axis=-2, keepdims=True),
                    1e-8) / 127.0
    wq = jnp.round(w32 / s).astype(jnp.int8)
    return QTensor(w=wq, scale=s)


def quantize_acts(x: jax.Array) -> tp.Tuple[jax.Array, jax.Array]:
    """Dynamic per-row symmetric int8 activation quant: (x_int8, scale)."""
    xs = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                             keepdims=True), 1e-8) / 127.0
    xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
    return xq, xs


def w8a8_dot(x: jax.Array, qt: QTensor, out_dtype=None) -> jax.Array:
    """x [..., d_in] @ int8 weight [d_in, d_out] on the int8 MXU."""
    out_dtype = out_dtype or x.dtype
    xq, xs = quantize_acts(x)
    acc = jax.lax.dot_general(xq, qt.w, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    scale = qt.scale.reshape((1,) * (acc.ndim - 1) + (-1,))
    return (acc.astype(jnp.float32) * xs * scale).astype(out_dtype)


def qdot(x: jax.Array, w: tp.Union[jax.Array, QTensor],
         out_dtype=None) -> jax.Array:
    """x @ w with QTensor dispatch (the shared serving/training call-site)."""
    if isinstance(w, QTensor):
        return w8a8_dot(x, w, out_dtype=out_dtype)
    return x @ w.astype(out_dtype or x.dtype)


def w8a8_heads(x: jax.Array, qt: QTensor, out_dtype=None) -> jax.Array:
    """Per-codebook output heads: x [B, S, D] x int8 [K, D, C] -> [B, K, S, C]
    (the `bsd,kdc->bksc` einsum of `models/lm.py`) with one activation quant
    shared across the K heads."""
    out_dtype = out_dtype or x.dtype
    xq, xs = quantize_acts(x)
    # contract D: x dim 2 with w dim 1 -> [B, S, K, C]
    acc = jax.lax.dot_general(xq, qt.w, (((2,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * xs[..., None] * qt.scale[None, None, :, 0, :]
    return out.transpose(0, 2, 1, 3).astype(out_dtype)
