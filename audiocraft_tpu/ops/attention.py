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
from jax.ad_checkpoint import checkpoint_name

# Training/prefill attention backend: "auto" routes causal self-attention
# with no extra bias through the Pallas TPU flash-attention kernel (fwd +
# custom-VJP bwd, jax.experimental.pallas.ops.tpu.flash_attention) when on
# TPU and the sequence is long enough to matter; "xla" forces the
# einsum+softmax path (always used on CPU and for biased/short cases).
#
# Default is "xla": MEASURED on v5e (2026-08-19, TB=16, T=1500, 24 layers):
#   full-remat + xla attention   0.241 useful-MFU   <- production default
#   full-remat + flash kernel    0.163 useful-MFU   (the kernel's internal
#       bwd recompute stacks on the layer remat's recompute: attention work
#       is done ~3x instead of ~2x)
#   no-remat / dots-remat + flash: would avoid that double recompute and
#       never materialize the [B, H, T, T] logits, but the 24-layer T=1500
#       training program with the custom-VJP kernel crashes this image's
#       remote-compile helper (HTTP 500), so it is unbuildable here.
# The kernel itself is numerically verified fwd+grad against the XLA path
# (tests/ops/test_flash_attention.py::
#  test_flash_causal_train_fwd_and_grad_parity_on_tpu); opt in with
# set_train_attention_backend("auto") on stacks where the lighter-remat
# configs compile.
_TRAIN_ATTENTION_BACKEND = "xla"
_FLASH_MIN_SEQ = 256


def set_train_attention_backend(backend: str = "xla") -> None:
    """Select the training/prefill attention backend ('auto' | 'xla').

    Takes effect at TRACE time only (like `set_efficient_attention_backend`):
    functions already jit-compiled keep the backend captured when they were
    traced, so set this before the first `model.apply`/train-step call —
    flipping it mid-session does not retrace cached programs.
    """
    global _TRAIN_ATTENTION_BACKEND
    assert backend in ("auto", "xla"), backend
    _TRAIN_ATTENTION_BACKEND = backend


def flash_causal_eligible(q_len: int, k_len: int, head_dim: int) -> bool:
    """True when the Pallas flash kernel serves this full-sequence causal
    self-attention: TPU backend, square q/k (no cache offset), long enough
    that kernel launch overhead pays for itself, lane-friendly head dim."""
    return (_TRAIN_ATTENTION_BACKEND == "auto"
            and q_len == k_len
            and q_len >= _FLASH_MIN_SEQ
            and head_dim % 64 == 0
            and jax.default_backend() == "tpu")


def flash_causal_attention(q: jax.Array, k: jax.Array,
                           v: jax.Array) -> jax.Array:
    """Causal flash attention on [B, T, H, D] tensors via the Pallas TPU
    kernel. T is right-padded to a 128 multiple: pad keys sit AFTER every
    real query so the causal mask already excludes them (no segment ids
    needed), and pad-query outputs are sliced off; their gradients are
    exactly zero for the same reason."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention)
    B, T, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    Tp = -(-T // 128) * 128
    pad = Tp - T

    def to_bhtd(x):
        x = jnp.moveaxis(x, 1, 2)  # [B, H, T, D]
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x

    block = BlockSizes.get_default(B, H, Tp, Tp, D)
    out = flash_attention(to_bhtd(q), to_bhtd(k), to_bhtd(v), causal=True,
                          sm_scale=scale, block_sizes=block)
    # Tag for remat policies: under jax.checkpoint the custom-VJP output is
    # not a dot, so dots_saveable would recompute the whole kernel in
    # backward (stacking its internal recompute on the layer remat's — the
    # measured 0.163-MFU failure mode). The 'dots' checkpointing policy
    # saves this name instead (modules/transformer.py DOTS_REMAT_POLICY).
    out = checkpoint_name(out, "flash_attn_out")
    return jnp.moveaxis(out[:, :, :T], 2, 1)


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
                          as_float32: bool = True,
                          dropout_rate: float = 0.0,
                          dropout_rng: tp.Optional[jax.Array] = None
                          ) -> jax.Array:
    """Scaled dot-product attention, softmax in f32.

    bias broadcasts against [B, H, Tq, Tk] (2d/3d accepted). With
    `dropout_rate > 0` and a `dropout_rng`, attention weights are dropped
    (inverted dropout) after softmax — the reference's attention-probs
    dropout (`transformer.py:411,436`).
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
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, w.shape)
        w = jnp.where(keep, w / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(compute), v.astype(compute),
                     preferred_element_type=compute)
    return out.astype(out_dtype)
