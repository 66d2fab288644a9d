"""Prototype: int4-packed KV decode attention as a bandwidth-oriented Pallas
TPU kernel.

Why: the AR decode headline is HBM-bound on KV-cache reads. The production
int8 path lets XLA fuse `convert*scale` into the attention dot and achieves
~670 GB/s effective on v5e; int4 nibble-unpacking (shift/mask) does NOT fuse
into XLA dot operands (measured 242 GB/s, scripts/bench_int4_kv.py), so
halving the traffic again needs a kernel that unpacks in VMEM.

Design notes (the interesting bits):
- K cache packed [B, S, H*D/2] int8: one byte = two SIGNED nibbles, low
  nibble = head-dim plane [0, D/2), high nibble = plane [D/2, D). Column
  order is (h, d2) = h*D/2 + d2.
- scores stay on the MXU via a BLOCK-DIAGONAL query matrix: with
  Qp[h*D/2+d2, h] = q[h, plane*D/2+d2] (zeros off-group),
  dot(unpack_p(K), Qp)[s, h] contracts exactly head h's columns — so the
  per-(step, head, plane) dequant scale commutes with the dot and is applied
  AFTER it as a cheap [s_blk, H] multiply. No per-element scale broadcast.
- V cache stored TRANSPOSED [B, H*D/2, S] so the output reduction is also an
  MXU matmul: dot(unpack_p(V_T), g_p) with g_p[s, h] = e[s, h] * vs_p[s, h]
  gives [H*D/2, H]; the useful entries are the group diagonal, selected once
  at finalize (15/16 of those MXU FLOPs are wasted, but FLOPs are free here
  — the kernel is bandwidth-bound).
- Per packed byte the VPU does only widen+shift+convert (~5 ops); everything
  O(s_blk * H*D) heavy is MXU. Online-softmax (m, l, ACC) state in VMEM
  scratch across S-blocks.

Run `python scripts/pallas_int4_decode.py` for correctness (CPU interpreter
or TPU) + on-TPU timing vs the XLA int8/bf16 paths at the headline shape.

FINDINGS (v5e, 2026-08-18, B=512 H=16 S=512 D=64, 500-step scan):

    int4-pallas :  969.8 ms   cache  302.0 MB   eff  155.7 GB/s
    int8-xla    :  413.8 ms   cache  553.6 MB   eff  669.0 GB/s
    bf16-xla    :  769.2 ms   cache 1073.7 MB   eff  697.9 GB/s
    rel err vs f32:  int4 0.1753   int8 0.0139

int4 KV is a measured DEAD END on both axes, so the production path stays
int8 (`modules/transformer.py KVCache`):
- Speed: 0.43x the XLA int8 path. The (B, n_blk) grid runs one small
  program per batch row (~300 KB of operands each); per-program dispatch
  overhead dominates and the DMA never reaches streaming bandwidth —
  the same failure mode as the Pallas int8 decode kernel vs XLA
  (`ops/flash_attention.py` keeps XLA the default for the same reason).
  Blocking several batch rows per program would cut dispatches ~8x but
  multiplies the block-diagonal MXU waste by the row-block factor; the
  ceiling is int8's effective 669 GB/s on HALF the bytes, i.e. the kernel
  would need >4.3x the measured rate to merely tie.
- Quality: 4-bit K (15 levels, per-plane maxabs/7) puts 0.175 max rel
  error on attention outputs vs int8's 0.014 — softmax amplifies K-side
  quantization noise; int8 KV was validated at <1e-2 before shipping and
  int4 is an order of magnitude past that bar.
"""
import functools
import time
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

NEG_INF = -1e30
_M_FLOOR = -1e4


# ------------------------------------------------------------- pack / layout

def quant_pack_kv(k: jax.Array, v: jax.Array):
    """[B, S, H, D] bf16 pair -> int4-packed cache arrays.

    Returns (k4 [B, S, HD2], v4t [B, HD2, S], k_scale [B, S, 2, H],
    v_scale [B, S, 2, H]) with HD2 = H*D//2; scales are per
    (step, plane, head) symmetric maxabs/7.
    """
    B, S, H, D = k.shape

    def quant(x):
        lo, hi = x[..., : D // 2], x[..., D // 2:]
        planes = jnp.stack([lo, hi], axis=2)  # [B, S, 2, H, D/2]
        s = jnp.maximum(jnp.max(jnp.abs(planes), axis=-1) / 7.0, 1e-8)
        q = jnp.clip(jnp.round(planes / s[..., None]), -8, 7).astype(jnp.int8)
        packed = ((q[:, :, 1] << 4) | (q[:, :, 0] & 0xF)).astype(jnp.int8)
        return packed.reshape(B, S, H * D // 2), s.astype(jnp.bfloat16)

    k4, ks = quant(k)
    v4, vs = quant(v)
    return k4, v4.transpose(0, 2, 1), ks, vs


def make_block_diag_q(q: jax.Array, d_half: int):
    """q [B, H, D] -> (Qlo, Qhi) [B, H*D/2, H] block-diagonal bf16 with the
    1/sqrt(D) score scale folded in."""
    B, H, D = q.shape
    scale = 1.0 / np.sqrt(D)
    cols = jnp.arange(H * d_half) // d_half          # group(col) = head
    mask = (cols[:, None] == jnp.arange(H)[None, :])  # [HD2, H]
    lo = (q[..., :d_half] * scale).reshape(B, H * d_half)
    hi = (q[..., d_half:] * scale).reshape(B, H * d_half)
    qlo = jnp.where(mask[None], lo[:, :, None], 0).astype(jnp.bfloat16)
    qhi = jnp.where(mask[None], hi[:, :, None], 0).astype(jnp.bfloat16)
    return qlo, qhi


# ------------------------------------------------------------------- kernel

def _int4_decode_kernel(length_ref, qlo_ref, qhi_ref, k4_ref, v4t_ref,
                        ks_ref, vs_ref, o_ref,
                        m_ref, l_ref, acc_ref,
                        *, s_blk: int, n_blk: int, H: int, d_half: int,
                        past_context: tp.Optional[int]):
    """Grid (B, n_blk). Blocks: qlo/qhi [1, HD2, H]; k4 [1, s_blk, HD2];
    v4t [1, HD2, s_blk]; ks/vs [1, s_blk, 2, H]; out [1, 2, HD2] f32.
    Scratch: m/l [1, H] f32, acc [2, HD2] f32... acc held as [HD2, 2*H]
    (per-plane dot outputs side by side, group-diag selected at finalize).
    """
    sb = pl.program_id(1)

    @pl.when(sb == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _M_FLOOR)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    length = length_ref[0]

    # ---- unpack K block: [s_blk, HD2] bytes -> two bf16 nibble planes
    b32 = k4_ref[0].astype(jnp.int32)
    k_lo = ((b32 << 28) >> 28).astype(jnp.bfloat16)
    k_hi = (b32 >> 4).astype(jnp.bfloat16)

    # ---- scores on the MXU; per-(s, plane, head) scale applied post-dot
    qlo = qlo_ref[0]
    qhi = qhi_ref[0]
    dot_lo = jax.lax.dot_general(k_lo, qlo, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dot_hi = jax.lax.dot_general(k_hi, qhi, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    ks = ks_ref[0].astype(jnp.float32)                 # [s_blk, 2, H]
    scores = dot_lo * ks[:, 0] + dot_hi * ks[:, 1]     # [s_blk, H]

    s_idx = sb * s_blk + jax.lax.broadcasted_iota(jnp.int32, (s_blk, 1), 0)
    valid = s_idx < length
    if past_context is not None:
        valid &= s_idx >= (length - 1 - past_context)
    scores = jnp.where(valid, scores, NEG_INF)

    # ---- online softmax state
    m_prev = m_ref[...]                                # [1, H]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=0, keepdims=True))
    m_new = jnp.maximum(m_new, _M_FLOOR)
    alpha = jnp.exp(m_prev - m_new)                    # [1, H]
    e = jnp.exp(scores - m_new)                        # [s_blk, H] f32
    m_ref[...] = m_new
    l_ref[...] = l_ref[...] * alpha + jnp.sum(e, axis=0, keepdims=True)

    # ---- V contribution on the MXU: g_p = e * vs_p, acc_p += V_T_p @ g_p
    vb32 = v4t_ref[0].astype(jnp.int32)                # [HD2, s_blk]
    v_lo = ((vb32 << 28) >> 28).astype(jnp.bfloat16)
    v_hi = (vb32 >> 4).astype(jnp.bfloat16)
    vs = vs_ref[0].astype(jnp.float32)                 # [s_blk, 2, H]
    g_lo = (e * vs[:, 0]).astype(jnp.bfloat16)         # [s_blk, H]
    g_hi = (e * vs[:, 1]).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    contrib_lo = jax.lax.dot_general(v_lo, g_lo, dn,
                                     preferred_element_type=jnp.float32)
    contrib_hi = jax.lax.dot_general(v_hi, g_hi, dn,
                                     preferred_element_type=jnp.float32)
    contrib = jnp.concatenate([contrib_lo, contrib_hi], axis=1)  # [HD2, 2H]
    acc_ref[...] = acc_ref[...] * jnp.tile(alpha, (1, 2)) + contrib

    @pl.when(sb == n_blk - 1)
    def _finalize():
        # group-diagonal select: out_p[col] = acc[col, p*H + group(col)] / l
        cols = jax.lax.broadcasted_iota(jnp.int32, (acc_ref.shape[0], H), 0)
        grp = cols // d_half                           # [HD2, H]
        heads = jax.lax.broadcasted_iota(jnp.int32, (acc_ref.shape[0], H), 1)
        sel = (grp == heads).astype(jnp.float32)       # [HD2, H]
        l = l_ref[...][0]                              # [H]
        acc = acc_ref[...]
        out_lo = jnp.sum(acc[:, :H] * sel / l[None, :], axis=1)   # [HD2]
        out_hi = jnp.sum(acc[:, H:] * sel / l[None, :], axis=1)
        o_ref[0] = jnp.stack([out_lo, out_hi]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("past_context", "s_blk"))
def int4_decode_attention(q: jax.Array, k4: jax.Array, v4t: jax.Array,
                          k_scale: jax.Array, v_scale: jax.Array,
                          length: jax.Array,
                          past_context: tp.Optional[int] = None,
                          s_blk: int = 256) -> jax.Array:
    """Fused single-query attention over an int4-packed KV cache.

    q [B, H, D]; k4 [B, S, H*D/2] int8 packed; v4t [B, H*D/2, S] int8
    packed (transposed); scales [B, S, 2, H] bf16. Returns [B, H, D] q.dtype.
    """
    B, H, D = q.shape
    S = k4.shape[1]
    d_half = D // 2
    HD2 = H * d_half
    s_blk = min(s_blk, S)
    while S % s_blk:
        s_blk //= 2
    n_blk = S // s_blk
    qlo, qhi = make_block_diag_q(q, d_half)
    length_arr = jnp.full((1,), length, jnp.int32)

    kernel = functools.partial(_int4_decode_kernel, s_blk=s_blk, n_blk=n_blk,
                               H=H, d_half=d_half, past_context=past_context)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_blk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, HD2, H), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HD2, H), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, HD2), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HD2, s_blk), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, 2, H), lambda b, s: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, 2, H), lambda b, s: (b, s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, HD2), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, HD2), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, H), jnp.float32),
            pltpu.VMEM((1, H), jnp.float32),
            pltpu.VMEM((HD2, 2 * H), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(length_arr, qlo, qhi, k4, v4t, k_scale, v_scale)
    # [B, 2, HD2] -> [B, H, D]: plane p holds dims [p*D/2, (p+1)*D/2)
    return out.reshape(B, 2, H, d_half).transpose(0, 2, 1, 3).reshape(B, H, D)


# ---------------------------------------------------------------- harness

def reference_attention(q, k, v, length):
    B, H, D = q.shape
    S = k.shape[1]
    scores = jnp.einsum("bhd,bshd->bhs", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / np.sqrt(D)
    valid = jnp.arange(S)[None, None, :] < length
    scores = jnp.where(valid, scores, NEG_INF)
    p = jax.nn.softmax(scores, -1)
    return jnp.einsum("bhs,bshd->bhd", p, v.astype(jnp.float32))


def int8_xla_attention(q, k8, ks, v8, vs, length):
    """The production XLA path at the same shape (dequant fused into dot)."""
    B, H, D = q.shape
    S = k8.shape[1]
    k = k8.astype(q.dtype) * ks.astype(q.dtype)
    v = v8.astype(q.dtype) * vs.astype(q.dtype)
    scores = jnp.einsum("bhd,bshd->bhs", q, k).astype(jnp.float32) / np.sqrt(D)
    valid = jnp.arange(S)[None, None, :] < length
    scores = jnp.where(valid, scores, NEG_INF)
    p = jax.nn.softmax(scores, -1).astype(q.dtype)
    return jnp.einsum("bhs,bshd->bhd", p, v)


def main():
    B, H, D, S = 512, 16, 64, 512
    STEPS = 500
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        B, S, STEPS = 4, 64, 2
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)
    length = jnp.int32(S - S // 4)

    k4, v4t, ks, vs = quant_pack_kv(k, v)
    o4 = int4_decode_attention(q, k4, v4t, ks, vs, length)
    o_ref = reference_attention(q, k, v, length)
    scale = float(jnp.max(jnp.abs(o_ref)))
    err = float(jnp.max(jnp.abs(o4.astype(jnp.float32) - o_ref))) / scale
    print(f"int4 kernel rel err vs f32: {err:.4f}")

    k8 = jnp.round(k / (jnp.max(jnp.abs(k), -1, keepdims=True) / 127.0 + 1e-8)
                   ).astype(jnp.int8)
    ks8 = (jnp.max(jnp.abs(k), -1, keepdims=True) / 127.0).astype(jnp.bfloat16)
    v8 = jnp.round(v / (jnp.max(jnp.abs(v), -1, keepdims=True) / 127.0 + 1e-8)
                   ).astype(jnp.int8)
    vs8 = (jnp.max(jnp.abs(v), -1, keepdims=True) / 127.0).astype(jnp.bfloat16)
    o8 = int8_xla_attention(q, k8, ks8, v8, vs8, length)
    err8 = float(jnp.max(jnp.abs(o8.astype(jnp.float32) - o_ref))) / scale
    print(f"int8 XLA rel err vs f32: {err8:.4f}")
    if not on_tpu:
        print("CPU correctness only; run on TPU for timing")
        return

    # ---- timing: 500-step scan, cache static (read path = where the bytes
    # are); feed the output back so steps serialize.
    def scan_over(fn, q0, *cache):
        @jax.jit
        def run(q0, *cache):
            def step(carry, _):
                out = fn(carry, *cache)
                return out.astype(carry.dtype) * 1.0000001, ()
            final, _ = jax.lax.scan(step, q0, jnp.arange(STEPS))
            return jnp.sum(final.astype(jnp.float32))
        return run

    def timeit(run, *args, iters=5):
        run(*args).block_until_ready()
        ts = []
        for _ in range(iters):
            t0 = time.time()
            run(*args).block_until_ready()
            ts.append(time.time() - t0)
        return float(np.median(ts))

    results = {}
    run4 = scan_over(lambda qq, *c: int4_decode_attention(qq, *c, length),
                     q, k4, v4t, ks, vs)
    dt4 = timeit(run4, q, k4, v4t, ks, vs)
    bytes4 = (k4.size + v4t.size + 2 * ks.size + 2 * vs.size)
    results["int4-pallas"] = (dt4, bytes4)

    run8 = scan_over(lambda qq, *c: int8_xla_attention(qq, *c, length),
                     q, k8, ks8, v8, vs8)
    dt8 = timeit(run8, q, k8, ks8, v8, vs8)
    bytes8 = (k8.size + v8.size + 2 * ks8.size + 2 * vs8.size)
    results["int8-xla"] = (dt8, bytes8)

    runb = scan_over(lambda qq, kk_, vv_: reference_attention(
        qq, kk_, vv_, length).astype(jnp.bfloat16), q, k, v)
    dtb = timeit(runb, q, k, v)
    results["bf16-xla"] = (dtb, 2 * k.size + 2 * v.size)

    for name, (dt, nbytes) in results.items():
        gbps = STEPS * nbytes / dt / 1e9
        print(f"{name:12s}: {dt*1e3:8.1f} ms / {STEPS} steps   "
              f"cache {nbytes/1e6:7.1f} MB   eff {gbps:7.1f} GB/s")
    print(f"int4 vs int8 speedup: {dt8/dt4:.2f}x   "
          f"int4 vs bf16: {dtb/dt4:.2f}x")


if __name__ == "__main__":
    main()
