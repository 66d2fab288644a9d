"""Micro-benchmark: int4-packed KV cache for decode attention.

The headline decode is HBM-bandwidth-bound on KV-cache reads (~80% of the
per-step bytes at B=256 CFG-doubled; see bench.py decode_hbm_bw_utilization).
int8 KV already halves traffic vs bf16 because XLA fuses the
`convert+multiply` dequant into the attention dot's operand read (the int8
buffer is what streams from HBM). This script measures whether packing TWO
int4 values per int8 byte keeps that fusion — halving cache traffic again.

Layout trick: a concat/interleave of unpacked nibbles would materialize a
bf16 tensor in HBM and kill the win (the measured failure mode of weight-only
int8, scripts/bench_int8_weights.py). Instead the two nibbles hold two
*planes* of the head dim — low nibble = dims [0:D/2), high nibble = dims
[D/2:D) — and the attention dot splits into two partial dots over D/2 that
read the SAME packed buffer with different elementwise unpack ops:

    scores = q[:, :D/2] . dequant_lo(packed) + q[:, D/2:] . dequant_hi(packed)

Each unpack (shift + convert + scale) is elementwise over the packed buffer,
so XLA can fuse it into each dot's operand read; no unpacked tensor ever
exists in HBM.

Variants at the headline decode shape (B=512 CFG-doubled, H=16, S=512, D=64,
one layer, 500-step lax.scan so per-step overheads amortize like production):
  bf16   : plain cache
  int8   : current production path (per-(step,head) scales)
  int4   : packed nibble planes, per-(step,head,plane) scales

Run: python scripts/bench_int4_kv.py  (TPU; CPU works for correctness only)

FINDING (v5e, 2026-08-18): the fusion does NOT survive. XLA materializes
the unpacked planes (int4 path measured ~242 GB/s effective vs int8's
~670 GB/s) — the shift/mask nibble unpack is not treated as a fusible
dot-operand elementwise op the way `convert+multiply` is. A hand-written
Pallas kernel that unpacks in VMEM was the follow-up
(`scripts/pallas_int4_decode.py`) and also loses (0.43x int8, and int4-K
quantization error is 12x int8's); int8 stays the production KV format.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B, H, S, D = 512, 16, 512, 64
STEPS = 500
LAYERS = 1  # per-layer numbers; production multiplies by 24


def quant_int8(k):
    s = jnp.max(jnp.abs(k), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    return jnp.round(k / s).astype(jnp.int8), s.astype(jnp.bfloat16)


def quant_int4_packed(k):
    """[..., D] bf16 -> ([..., D//2] int8 packed, [..., 2] bf16 plane scales).

    low nibble <- dims [0:D/2), high nibble <- dims [D/2:D); symmetric
    per-plane scales into [-7, 7] (avoid -8 so negation stays in range).
    """
    lo, hi = k[..., : D // 2], k[..., D // 2:]
    s_lo = jnp.maximum(jnp.max(jnp.abs(lo), axis=-1, keepdims=True) / 7.0, 1e-8)
    s_hi = jnp.maximum(jnp.max(jnp.abs(hi), axis=-1, keepdims=True) / 7.0, 1e-8)
    q_lo = jnp.clip(jnp.round(lo / s_lo), -7, 7).astype(jnp.int8)
    q_hi = jnp.clip(jnp.round(hi / s_hi), -7, 7).astype(jnp.int8)
    packed = ((q_hi << 4) | (q_lo & 0xF)).astype(jnp.int8)
    scales = jnp.concatenate([s_lo, s_hi], -1).astype(jnp.bfloat16)
    return packed, scales


def unpack_lo(packed, dtype):
    # sign-extend the low nibble: shift into the high bits, arithmetic-shift
    # back down. Pure elementwise -> fusible into a dot operand read.
    return ((packed << 4) >> 4).astype(dtype)


def unpack_hi(packed, dtype):
    return (packed >> 4).astype(dtype)


def attn_bf16(q, k, v, bias):
    s = jnp.einsum("bhd,bshd->bhs", q, k) / np.sqrt(D)
    p = jax.nn.softmax(s.astype(jnp.float32) + bias, -1).astype(q.dtype)
    return jnp.einsum("bhs,bshd->bhd", p, v)


def attn_int8(q, k8, ks, v8, vs, bias):
    k = k8.astype(q.dtype) * ks.astype(q.dtype)
    v = v8.astype(q.dtype) * vs.astype(q.dtype)
    return attn_bf16(q, k, v, bias)


def attn_int4(q, k4, ks, v4, vs, bias):
    dt = q.dtype
    q_lo, q_hi = q[..., : D // 2], q[..., D // 2:]
    ks_lo, ks_hi = ks[..., :1].astype(dt), ks[..., 1:].astype(dt)
    s = (jnp.einsum("bhd,bshd->bhs", q_lo, unpack_lo(k4, dt) * ks_lo)
         + jnp.einsum("bhd,bshd->bhs", q_hi, unpack_hi(k4, dt) * ks_hi))
    s = s / np.sqrt(D)
    p = jax.nn.softmax(s.astype(jnp.float32) + bias, -1).astype(dt)
    vs_lo, vs_hi = vs[..., :1].astype(dt), vs[..., 1:].astype(dt)
    o_lo = jnp.einsum("bhs,bshd->bhd", p, unpack_lo(v4, dt) * vs_lo)
    o_hi = jnp.einsum("bhs,bshd->bhd", p, unpack_hi(v4, dt) * vs_hi)
    return jnp.concatenate([o_lo, o_hi], -1)


def make_scan(attn, cache_args):
    """500-step scan over pure attention reads (cache static: we measure the
    read path, which is where the bytes are; writes touch 1/S of the buffer)."""

    @jax.jit
    def run(q0, bias, *cache):
        def step(carry, i):
            out = attn(carry, *cache, bias)
            # feed output back so steps can't be batched/hoisted
            return (out / (1.0 + jnp.float32(1e-6))).astype(carry.dtype), ()

        final, _ = jax.lax.scan(step, q0, jnp.arange(STEPS))
        return jnp.sum(final.astype(jnp.float32))

    return run


def timeit(fn, *args, iters=5):
    fn(*args).block_until_ready()
    ts = []
    for _ in range(iters):
        t0 = time.time()
        fn(*args).block_until_ready()
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (B, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, D), jnp.bfloat16)
    bias = jnp.zeros((1, 1, S), jnp.float32)

    k8, k8s = quant_int8(k)
    v8, v8s = quant_int8(v)
    k4, k4s = quant_int4_packed(k)
    v4, v4s = quant_int4_packed(v)

    # correctness: int4 attention vs bf16 (f32 reference on the same inputs)
    o_ref = attn_bf16(q, k, v, bias)
    o_i8 = attn_int8(q, k8, k8s, v8, v8s, bias)
    o_i4 = attn_int4(q, k4, k4s, v4, v4s, bias)
    scale = float(jnp.max(jnp.abs(o_ref)))
    err8 = float(jnp.max(jnp.abs(o_i8 - o_ref))) / scale
    err4 = float(jnp.max(jnp.abs(o_i4 - o_ref))) / scale
    print(f"rel err vs bf16: int8 {err8:.4f}  int4 {err4:.4f}")

    results = {}
    for name, attn, cache in [
        ("bf16", attn_bf16, (k, v)),
        ("int8", attn_int8, (k8, k8s, v8, v8s)),
        ("int4", attn_int4, (k4, k4s, v4, v4s)),
    ]:
        run = make_scan(attn, cache)
        dt = timeit(run, q, bias, *cache)
        kv_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in cache)
        gbps = STEPS * kv_bytes / dt / 1e9
        results[name] = (dt, gbps)
        print(f"{name:5s}: {dt*1e3:8.1f} ms / {STEPS} steps   "
              f"cache {kv_bytes/1e6:7.1f} MB   eff {gbps:7.1f} GB/s")
    sp8 = results["bf16"][0] / results["int8"][0]
    sp4 = results["bf16"][0] / results["int4"][0]
    sp48 = results["int8"][0] / results["int4"][0]
    print(f"speedup vs bf16: int8 {sp8:.2f}x  int4 {sp4:.2f}x  "
          f"(int4 vs int8 {sp48:.2f}x)")


if __name__ == "__main__":
    main()
