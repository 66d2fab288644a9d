"""Measured exploration: int8 weight streaming for small-batch AR decode.

Small-batch decode latency is weight-streaming-bound (musicgen-small streams
~600 MB of bf16 per step; B=1 p50 is 1.03 s/10 s clip). This script times the
three candidate int8 formulations on the real chip with the checksum-drain
completion barrier (see bench.py `_drain`). Run: `python scripts/bench_int8_weights.py`.

Findings (v5e, 2026-08-18, L=16 pairs = 32 [2048x8192] weights = 1 GB bf16
streamed per iteration,
B=8 matvec chain with a tanh between every matmul so XLA cannot reassociate
the dot chain out of the scan):

1. bf16 baseline:                 3.07 ms/iter (~350 GB/s effective HBM read)
2. weight-only int8, dequantized in XLA before the dot
   (`w_i8.astype(bf16) * scale` under an optimization_barrier inside the
   scan body):                    11.8 ms/iter — 3.7x SLOWER. XLA does NOT
   fuse the dequant into a dot operand on TPU; it materializes the bf16
   copy in HBM (int8 read + bf16 write + bf16 read back per use).
3. W8A8: dynamic per-row activation quant + native int8xint8
   `lax.dot_general(..., preferred_element_type=int32)` + f32 rescale:
                                  2.46 ms/iter — 1.25x faster than bf16.
   The MXU consumes the int8 weights directly from HBM (no dequant
   materialization); the win is capped by the VPU cost of the dynamic
   activation quant + output rescale. maxdiff vs bf16 through the tanh
   chain: 1.7e-2.

Conclusion recorded for the serving path: the only int8 weight formulation
that wins on TPU through XLA is W8A8 via a native int8 dot (candidate +25%
on B=1 latency, with W8A8 quality validation needed before it can default);
weight-only int8 requires a custom pallas matvec kernel with in-VMEM dequant
to avoid the materialization penalty, and pallas decode kernels measured so
far on this chip (see ops/flash_attention.py docstring) run well below
XLA's effective bandwidth, so that path is not free either.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

M, N = 2048, 8192
L = 16      # 16 pairs x 32 MB bf16 = 1 GB streamed per iteration
ITERS = 20


def drain(a):
    return float(np.asarray(jnp.sum(a.astype(jnp.float32))))


def quantize(w):
    # eps floor matches the activation-quant guard: an all-zero column must
    # quantize to zeros, not 0/0 = NaN
    s = (jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-8)
         / 127.0).astype(jnp.float32)
    return jnp.round(w.astype(jnp.float32) / s).astype(jnp.int8), s.astype(jnp.bfloat16)


def qmm_w8a8(c, wi, s):
    cs = jnp.max(jnp.abs(c), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    cq = jnp.round(c.astype(jnp.float32) / jnp.maximum(cs, 1e-8)).astype(jnp.int8)
    acc = jax.lax.dot_general(cq, wi, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * cs * s.astype(jnp.float32)).astype(jnp.bfloat16)


def bench(f, *a, n=5):
    drain(f(*a))
    t0 = time.time()
    for _ in range(n):
        drain(f(*a))
    return (time.time() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    ws = [jax.random.normal(jax.random.fold_in(key, i), (M, N), jnp.bfloat16) / 64
          for i in range(L)]
    ws2 = [jax.random.normal(jax.random.fold_in(key, 100 + i), (N, M), jnp.bfloat16) / 64
           for i in range(L)]
    wq = [quantize(w) for w in ws]
    wq2 = [quantize(w) for w in ws2]
    x = jax.random.normal(key, (8, M), jnp.bfloat16)

    @jax.jit
    def scan_bf16(x, ws, ws2):
        def body(c, _):
            for w, w2 in zip(ws, ws2):
                c = jnp.tanh(c @ w)
                c = jnp.tanh(c @ w2)
            return c, None
        return jax.lax.scan(body, x, None, length=ITERS)[0]

    @jax.jit
    def scan_dequant(x, wq, wq2):
        def body(c, _):
            for (wi, s), (wi2, s2) in zip(wq, wq2):
                wi, s, wi2, s2 = jax.lax.optimization_barrier((wi, s, wi2, s2))
                c = jnp.tanh(c @ (wi.astype(jnp.bfloat16) * s))
                c = jnp.tanh(c @ (wi2.astype(jnp.bfloat16) * s2))
            return c, None
        return jax.lax.scan(body, x, None, length=ITERS)[0]

    @jax.jit
    def scan_w8a8(x, wq, wq2):
        def body(c, _):
            for (wi, s), (wi2, s2) in zip(wq, wq2):
                c = jnp.tanh(qmm_w8a8(c, wi, s))
                c = jnp.tanh(qmm_w8a8(c, wi2, s2))
            return c, None
        return jax.lax.scan(body, x, None, length=ITERS)[0]

    bytes_bf = 2 * L * M * N * 2
    bytes_i8 = 2 * L * M * N
    t_bf = bench(scan_bf16, x, ws, ws2)
    print(f"bf16:          {t_bf / ITERS * 1e3:7.3f} ms/iter "
          f"({bytes_bf * ITERS / t_bf / 1e9:.0f} GB/s)")
    t_dq = bench(scan_dequant, x, wq, wq2)
    print(f"int8 dequant:  {t_dq / ITERS * 1e3:7.3f} ms/iter "
          f"({bytes_i8 * ITERS / t_dq / 1e9:.0f} GB/s int8)  "
          f"{t_bf / t_dq:.2f}x vs bf16")
    t_q = bench(scan_w8a8, x, wq, wq2)
    print(f"w8a8 int8 dot: {t_q / ITERS * 1e3:7.3f} ms/iter "
          f"({bytes_i8 * ITERS / t_q / 1e9:.0f} GB/s int8)  "
          f"{t_bf / t_q:.2f}x vs bf16")
    y1 = scan_bf16(x, ws, ws2)
    y2 = scan_w8a8(x, wq, wq2)
    print("w8a8 maxdiff vs bf16:",
          float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32)))))


if __name__ == "__main__":
    main()
