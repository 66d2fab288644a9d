"""Measured exploration: KV-cache memory layout on TPU (int8 decode reads).

Hypothesis (REFUTED — measured 2026-08-19 on v5e, see below): the decode KV
cache stored `[B, S, H, D=64]` wastes HBM bandwidth because the TPU tiles
the minor two dims — int8 tiles are (32 sublanes, 128 lanes) and D=64 only
fills half the lanes. Storing K/V as `[B, H, D, S]` (S minor,
512 % 128 == 0) would tile perfectly while the decode-attention einsums
stay MXU-shaped with dequant on logits/probs (O(BHS), not O(BSHD)):

    scores[b,h,s] = (sum_d q[b,h,d] * k_i8[b,h,d,s]) * ks[b,h,s]
    out[b,h,d]    = sum_s (p[b,h,s] * vs[b,h,s]) * v_i8[b,h,d,s]

Findings (headline shape B=512/S=512/H=16/D=64):
  1. NO allocation padding in either layout (on_device_size == nominal for
     int8 and bf16, both orders; even the [B,S,H,1] scale buffer) — XLA's
     layout assignment already handles the D=64 minor dim.
  2. In a 64-step scan (dispatch amortized — single-call timings here are
     swamped by ~40-50 ms of tunnel RTT), bshd attention reads at
     615 GB/s nominal (75% of the 819 GB/s v5e peak) and bhds at 648 GB/s:
     a 1.05x difference, not worth re-plumbing the cache, the growth
     padding, and the Pallas kernel. The current layout stays.

Conclusion parallels scripts/bench_int4_kv.py: the int8 [B,S,H,D] cache +
XLA fusion is already near the decode roofline; remaining headline headroom
is in the non-attention ~25% of the step, not the cache reads.

Run: `python scripts/bench_kv_layout.py`
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

B, S, H, D = 512, 512, 16, 64
L = 6  # layers' worth of buffers per timed iteration (fit HBM comfortably)


def drain(x):
    """True completion barrier on the axon platform: a 4-byte checksum
    fetch (block_until_ready does NOT reliably block here — see bench.py
    `_drain`; timing with it reads ~0.03 ms for GB-scale reads)."""
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def timeit(fn, n=10):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts))


def report_alloc(shape, dtype):
    x = jnp.zeros(shape, dtype)
    jax.block_until_ready(x)
    nominal = int(np.prod(shape)) * jnp.dtype(dtype).itemsize
    actual = None
    for probe in ("on_device_size_in_bytes",):
        try:
            actual = getattr(x, probe)()
            break
        except Exception:
            try:
                actual = x.device_buffer.on_device_size_in_bytes()
                break
            except Exception:
                pass
    print(f"  {shape} {dtype.__name__}: nominal {nominal/2**20:.1f} MiB, "
          f"device {(actual or float('nan'))/2**20:.1f} MiB "
          f"(pad x{(actual/nominal) if actual else float('nan'):.2f})")
    del x


def main():
    key = jax.random.PRNGKey(0)
    print("== allocation padding ==")
    report_alloc((B, S, H, D), jnp.int8)     # current layout
    report_alloc((B, H, D, S), jnp.int8)     # proposed layout
    report_alloc((B, S, H, D), jnp.bfloat16)
    report_alloc((B, H, D, S), jnp.bfloat16)
    report_alloc((B, S, H, 1), jnp.bfloat16)  # current scale layout
    report_alloc((B, H, S), jnp.bfloat16)     # proposed scale layout

    # NOTE: per-call timings on this platform are dominated by ~40-50 ms of
    # tunnel dispatch RTT (measured: a 6-buffer attention step "took" 48 ms
    # while the real 24-layer decode does the same per-layer work in
    # ~0.85 ms/layer inside a scan). Every timed region below therefore
    # runs ITERS steps inside ONE jit (lax.scan) so dispatch amortizes.
    ITERS = 64

    print(f"== decode-attention {ITERS}-step scan (L={L} layers/step) ==")
    q0 = jax.random.normal(key, (B, H, D), jnp.bfloat16)

    # current: k/v [B,S,H,D] int8, scales [B,S,H,1] bf16
    ks = [jax.random.randint(jax.random.fold_in(key, 100 + i),
                             (B, S, H, D), -127, 127, jnp.int8)
          for i in range(L)]
    vs = [jax.random.randint(jax.random.fold_in(key, 200 + i),
                             (B, S, H, D), -127, 127, jnp.int8)
          for i in range(L)]
    sc = [jnp.abs(jax.random.normal(jax.random.fold_in(key, 300 + i),
                                    (B, S, H, 1), jnp.bfloat16)) + 0.01
          for i in range(L)]

    @jax.jit
    def attn_bshd(q0, ks, vs, sc):
        def step(q, i):
            out = jnp.zeros_like(q)
            for k, v, s in zip(ks, vs, sc):
                kf = k.astype(jnp.bfloat16) * s
                vf = v.astype(jnp.bfloat16) * s
                logits = jnp.einsum("bhd,bshd->bhs", q, kf)
                p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                out = out + jnp.einsum("bhs,bshd->bhd",
                                       p.astype(jnp.bfloat16), vf)
            # feed output back in so steps can't be parallelized away
            return out / (1e-6 + jnp.max(jnp.abs(out))), None
        q, _ = jax.lax.scan(step, q0, jnp.arange(ITERS))
        return q

    dt = timeit(lambda: drain(attn_bshd(q0, ks, vs, sc)), n=5)
    bytes_nom = ITERS * L * (2 * B * S * H * D + B * S * H * 2)
    print(f"  bshd: {dt*1e3:.1f} ms -> {bytes_nom/dt/1e9:.0f} GB/s nominal")

    # proposed: k/v [B,H,D,S] int8, scales [B,H,S] bf16
    ks2 = [jnp.transpose(k, (0, 2, 3, 1)) for k in ks]
    vs2 = [jnp.transpose(v, (0, 2, 3, 1)) for v in vs]
    sc2 = [jnp.transpose(s[..., 0], (0, 2, 1)) for s in sc]

    @jax.jit
    def attn_bhds(q0, ks, vs, sc):
        def step(q, i):
            out = jnp.zeros_like(q)
            for k, v, s in zip(ks, vs, sc):
                # dequant applied to logits/probs instead of K/V elements:
                # logits[b,h,s] = (sum_d q k_int8) * scale[b,h,s]
                logits = jnp.einsum("bhd,bhds->bhs", q,
                                    k.astype(jnp.bfloat16)) * s
                p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                pv = (p.astype(jnp.bfloat16) * s)
                out = out + jnp.einsum("bhs,bhds->bhd", pv,
                                       v.astype(jnp.bfloat16))
            return out / (1e-6 + jnp.max(jnp.abs(out))), None
        q, _ = jax.lax.scan(step, q0, jnp.arange(ITERS))
        return q

    dt2 = timeit(lambda: drain(attn_bhds(q0, ks2, vs2, sc2)), n=5)
    print(f"  bhds: {dt2*1e3:.1f} ms -> {bytes_nom/dt2/1e9:.0f} GB/s nominal")
    print(f"  speedup bhds/bshd: {dt/dt2:.2f}x")


if __name__ == "__main__":
    main()
