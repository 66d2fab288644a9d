"""Micro-proof for bench.py's `_drain` completion barrier.

bench.py times compute by reducing every output to a 4-byte checksum and
fetching it, on the claim that (a) `block_until_ready` does not actually
synchronize on the axon-tunneled TPU platform and (b) fetching full outputs
measures tunnel D2H bandwidth, not chip compute. This script measures both
claims directly on a compute-heavy graph and prints one JSON line:

  {"chain_matmuls": N, "t_block_until_ready_s": ..., "t_checksum_s": ...,
   "t_full_fetch_s": ..., "bytes_full_fetch": ...}

Interpretation: if block_until_ready were a real completion barrier,
t_block_until_ready ~= t_checksum (both wait for all compute; the checksum
adds one reduction + 4B transfer). t_block_until_ready << t_checksum means
it returned before the compute finished, i.e. it is NOT a barrier here and
timing with it would under-report. t_full_fetch >> t_checksum quantifies the
tunnel-D2H overhead excluded from the bench numbers.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_CHAIN = 64          # sequential matmuls -> seconds of MXU work
DIM = 4096


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (DIM, DIM), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (DIM, DIM), jnp.bfloat16)
    w = w / jnp.linalg.norm(w.astype(jnp.float32)).astype(jnp.bfloat16)

    @jax.jit
    def chain(x, w):
        def body(h, _):
            h = h @ w
            return h / (1e-6 + jnp.max(jnp.abs(h))), None
        h, _ = jax.lax.scan(body, x, None, length=N_CHAIN)
        return h

    chain(x, w).block_until_ready()  # compile
    checksum = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    _ = float(np.asarray(checksum(chain(x, w))))  # compile checksum

    t0 = time.time()
    out = chain(x, w)
    out.block_until_ready()
    t_block = time.time() - t0

    t0 = time.time()
    out = chain(x, w)
    _ = float(np.asarray(checksum(out)))
    t_checksum = time.time() - t0

    t0 = time.time()
    out = chain(x, w)
    host = np.asarray(out)
    t_fetch = time.time() - t0

    print(json.dumps({
        "chain_matmuls": N_CHAIN, "dim": DIM,
        "t_block_until_ready_s": round(t_block, 4),
        "t_checksum_s": round(t_checksum, 4),
        "t_full_fetch_s": round(t_fetch, 4),
        "bytes_full_fetch": int(host.nbytes),
        "platform": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
