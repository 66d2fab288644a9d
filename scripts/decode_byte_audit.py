"""Decode-step byte audit (VERDICT r4 next-round #3).

Reconciles the two previously-committed utilization claims:

  * BENCH_r04 extra `decode_hbm_bw_utilization: 0.837` — computed in
    bench.py by ASSUMING every decode step reads the FULL final-length KV
    buffers. With the default bucketed cache growth (0.375, 0.625, 1.0)
    the true sum-over-steps KV traffic is only
    sum_i (f_i - f_{i-1}) * f_i = 0.672x that assumption, so 0.837 was an
    over-credit, not a measurement.
  * scripts/bench_kv_layout.py: isolated int8 KV streaming reads reach
    ~615 GB/s on this v5e chip (75% of the 819 GB/s public peak) — the
    ACHIEVABLE ceiling for this access pattern, not a deficiency.

This script measures the three components of the headline loop separately
(T5 text encode, LM decode scan, codec decode), prints a bytes/step table
for the scan (int8 KV reads with the real bucket schedule, bf16 weight
streams, activations), and the implied bandwidth against the 615 GB/s
achievable ceiling. Run on the TPU chip:

    python scripts/decode_byte_audit.py

Findings land in README.md's "Decode byte audit" section.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.argv = ["bench"]

import numpy as np

import bench  # noqa: E402  (repo-root bench.py)

V5E_PEAK = bench.V5E_HBM_GBPS * 1e9
ACHIEVABLE = 615e9  # measured: scripts/bench_kv_layout.py (int8 KV streams)


def main():
    jax = bench._setup_jax()
    import jax.numpy as jnp
    from audiocraft_tpu.models import lm as lm_mod
    from audiocraft_tpu.models.lm import GenParams, init_lm_params
    from audiocraft_tpu.models.presets import musicgen_lm
    from audiocraft_tpu.modules.t5 import T5Encoder, T5EncoderConfig

    B = bench.B
    S = int(bench.DURATION * bench.FRAME_RATE)
    model = musicgen_lm("small", n_q=4, card=2048, dtype=jnp.bfloat16)
    params = init_lm_params(model, jax.random.PRNGKey(0), seq_len=4)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))

    t5 = T5Encoder(T5EncoderConfig.for_model("t5-base"), dtype=jnp.bfloat16)
    tok = jax.random.randint(jax.random.PRNGKey(3), (B, 12), 0, 32128)
    tmask = jnp.ones((B, 12), jnp.int32)
    t5_params = jax.jit(t5.init)(jax.random.PRNGKey(4), tok, tmask)
    out_proj = jax.random.normal(jax.random.PRNGKey(5), (768, 1024),
                                 jnp.bfloat16) * 0.02

    @jax.jit
    def encode_text(t5_params, tok, tmask):
        emb = t5.apply(t5_params, tok, tmask).astype(jnp.bfloat16) @ out_proj
        return (jnp.concatenate([emb, jnp.zeros_like(emb)], 0),
                jnp.concatenate([tmask, jnp.zeros_like(tmask)], 0))

    gen = GenParams(use_sampling=True, temp=1.0, top_k=250, cfg_coef=3.0)
    ct = {"description": encode_text(t5_params, tok, tmask)}

    def scan_only(seed):
        return lm_mod.generate(
            model, params, jax.random.PRNGKey(seed), conditions=[],
            condition_tensors=ct, num_samples=B, max_gen_len=S, gen=gen,
            cache_dtype=jnp.int8)

    # ---- measure the LM decode scan alone (codec + T5 excluded)
    bench._drain(scan_only(0))  # compile
    ts = []
    for i in range(1, 4):
        t0 = time.time()
        bench._drain(scan_only(i))
        ts.append(time.time() - t0)
    scan_dt = float(np.mean(ts))

    # ---- measure T5 alone
    bench._drain(encode_text(t5_params, tok, tmask)[0])
    t0 = time.time()
    for _ in range(3):
        bench._drain(encode_text(t5_params, tok, tmask)[0])
    t5_dt = (time.time() - t0) / 3

    # ---- bytes/step table for the scan
    fracs = lm_mod._CACHE_GROWTH_FRACS
    n_layers, dim = 24, 1024
    Sx = S + 12  # cross/prepend slack kept in the cache buffers
    # int8 KV reads, real bucket schedule: steps in segment i read an
    # f_i-sized buffer; segment i covers (f_i - f_{i-1}) * S steps.
    kv_read_factor = sum(
        (f - (fracs[j - 1] if j else 0.0)) * f for j, f in enumerate(fracs))
    kv_bytes = S * kv_read_factor * (2 * B) * Sx * n_layers * 2 * dim
    # bf16 weights stream once per step (weight-stationary would need all
    # 0.84 GB resident in 128 MB of VMEM -- not possible; XLA streams them)
    w_bytes = S * n_params * 2
    # int8 KV writes: one slot per layer per step
    kvw_bytes = S * (2 * B) * n_layers * 2 * dim
    # activations: [2B, 1, dim] residual stream x ~6 rw per layer (bf16)
    act_bytes = S * (2 * B) * dim * 2 * 6 * n_layers
    # sampling: logits [B, 4, card] f32 + top-k
    logit_bytes = S * B * 4 * 2048 * 4 * 2
    total = kv_bytes + w_bytes + kvw_bytes + act_bytes + logit_bytes

    audit = {
        "scan_sec": round(scan_dt, 3),
        "t5_sec": round(t5_dt, 4),
        "bucket_fracs": list(fracs),
        "kv_read_factor_vs_full": round(kv_read_factor, 3),
        "bytes_per_gen_GB": {
            "kv_reads_int8": round(kv_bytes / 1e9, 1),
            "weight_streams_bf16": round(w_bytes / 1e9, 1),
            "kv_writes_int8": round(kvw_bytes / 1e9, 1),
            "activations_bf16": round(act_bytes / 1e9, 1),
            "sampling_logits_f32": round(logit_bytes / 1e9, 1),
            "total": round(total / 1e9, 1),
        },
        "achieved_GBps": round(total / scan_dt / 1e9, 1),
        "achieved_vs_peak": round(total / scan_dt / V5E_PEAK, 3),
        "achieved_vs_achievable_615GBps": round(
            total / scan_dt / ACHIEVABLE, 3),
        "scan_floor_sec_at_615GBps": round(total / ACHIEVABLE, 2),
        "headline_scan_share_estimate": round(
            (total / ACHIEVABLE) / scan_dt, 3),
    }
    print(json.dumps(audit, indent=1), flush=True)


if __name__ == "__main__":
    main()
