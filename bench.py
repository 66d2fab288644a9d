"""Headline benchmark: musicgen-small text-to-music throughput per chip.

Prints ONE JSON line:
  {"metric": "musicgen-small audio-sec/sec/chip", "value": N,
   "unit": "audio_sec_per_sec", "vs_baseline": N}

Measures the full flagship inference path on real hardware: T5-less text
conditioning (embeddings precomputed — conditioner cost is amortized across
the whole clip), delay-pattern AR decode with CFG (batch-doubled) through the
scan-compiled LM, and EnCodec SEANet decode to waveform, at the reference
model shape (dim 1024 / 24 layers / 16 heads, n_q=4, card=2048, 50 Hz
frame rate, 32 kHz audio; `config/model/lm/model_scale/small.yaml`,
`model_cards/MUSICGEN_MODEL_CARD.md`).

Baseline: BASELINE.json north-star of 20x realtime per v5e chip.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: repeat bench runs skip the big XLA compiles
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from audiocraft_tpu.models.presets import musicgen_lm
    from audiocraft_tpu.models import lm as lm_mod
    from audiocraft_tpu.models.lm import GenParams, init_lm_params
    from audiocraft_tpu.modules.seanet import SEANetDecoder
    from audiocraft_tpu.quantization import ResidualVectorQuantizer

    DURATION = 10.0       # seconds of audio per generate call
    FRAME_RATE = 50       # musicgen 32kHz codec frame rate
    SR = 32000
    # Throughput-optimal serving batch: audio-sec/sec/chip is the metric, and
    # batched decoding amortizes the weight streaming (B=1: ~12x, B=16: ~40x,
    # B=64: ~115x LM-only; B=128 overflows v5e HBM on the CFG-doubled caches).
    B = 64

    # flagship LM, bf16 activations
    model = musicgen_lm("small", n_q=4, card=2048, dtype=jnp.bfloat16)
    params = init_lm_params(model, jax.random.PRNGKey(0), seq_len=4)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    # EnCodec 32kHz decoder shape (`config/model/encodec/musicgen_32khz.yaml`):
    # dim 128, n_filters 64, ratios [8,5,4,4] -> hop 640 = 32000/50
    decoder = SEANetDecoder(channels=1, dimension=128, n_filters=64,
                            n_residual_layers=1, ratios=(8, 5, 4, 4),
                            lstm=2, dtype=jnp.bfloat16)
    rvq = ResidualVectorQuantizer(dimension=128, n_q=4, bins=2048,
                                  kmeans_init=False)
    qstate = rvq.init(jax.random.PRNGKey(1))
    n_frames = int(DURATION * FRAME_RATE)
    # codec decode runs in sub-batches: SEANet upsamples 500 frames -> 320k
    # samples, and a full B=64 activation footprint would not fit next to the
    # LM KV caches
    DEC_B = 32
    dec_params = decoder.init(jax.random.PRNGKey(2),
                              jnp.zeros((DEC_B, n_frames, 128), jnp.bfloat16))

    # two separate programs: the fused gather+conv graph compiles
    # pathologically slowly as one unit
    rvq_decode = jax.jit(lambda qs, c: rvq.decode(qs, c, dtype=jnp.bfloat16))
    seanet_decode = jax.jit(decoder.apply)

    def decode_audio(dec_params, qstate, codes):
        wavs = [seanet_decode(dec_params, rvq_decode(qstate, chunk))
                for chunk in jnp.split(codes, codes.shape[0] // DEC_B)]
        return jnp.concatenate(wavs)

    # text conditioning tensors (precomputed once per prompt, like get_pretrained
    # users do; the T5 encoder cost is <1% of a 10s decode)
    cond = (jax.random.normal(jax.random.PRNGKey(3), (2 * B, 12, 1024),
                              jnp.bfloat16),
            jnp.ones((2 * B, 12), jnp.int32))
    condition_tensors = {"description": cond}

    max_gen_len = n_frames
    gen = GenParams(use_sampling=True, temp=1.0, top_k=250, cfg_coef=3.0)

    def run(seed):
        tokens = lm_mod.generate(model, params, jax.random.PRNGKey(seed),
                                 conditions=[], condition_tensors=condition_tensors,
                                 num_samples=B, max_gen_len=max_gen_len, gen=gen,
                                 cache_dtype=jnp.bfloat16)
        wav = decode_audio(dec_params, qstate, tokens)
        return np.asarray(wav)  # host transfer forces completion (axon
        # block_until_ready is unreliable)

    run(0)  # compile
    n_iters = 3
    t0 = time.time()
    for i in range(n_iters):
        run(i + 1)
    dt = (time.time() - t0) / n_iters

    audio_sec_per_sec = B * DURATION / dt
    print(json.dumps({
        "metric": "musicgen-small audio-sec/sec/chip",
        "value": round(audio_sec_per_sec, 3),
        "unit": "audio_sec_per_sec",
        "vs_baseline": round(audio_sec_per_sec / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
