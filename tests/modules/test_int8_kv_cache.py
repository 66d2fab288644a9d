"""int8-quantized KV cache: accuracy + end-to-end decode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocraft_tpu.modules.transformer import KVCache


def test_kv_cache_int8_quantization_accuracy():
    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(2, 7, 4, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 7, 4, 16).astype(np.float32))
    cache = KVCache.create(2, 16, 4, 16, jnp.int8)
    cache = cache.write(k, v, 0)
    k_dq, v_dq = cache.read(jnp.float32)
    # valid region: < 1% relative error per head row
    rel = np.abs(np.asarray(k_dq)[:, :7] - np.asarray(k)) / (
        np.abs(np.asarray(k)).max(axis=-1, keepdims=True) + 1e-9)
    assert rel.max() < 0.01, rel.max()
    assert int(cache.index) == 7
    # offset writes land in the right slots
    cache = cache.write(k[:, :2], v[:, :2], 7)
    k_dq2, _ = cache.read(jnp.float32)
    rel2 = np.abs(np.asarray(k_dq2)[:, 7:9] - np.asarray(k[:, :2])) / (
        np.abs(np.asarray(k[:, :2])).max(axis=-1, keepdims=True) + 1e-9)
    assert rel2.max() < 0.01


def test_attention_with_int8_cache_close_to_f32():
    from audiocraft_tpu.modules.transformer import StreamingMultiheadAttention
    E, H, B, S = 32, 4, 2, 10
    mha = StreamingMultiheadAttention(embed_dim=E, num_heads=H, causal=True)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, S, E).astype(np.float32) * 0.5)
    params = mha.init(jax.random.PRNGKey(0), x, x, x)

    def run(dtype):
        cache = KVCache.create(B, S, H, E // H, dtype)
        outs = []
        for t in range(S):
            y, cache = mha.apply(params, x[:, t:t + 1], x[:, t:t + 1],
                                 x[:, t:t + 1], cache=cache)
            outs.append(np.asarray(y))
        return np.concatenate(outs, axis=1)

    out_f32 = run(jnp.float32)
    out_int8 = run(jnp.int8)
    err = np.abs(out_f32 - out_int8).max() / (np.abs(out_f32).max() + 1e-9)
    assert err < 0.02, f"int8 cache attention relative error {err}"


def test_generate_with_int8_cache():
    from audiocraft_tpu.models.builders import get_debug_lm_model
    from audiocraft_tpu.models.lm import GenParams, generate
    from audiocraft_tpu.modules.conditioners import ConditioningAttributes
    model, params = get_debug_lm_model()
    conds = [ConditioningAttributes(text={"description": "int8 tune"})]
    out_f32 = generate(model, params, jax.random.PRNGKey(0), conditions=conds,
                       num_samples=1, max_gen_len=12,
                       gen=GenParams(use_sampling=False))
    out_int8 = generate(model, params, jax.random.PRNGKey(0),
                        conditions=conds, num_samples=1, max_gen_len=12,
                        gen=GenParams(use_sampling=False),
                        cache_dtype=jnp.int8)
    a, b = np.asarray(out_f32), np.asarray(out_int8)
    assert b.shape == a.shape
    assert (b >= 0).all() and (b < model.card).all()
    # greedy decode with quantized caches should agree on most tokens
    agree = (a == b).mean()
    assert agree > 0.8, f"int8 greedy token agreement only {agree}"
