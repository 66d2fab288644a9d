"""W8A8 int8 serving mode: numerics + LM parity vs bf16 (`ops/quant.py`,
`models/lm.py quantize_lm_params`). No reference counterpart (the reference
serves fp16/bf16 only); the quality contract here is bounded logit drift."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocraft_tpu.models.builders import get_debug_lm_model
from audiocraft_tpu.models.lm import (GenParams, LMModel, generate,
                                      quantize_lm_params,
                                      tokenize_conditions)
from audiocraft_tpu.modules.conditioners import ConditioningAttributes
from audiocraft_tpu.ops.quant import (QTensor, qdot, quantize_weight,
                                      w8a8_dot, w8a8_heads)


@pytest.fixture(scope="module")
def lm():
    model, params = get_debug_lm_model()
    return model, params


def test_w8a8_dot_matches_dense():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 7, 64))
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 96)) * 0.1
    ref = x @ w
    out = w8a8_dot(x, quantize_weight(w), out_dtype=jnp.float32)
    # int8 x int8 with per-row/per-col scales: ~1% relative error budget
    err = float(jnp.max(jnp.abs(out - ref))) / float(jnp.std(ref))
    assert err < 0.05, err


def test_quantize_weight_zero_column_no_nan():
    """ADVICE r3: all-zero weight columns must quantize to zeros, not NaN."""
    w = jnp.zeros((8, 4)).at[:, 0].set(jnp.arange(8.0))
    qt = quantize_weight(w)
    assert np.isfinite(np.asarray(qt.scale)).all()
    out = w8a8_dot(jnp.ones((2, 8)), qt, out_dtype=jnp.float32)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out[:, 1:]), 0.0)


def test_qtensor_column_slice():
    w = jax.random.normal(jax.random.PRNGKey(2), (16, 24))
    qt = quantize_weight(w)
    sub = qt[:, :8]
    assert sub.w.shape == (16, 8) and sub.scale.shape == (1, 8)
    x = jax.random.normal(jax.random.PRNGKey(3), (3, 16))
    np.testing.assert_array_equal(
        np.asarray(qdot(x, sub, jnp.float32)),
        np.asarray(w8a8_dot(x, qt, jnp.float32)[:, :8]))


def test_w8a8_heads_matches_einsum():
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 32))
    w = jax.random.normal(jax.random.PRNGKey(5), (4, 32, 17)) * 0.2
    ref = jnp.einsum("bsd,kdc->bksc", x, w)
    out = w8a8_heads(x, quantize_weight(w), out_dtype=jnp.float32)
    assert out.shape == ref.shape
    err = float(jnp.max(jnp.abs(out - ref))) / float(jnp.std(ref))
    assert err < 0.05, err


def test_lm_forward_logit_drift_bounded(lm):
    """Full-model contract: quantized-trunk logits track bf16 logits within
    a small fraction of the logit spread, on a forward through embeddings,
    fused-qkv attention, cross-attention, FFN, and the output heads."""
    model, params = lm
    qparams = quantize_lm_params(model, params)
    # the trunk's hot weights got quantized, conditioners didn't
    flat = jax.tree_util.tree_leaves(
        qparams, is_leaf=lambda x: isinstance(x, QTensor))
    assert any(isinstance(leaf, QTensor) for leaf in flat)
    cond_sub = {k: v for k, v in qparams["params"].items()
                if "condition" in k}
    assert cond_sub, list(qparams["params"])
    assert not any(
        isinstance(leaf, QTensor) for leaf in jax.tree_util.tree_leaves(
            cond_sub, is_leaf=lambda x: isinstance(x, QTensor)))

    conds = [ConditioningAttributes(text={"description": "warm piano"})]
    tok = tokenize_conditions(model, conds)
    ct = model.apply(params, tok, method=LMModel.compute_conditions)
    rng = np.random.RandomState(0)
    seq = jnp.asarray(rng.randint(0, model.card, (1, model.n_q, 8)), jnp.int32)

    ref, _ = model.apply(params, seq, ct)
    out, _ = model.apply(qparams, seq, ct)
    ref, out = np.asarray(ref, np.float32), np.asarray(out, np.float32)
    drift = np.max(np.abs(out - ref)) / max(np.std(ref), 1e-6)
    assert drift < 0.25, drift
    # and the distributions broadly agree: high per-position correlation
    corr = np.corrcoef(ref.ravel(), out.ravel())[0, 1]
    assert corr > 0.99, corr


def test_generate_with_quantized_params(lm):
    """The compiled prefill+scan decode accepts QTensor params end-to-end
    and yields valid codes."""
    model, params = lm
    qparams = quantize_lm_params(model, params)
    conds = [ConditioningAttributes(text={"description": "drum loop"})]
    codes = generate(model, qparams, jax.random.PRNGKey(0),
                     conditions=conds, num_samples=1, max_gen_len=12,
                     gen=GenParams(use_sampling=True, top_k=0, temp=1.0),
                     check=True)
    assert codes.shape == (1, model.n_q, 12)
