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


def test_quantized_drift_bounded_on_converted_torch_weights():
    """VERDICT r4 #8: the drift/corr bound must hold on REAL (torch-init,
    reference-layout, torch_port-converted) weight distributions, not only
    our random init — per-channel int8 is stressed exactly where trained
    weight columns have outlier scales."""
    torch = pytest.importorskip("torch")
    from tests._reference_harness import import_reference
    from audiocraft_tpu.modules.conditioners import ConditionFuser
    from audiocraft_tpu.modules.patterns import DelayedPatternProvider
    from audiocraft_tpu.utils import torch_port

    ref_lm = import_reference("models.lm")
    ref_cond = import_reference("modules.conditioners")
    ref_patterns = import_reference("modules.codebooks_patterns")
    N_Q, CARD, DIM, HEADS, LAYERS = 2, 40, 32, 2, 2
    torch.manual_seed(3)
    fuse2cond = {"cross": ["description"], "prepend": [], "sum": [],
                 "input_interpolate": []}
    ref = ref_lm.LMModel(
        pattern_provider=ref_patterns.DelayedPatternProvider(n_q=N_Q),
        condition_provider=ref_cond.ConditioningProvider({}),
        fuser=ref_cond.ConditionFuser(fuse2cond=fuse2cond),
        n_q=N_Q, card=CARD, dim=DIM, num_heads=HEADS, num_layers=LAYERS,
        hidden_scale=4, norm_first=True, bias_proj=False, causal=True,
        cross_attention=True, custom=True, activation="gelu")
    src = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = torch_port.convert_lm_state(
        src, n_q=N_Q, num_layers=LAYERS, cross_attention=True,
        bias_proj=False, norm_first=True)

    model = LMModel(
        pattern_provider=DelayedPatternProvider(n_q=N_Q),
        conditioners={}, fuser=ConditionFuser(fuse2cond=fuse2cond),
        n_q=N_Q, card=CARD, dim=DIM, num_heads=HEADS, num_layers=LAYERS,
        hidden_scale=4, norm_first=True, bias_proj=False, causal=True,
        cross_attention=True)
    qparams = quantize_lm_params(model, params)
    flat = jax.tree_util.tree_leaves(
        qparams, is_leaf=lambda x: isinstance(x, QTensor))
    assert any(isinstance(leaf, QTensor) for leaf in flat)

    rs = np.random.RandomState(11)
    seq = jnp.asarray(rs.randint(0, CARD, (2, N_Q, 9)), jnp.int32)
    cond = jnp.asarray(rs.randn(2, 5, DIM).astype(np.float32) * 0.3)
    mask = jnp.ones((2, 5), jnp.int32)
    ct = {"description": (cond, mask)}
    ref_out, _ = model.apply(params, seq, ct)
    out, _ = model.apply(qparams, seq, ct)
    ref_out = np.asarray(ref_out, np.float32)
    out = np.asarray(out, np.float32)
    drift = np.max(np.abs(out - ref_out)) / max(np.std(ref_out), 1e-6)
    assert drift < 0.25, drift
    corr = np.corrcoef(ref_out.ravel(), out.ravel())[0, 1]
    assert corr > 0.99, corr
