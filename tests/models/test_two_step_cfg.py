"""two_step_cfg semantics (`ref models/lm.py:343-354`).

The reference distinguishes "two-step" CFG (conditional and unconditional
forwards as two separate calls, each padded independently) from the batched
2xB doubling. Like the reference, cross-attention here attends to
zero-padded (unmasked) conditioning positions, so the two formulations can
genuinely differ — two_step_cfg is therefore implemented as a real two-pass
path (separately tokenized streams, separate KV caches)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocraft_tpu.models.builders import get_debug_lm_model
from audiocraft_tpu.models.lm import (GenParams, LMModel, generate,
                                      prepare_cfg_conditions,
                                      tokenize_conditions)
from audiocraft_tpu.modules.conditioners import ConditioningAttributes


@pytest.fixture(scope="module")
def lm():
    model, params = get_debug_lm_model()
    return model, params


def _logits(model, params, seq, cond_tensors):
    out, _ = model.apply(params, seq, cond_tensors)
    return np.asarray(out)


def test_batched_equals_two_separate_forwards(lm):
    """No cross-example interaction in the trunk: a 2B batched forward is
    bitwise two B forwards — so batched CFG is exact, and any two-step
    difference comes only from tokenizer padding."""
    model, params = lm
    rng = np.random.RandomState(0)
    B, K, S = 2, model.n_q, 6
    seq_cond = rng.randint(0, model.card, (B, K, S)).astype(np.int32)
    seq_null = rng.randint(0, model.card, (B, K, S)).astype(np.int32)

    conds = [ConditioningAttributes(text={"description": "happy rock"}),
             ConditioningAttributes(text={"description": "sad jazz"})]
    nulls = [ConditioningAttributes(text={"description": None}),
             ConditioningAttributes(text={"description": None})]

    tok_all = tokenize_conditions(model, conds + nulls)
    ct_all = model.apply(params, tok_all, method=LMModel.compute_conditions)
    big = _logits(model, params,
                  jnp.concatenate([jnp.asarray(seq_cond),
                                   jnp.asarray(seq_null)]), ct_all)

    ct_cond = jax.tree.map(lambda x: x[:B], ct_all)
    ct_null = jax.tree.map(lambda x: x[B:], ct_all)
    lo = _logits(model, params, jnp.asarray(seq_cond), ct_cond)
    hi = _logits(model, params, jnp.asarray(seq_null), ct_null)

    np.testing.assert_array_equal(big[:B], lo)
    np.testing.assert_array_equal(big[B:], hi)


def test_two_step_tokenizes_streams_separately(lm):
    """prepare_cfg_conditions(two_step=True) returns separately-padded
    (cond, null) streams; the batched path pads them together."""
    model, params = lm
    conds = [ConditioningAttributes(
        text={"description": "a long description with many words here"})]
    two = prepare_cfg_conditions(model, params, conds, two_step=True)
    assert isinstance(two, tuple) and len(two) == 2
    batched = prepare_cfg_conditions(model, params, conds, two_step=False)
    (cond_emb, _), (null_emb, _) = two[0]["description"], two[1]["description"]
    # null stream padded to its own (shorter) length
    assert null_emb.shape[1] <= cond_emb.shape[1]
    # batched: both halves share the longest length
    assert batched["description"][0].shape[0] == 2
    assert batched["description"][0].shape[1] == cond_emb.shape[1]


def test_generate_two_step_runs_and_matches_when_padding_agrees(lm):
    """When cond and null tokenize to the same padded length, the two-step
    and batched programs are mathematically identical."""
    model, params = lm
    # the debug LUT tokenizer maps a whitespace token per word; a 1-word
    # description pads identically to the null (empty) condition bucket
    conds = [ConditioningAttributes(text={"description": "x"})]
    two = prepare_cfg_conditions(model, params, conds, two_step=True)
    c_len = two[0]["description"][0].shape[1]
    n_len = two[1]["description"][0].shape[1]
    out_a = generate(model, params, jax.random.PRNGKey(0), conditions=conds,
                     num_samples=1, max_gen_len=8,
                     gen=GenParams(use_sampling=False, two_step_cfg=False))
    out_b = generate(model, params, jax.random.PRNGKey(0), conditions=conds,
                     num_samples=1, max_gen_len=8,
                     gen=GenParams(use_sampling=False, two_step_cfg=True))
    assert np.asarray(out_b).shape == np.asarray(out_a).shape
    if c_len == n_len:
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    # outputs are valid codes either way
    assert (np.asarray(out_b) >= 0).all()
    assert (np.asarray(out_b) < model.card).all()


def test_cross_attention_padding_sensitivity_documented(lm):
    """Cross-attention DOES attend to zero-padded positions (the reference
    behaves the same — T5 zeroes masked embeddings but attention still
    assigns them weight). This is precisely why two_step_cfg exists."""
    model, params = lm
    rng = np.random.RandomState(1)
    B, K, S = 2, model.n_q, 5
    seq = rng.randint(0, model.card, (B, K, S)).astype(np.int32)
    conds = [ConditioningAttributes(text={"description": "a"}),
             ConditioningAttributes(text={"description": "b"})]
    tok = tokenize_conditions(model, conds)
    ct = model.apply(params, tok, method=LMModel.compute_conditions)
    base = _logits(model, params, jnp.asarray(seq), ct)

    def pad_cond(v):
        emb, mask = v
        pad = 3
        emb2 = jnp.concatenate(
            [emb, jnp.zeros((emb.shape[0], pad, emb.shape[2]), emb.dtype)], 1)
        mask2 = jnp.concatenate(
            [mask, jnp.zeros((mask.shape[0], pad), mask.dtype)], 1)
        return (emb2, mask2)

    padded = _logits(model, params, jnp.asarray(seq),
                     {k: pad_cond(v) for k, v in ct.items()})
    # NOT invariant — matching the reference's padded-attention behavior
    assert np.abs(padded - base).max() > 1e-4
