"""Numerical parity: reference torch LMModel vs our JAX LM.

Instantiates the actual reference audiocraft/models/lm.py model on torch
CPU (delay pattern, cross-attention fuser, norm_first — the musicgen
layout), converts its weights via torch_port.convert_lm_state, and
asserts compute_predictions logits agree."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_harness import import_reference  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audiocraft_tpu.models.lm import LMModel  # noqa: E402
from audiocraft_tpu.modules.conditioners import ConditionFuser  # noqa: E402
from audiocraft_tpu.modules.patterns import DelayedPatternProvider  # noqa: E402
from audiocraft_tpu.utils import torch_port  # noqa: E402

N_Q, CARD, DIM, HEADS, LAYERS = 2, 40, 16, 2, 2


@pytest.fixture(scope="module")
def models():
    ref_lm = import_reference("models.lm")
    ref_cond = import_reference("modules.conditioners")
    ref_patterns = import_reference("modules.codebooks_patterns")

    torch.manual_seed(0)
    fuse2cond = {"cross": ["description"], "prepend": [], "sum": [],
                 "input_interpolate": []}
    ref = ref_lm.LMModel(
        pattern_provider=ref_patterns.DelayedPatternProvider(n_q=N_Q),
        condition_provider=ref_cond.ConditioningProvider({}),
        fuser=ref_cond.ConditionFuser(fuse2cond=fuse2cond),
        n_q=N_Q, card=CARD, dim=DIM, num_heads=HEADS, num_layers=LAYERS,
        hidden_scale=4, norm_first=True, bias_proj=False, causal=True,
        cross_attention=True, custom=True,
        activation="gelu")  # class default is relu; every shipped config
    # (config/model/lm/default.yaml:20) and our class default use gelu
    ref.eval()

    src = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = torch_port.convert_lm_state(
        src, n_q=N_Q, num_layers=LAYERS, cross_attention=True,
        bias_proj=False, norm_first=True)

    ours = LMModel(
        pattern_provider=DelayedPatternProvider(n_q=N_Q),
        conditioners={},
        fuser=ConditionFuser(fuse2cond=fuse2cond),
        n_q=N_Q, card=CARD, dim=DIM, num_heads=HEADS, num_layers=LAYERS,
        hidden_scale=4, norm_first=True, bias_proj=False, causal=True,
        cross_attention=True)
    return ref, ours, params


def _cond(batch, t=5, seed=7):
    rs = np.random.RandomState(seed)
    cond = rs.randn(batch, t, DIM).astype(np.float32) * 0.3
    mask = np.ones((batch, t), np.int64)
    return cond, mask


def test_forward_logits_match(models):
    ref, ours, params = models
    rs = np.random.RandomState(1)
    B, S = 2, 11
    seq = rs.randint(0, CARD, (B, N_Q, S)).astype(np.int64)
    cond, mask = _cond(B)
    with torch.no_grad():
        ref_logits = ref.forward(
            torch.from_numpy(seq), [],
            {"description": (torch.from_numpy(cond),
                             torch.from_numpy(mask))}).numpy()
    logits, _ = ours.apply(params, jnp.asarray(seq, jnp.int32),
                           {"description": (jnp.asarray(cond),
                                            jnp.asarray(mask))})
    got = np.asarray(logits)
    assert got.shape == ref_logits.shape
    err = np.abs(got - ref_logits).max()
    assert err < 2e-4, f"logits max abs err {err}"


def test_compute_predictions_match(models):
    ref, ours, params = models
    rs = np.random.RandomState(2)
    B, T = 2, 9
    codes = rs.randint(0, CARD, (B, N_Q, T)).astype(np.int64)
    cond, mask = _cond(B, seed=8)
    ct_t = {"description": (torch.from_numpy(cond), torch.from_numpy(mask))}
    with torch.no_grad():
        ref_out = ref.compute_predictions(torch.from_numpy(codes), [], ct_t)
    out = ours.apply(params, jnp.asarray(codes, jnp.int32),
                     {"description": (jnp.asarray(cond), jnp.asarray(mask))},
                     method=LMModel.compute_predictions)
    ref_mask = ref_out.mask.numpy()
    got_mask = np.asarray(out.mask).astype(bool)
    np.testing.assert_array_equal(got_mask, ref_mask)
    ref_logits = ref_out.logits.numpy()
    got_logits = np.asarray(out.logits)
    # compare only at valid positions (we fill invalid with 0, ref with NaN)
    err = np.abs(np.where(ref_mask[..., None], got_logits - ref_logits, 0)).max()
    assert err < 2e-4, f"valid-position logits max abs err {err}"
