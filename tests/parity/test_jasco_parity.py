"""Numerical parity: reference torch FlowMatchingModel (JASCO) vs our port.

Builds the actual reference model (`audiocraft/models/flow_matching.py:121-343`,
UnetTransformer with skip connections) on torch CPU with random weights,
converts through `torch_port.convert_flow_matching_state`, and asserts
allclose vector fields given identical precomputed condition tensors."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_harness import import_reference  # noqa: E402

from audiocraft_tpu.models.flow_matching import FlowMatchingModel  # noqa: E402
from audiocraft_tpu.modules.conditioners import ConditionFuser  # noqa: E402
from audiocraft_tpu.modules.jasco_conditioners import (  # noqa: E402
    ChordsEmbConditioner)
from audiocraft_tpu.utils import torch_port  # noqa: E402

DIM = 16
FLOW_DIM = 8
CHORDS_DIM = 4
NUM_LAYERS = 2
TIME_DIM = 16


def _build_reference():
    ref_fm = import_reference("models.flow_matching")
    ref_cond = import_reference("modules.conditioners")
    torch.manual_seed(0)
    fuser = ref_cond.ConditionFuser(
        {"cross": ["description"], "prepend": [], "sum": [],
         "input_interpolate": [], "ignore": ["chords"]})
    model = ref_fm.FlowMatchingModel(
        condition_provider=None, fuser=fuser, dim=DIM, num_heads=4,
        flow_dim=FLOW_DIM, chords_dim=CHORDS_DIM, norm_first=True,
        bias_proj=False, time_embedding_dim=TIME_DIM,
        num_layers=NUM_LAYERS, skip_connections=True, causal=False,
        cross_attention=True, activation="gelu")
    model.eval()
    return model


def test_flow_matching_forward_parity():
    import jax.numpy as jnp
    ref = _build_reference()
    src = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    fuser = ConditionFuser({"cross": ["description"], "prepend": [],
                            "sum": [], "ignore": ["chords"],
                            "input_interpolate": []})
    ours = FlowMatchingModel(
        conditioners={"chords": ChordsEmbConditioner(card=5,
                                                     out_dim=CHORDS_DIM)},
        fuser=fuser, dim=DIM, num_heads=4, flow_dim=FLOW_DIM,
        chords_dim=CHORDS_DIM, norm_first=True, bias_proj=False,
        time_embedding_dim=TIME_DIM, num_layers=NUM_LAYERS,
        skip_connections=True, causal=False, cross_attention=True)
    params = torch_port.convert_flow_matching_state(
        src, num_layers=NUM_LAYERS, norm_first=True, bias_proj=False,
        skip_connections=True)

    rng = np.random.RandomState(0)
    B, T, Td = 2, 12, 5
    latents = rng.randn(B, T, FLOW_DIM).astype(np.float32)
    t = np.asarray([0.3, 0.7], np.float32)
    desc = rng.randn(B, Td, DIM).astype(np.float32)
    chords = rng.randn(B, T, CHORDS_DIM).astype(np.float32)

    cond_torch = {
        "description": (torch.from_numpy(desc),
                        torch.ones(B, Td, dtype=torch.bool)),
        "chords": (torch.from_numpy(chords),
                   torch.ones(B, T, dtype=torch.bool)),
    }
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(latents), torch.from_numpy(t),
                      conditions=[], condition_tensors=cond_torch).numpy()

    cond_jax = {
        "description": (jnp.asarray(desc), jnp.ones((B, Td), bool)),
        "chords": (jnp.asarray(chords), jnp.ones((B, T), bool)),
    }
    out = np.asarray(ours.apply(params, jnp.asarray(latents), jnp.asarray(t),
                                cond_jax))
    assert out.shape == ref_out.shape
    err = np.abs(out - ref_out).max()
    assert err < 2e-4, f"flow matching vector field mismatch: {err}"


def test_chords_conditioner_conversion():
    import jax.numpy as jnp
    torch.manual_seed(1)
    emb = torch.nn.Embedding(6, CHORDS_DIM)
    src = {"condition_provider.conditioners.chords.emb.weight":
           emb.weight.detach().numpy()}
    params = torch_port.convert_flow_matching_state(
        {**src,
         "emb.weight": np.zeros((DIM, FLOW_DIM + CHORDS_DIM), np.float32),
         "linear.weight": np.zeros((FLOW_DIM, DIM), np.float32),
         "temb.dense.0.weight": np.zeros((4 * TIME_DIM, TIME_DIM), np.float32),
         "temb.dense.0.bias": np.zeros((4 * TIME_DIM,), np.float32),
         "temb.dense.1.weight": np.zeros((4 * TIME_DIM, 4 * TIME_DIM),
                                         np.float32),
         "temb.dense.1.bias": np.zeros((4 * TIME_DIM,), np.float32),
         "temb_proj.weight": np.zeros((DIM, 4 * TIME_DIM), np.float32),
         "temb_proj.bias": np.zeros((DIM,), np.float32)},
        num_layers=0, norm_first=False, skip_connections=False,
        conditioner_specs={"chords": "chords_emb"})
    from audiocraft_tpu.modules.conditioners import SymbolicCondition
    cond = ChordsEmbConditioner(card=5, out_dim=CHORDS_DIM)
    idx = np.asarray([[0, 2, 5]], np.int32)
    out, _ = cond.apply({"params": params["params"]["conditioners_chords"]},
                        SymbolicCondition(frame_chords=jnp.asarray(idx)))
    ref = emb(torch.from_numpy(idx).long()).detach().numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)
