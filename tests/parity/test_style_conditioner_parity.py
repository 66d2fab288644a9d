"""Numerical parity of the StyleConditioner device path against the
reference torch modules (`ref modules/conditioners.py:872-1004`):
feature embeds -> StreamingTransformer -> affine-free BatchNorm (running
stats at eval) -> RVQ eval_q bottleneck -> ds_factor stride ->
output_proj — with weights converted by `convert_lm_conditioners`.

Also covers the end-to-end conditioner-weight conversion of an exported
LM package (LUT + chroma), which `convert_lm_state` alone does not carry.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_harness import import_reference  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audiocraft_tpu.modules.conditioners import StyleConditioner  # noqa: E402
from audiocraft_tpu.utils import torch_port  # noqa: E402

DIM, HEADS, LAYERS = 256, 8, 4  # 'xsmall' transformer scale
N_Q_OUT, EVAL_Q, BINS, DS = 4, 2, 32, 3
MERT_DIM = 24


@pytest.fixture(scope="module")
def torch_style():
    """Reference-built torch pieces wired exactly like StyleConditioner
    (mert embed path)."""
    ref_tr = import_reference("modules.transformer")
    ref_vq = import_reference("quantization.vq")
    torch.manual_seed(0)
    pieces = torch.nn.ModuleDict({
        "embed": torch.nn.Linear(MERT_DIM, DIM),
        "transformer": ref_tr.StreamingTransformer(
            d_model=DIM, num_heads=HEADS, num_layers=LAYERS,
            dim_feedforward=4 * DIM, memory_efficient=False,
            activation="gelu", norm_first=True, causal=False,
            layer_scale=None, bias_ff=False, bias_attn=False, dropout=0.0),
        "batch_norm": torch.nn.BatchNorm1d(DIM, affine=False),
        "output_proj": torch.nn.Linear(DIM, 8),
    }).eval()
    pieces.rvq = ref_vq.ResidualVectorQuantizer(
        DIM, n_q=N_Q_OUT, q_dropout=False, bins=BINS)
    # make BN running stats + RVQ codebooks non-trivial
    with torch.no_grad():
        pieces.batch_norm.running_mean.normal_(0, 0.5)
        pieces.batch_norm.running_var.uniform_(0.5, 2.0)
        for layer in pieces.rvq.vq.layers:
            layer._codebook.embed.normal_()
            layer._codebook.embed_avg.copy_(layer._codebook.embed)
            layer._codebook.inited.fill_(1)
            layer._codebook.cluster_size.fill_(1.0)
    pieces.rvq.eval()
    return pieces


def _torch_forward(pieces, feats):
    """Mirror of StyleConditioner._get_wav_embedding eval path
    (`ref conditioners.py:937-975`)."""
    with torch.no_grad():
        z = pieces["embed"](feats)
        z = pieces["transformer"](z)
        z = pieces["batch_norm"](z.transpose(1, 2)).transpose(1, 2)
        pieces.rvq.set_num_codebooks(EVAL_Q)
        q = pieces.rvq(z.transpose(1, 2), frame_rate=1.0)
        z = q.x.transpose(1, 2)
        z = z[:, ::DS]
        return pieces["output_proj"](z)


def _export_state(pieces):
    """Serialize under the exported-package key layout."""
    cp = "condition_provider.conditioners.self_wav."
    out = {}
    for k, v in pieces.state_dict().items():
        out[cp + k] = v.detach().numpy()
    return out


def test_style_conditioner_parity(torch_style):
    feats = np.random.RandomState(0).randn(2, 30, MERT_DIM).astype(np.float32)
    ref = _torch_forward(torch_style, torch.from_numpy(feats)).numpy()

    cond = StyleConditioner(dim=DIM, output_dim=8, sample_rate=32000,
                            model_name="mert", transformer_scale="xsmall",
                            ds_factor=DS, n_q_out=N_Q_OUT, eval_q=EVAL_Q,
                            bins=BINS, q_dropout=False, batch_norm=True)
    src = _export_state(torch_style)

    class _FakeLM:
        conditioners = {"self_wav": cond}

    params, extras = torch_port.convert_lm_conditioners(src, _FakeLM())
    variables = {"params": params["conditioners_self_wav"]}
    for coll, tree in extras.items():
        variables[coll] = tree["conditioners_self_wav"]
    tok = {"mert": feats, "valid": np.ones((2, 1), np.float32)}
    out, mask = cond.apply(variables, tok)
    out = np.asarray(out)
    assert out.shape == ref.shape
    err = np.abs(out - ref).max()
    assert err < 2e-3, err


def test_lm_package_conditioner_conversion(tmp_path):
    """Exported LM package with LUT + chroma conditioners loads with
    converted conditioner weights (previously silently absent)."""
    from audiocraft_tpu.utils.torch_port import load_lm_model_from_dir

    torch.manual_seed(1)
    dim, n_q, card = 16, 2, 40
    state = {}
    # minimal transformer_lm export: emb/linears/out_norm/2 layers
    for k in range(n_q):
        state[f"emb.{k}.weight"] = torch.randn(card + 1, dim)
        state[f"linears.{k}.weight"] = torch.randn(card, dim)
    state["out_norm.weight"] = torch.ones(dim)
    state["out_norm.bias"] = torch.zeros(dim)
    for i in range(2):
        rp = f"transformer.layers.{i}."
        state[rp + "self_attn.in_proj_weight"] = torch.randn(3 * dim, dim)
        state[rp + "self_attn.out_proj.weight"] = torch.randn(dim, dim)
        state[rp + "cross_attention.in_proj_weight"] = torch.randn(3 * dim, dim)
        state[rp + "cross_attention.out_proj.weight"] = torch.randn(dim, dim)
        for nm in ("norm1", "norm2", "norm_cross"):
            state[rp + nm + ".weight"] = torch.ones(dim)
            state[rp + nm + ".bias"] = torch.zeros(dim)
        state[rp + "linear1.weight"] = torch.randn(4 * dim, dim)
        state[rp + "linear2.weight"] = torch.randn(dim, 4 * dim)
    cp = "condition_provider.conditioners."
    state[cp + "description.embed.weight"] = torch.randn(33, dim)
    state[cp + "description.output_proj.weight"] = torch.randn(dim, dim)
    state[cp + "description.output_proj.bias"] = torch.zeros(dim)
    state[cp + "self_wav.output_proj.weight"] = torch.randn(dim, 12)
    state[cp + "self_wav.output_proj.bias"] = torch.zeros(dim)

    cfg = {
        "transformer_lm": {"dim": dim, "num_heads": 2, "num_layers": 2,
                           "n_q": n_q, "card": card, "causal": True,
                           "cross_attention": True, "norm_first": True,
                           "bias_proj": False, "bias_ff": False,
                           "bias_attn": False},
        "codebooks_pattern": {"modeling": "delay",
                              "delay": {"delays": [0, 1]}},
        "attribute_dropout": {}, "classifier_free_guidance":
            {"training_dropout": 0.1, "inference_coef": 3.0},
        "fuser": {"cross": ["description"], "prepend": ["self_wav"],
                  "sum": [], "input_interpolate": []},
        "conditioners": {
            "description": {"model": "lut",
                            "lut": {"n_bins": 32, "dim": dim,
                                    "tokenizer": "whitespace"}},
            "self_wav": {"model": "chroma_stem",
                         "chroma_stem": {"sample_rate": 32000,
                                         "n_chroma": 12, "radix2_exp": 9,
                                         "duration": 1.0}},
        },
    }
    path = tmp_path / "state_dict.bin"
    torch.save({"best_state": state, "xp.cfg": cfg}, path)
    model, params, _ = load_lm_model_from_dir(tmp_path)
    p = params["params"]
    assert "conditioners_description" in p and "conditioners_self_wav" in p
    np.testing.assert_allclose(
        np.asarray(p["conditioners_description"]["embed"]["embedding"]),
        state[cp + "description.embed.weight"].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p["conditioners_self_wav"]["output_proj"]["kernel"]),
        state[cp + "self_wav.output_proj.weight"].numpy().T, rtol=1e-6)
