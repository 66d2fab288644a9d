"""Conversion parity of the native HuBERT/MERT encoder against
`transformers.HubertModel` (MERT-v1-95M is architecturally HuBERT-base:
`ref modules/conditioners.py:802-845`)."""
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from audiocraft_tpu.modules.mert import MERTModel  # noqa: E402
from audiocraft_tpu.utils.torch_port import convert_hubert  # noqa: E402

CFG = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
           intermediate_size=64, conv_dim=(24, 24), conv_kernel=(10, 3),
           conv_stride=(5, 2), num_conv_pos_embeddings=16,
           num_conv_pos_embedding_groups=4, do_stable_layer_norm=False,
           feat_extract_norm="group", conv_bias=False,
           hidden_dropout=0.0, attention_dropout=0.0,
           feat_proj_dropout=0.0, layerdrop=0.0)


@pytest.fixture(scope="module")
def ref_model():
    torch.manual_seed(0)
    return transformers.HubertModel(transformers.HubertConfig(**CFG)).eval()


def test_hubert_forward_parity(ref_model):
    src = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = convert_hubert(src)
    model = MERTModel(hidden=32, num_layers=2, num_heads=2, intermediate=64,
                      conv_dim=(24, 24), conv_kernel=(10, 3),
                      conv_stride=(5, 2), conv_bias=False,
                      pos_kernel=16, pos_groups=4)
    x = np.random.RandomState(0).randn(2, 2400).astype(np.float32)
    with torch.no_grad():
        ref = ref_model(torch.from_numpy(x)).last_hidden_state.numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert out.shape == ref.shape
    err = np.abs(out - ref).max()
    assert err < 2e-4, err


def test_load_mert_from_path(ref_model, tmp_path):
    from audiocraft_tpu.utils.torch_port import load_mert_from_path
    torch.save(ref_model.state_dict(), tmp_path / "pytorch_model.bin")
    model, variables = load_mert_from_path(tmp_path)
    assert model.hidden == 32 and model.num_layers == 2
    assert model.conv_dim == (24, 24) and model.conv_kernel == (10, 3)
    x = np.random.RandomState(1).randn(1, 2400).astype(np.float32)
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = ref_model(torch.from_numpy(x)).last_hidden_state.numpy()
    # num_heads is inferred as hidden//64 -> may differ from the tiny ref
    # config; rebuild with the right head count for the numerical check
    model = MERTModel(hidden=32, num_layers=2, num_heads=2, intermediate=64,
                      conv_dim=(24, 24), conv_kernel=(10, 3),
                      conv_stride=(5, 2), conv_bias=False,
                      pos_kernel=16, pos_groups=4)
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert np.abs(out - ref).max() < 2e-4


def test_load_mert_safetensors(ref_model, tmp_path):
    """HF snapshots ship model.safetensors; the loader must read it."""
    from safetensors.torch import save_file
    from audiocraft_tpu.utils.torch_port import load_mert_from_path
    save_file({k: v.contiguous() for k, v in ref_model.state_dict().items()},
              str(tmp_path / "model.safetensors"))
    model, variables = load_mert_from_path(tmp_path)
    x = np.random.RandomState(2).randn(1, 2400).astype(np.float32)
    model = MERTModel(hidden=32, num_layers=2, num_heads=2, intermediate=64,
                      conv_dim=(24, 24), conv_kernel=(10, 3),
                      conv_stride=(5, 2), conv_bias=False,
                      pos_kernel=16, pos_groups=4)
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = ref_model(torch.from_numpy(x)).last_hidden_state.numpy()
    assert np.abs(out - ref).max() < 2e-4
