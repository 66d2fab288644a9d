"""Numerical parity: reference torch DiffusionUnet (MBD) vs our JAX port.

Builds the actual reference model (`audiocraft/models/unet.py:123-214`) on
torch CPU with random weights, converts its state dict through
`torch_port.convert_diffusion_unet`, and asserts allclose forward outputs —
the conversion-correctness evidence for facebook/multiband-diffusion
checkpoints."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_harness import import_reference  # noqa: E402

from audiocraft_tpu.models.unet import DiffusionUnet  # noqa: E402
from audiocraft_tpu.utils import torch_port  # noqa: E402

CHIN = 1
HIDDEN = 8
DEPTH = 3
NUM_STEPS = 20
CODEC_DIM = 6


def _build_pair(bilstm=True, emb_all_layers=True, codec=True,
                cross_attention=False):
    ref_unet = import_reference("models.unet")
    torch.manual_seed(0)
    ref = ref_unet.DiffusionUnet(
        chin=CHIN, hidden=HIDDEN, depth=DEPTH, growth=2.0,
        num_steps=NUM_STEPS, emb_all_layers=emb_all_layers,
        bilstm=bilstm, codec_dim=CODEC_DIM if codec else None,
        cross_attention=cross_attention)
    ref.eval()
    src = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ours = DiffusionUnet(
        chin=CHIN, hidden=HIDDEN, depth=DEPTH, growth=2.0,
        num_steps=NUM_STEPS, emb_all_layers=emb_all_layers,
        bilstm=bilstm, codec_dim=CODEC_DIM if codec else None,
        cross_attention=cross_attention)
    params = torch_port.convert_diffusion_unet(
        src, depth=DEPTH, emb_all_layers=emb_all_layers, bilstm=bilstm,
        codec_dim=CODEC_DIM if codec else None)
    return ref, ours, params


@pytest.mark.parametrize("bilstm", [True, False])
def test_diffusion_unet_forward_parity(bilstm):
    import jax.numpy as jnp
    ref, ours, params = _build_pair(bilstm=bilstm)
    rng = np.random.RandomState(0)
    T = 129  # odd on purpose: exercises the stride padding law
    x = rng.randn(2, CHIN, T).astype(np.float32)
    cond = rng.randn(2, CODEC_DIM, 20).astype(np.float32)
    step = 7
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), step,
                      condition=torch.from_numpy(cond)).sample.numpy()
    out = ours.apply(params, jnp.asarray(x.transpose(0, 2, 1)), step,
                     condition=jnp.asarray(cond.transpose(0, 2, 1)))
    out = np.asarray(out).transpose(0, 2, 1)
    assert out.shape == ref_out.shape
    err = np.abs(out - ref_out).max()
    assert err < 2e-4, f"diffusion unet forward mismatch: {err}"


def test_mbp_state_conversion():
    import jax.numpy as jnp
    from audiocraft_tpu.modules.diffusion_schedule import MultiBandProcessor
    src = {
        "counts": np.asarray(128.0),
        "sum_x": np.arange(4, dtype=np.float32),
        "sum_x2": np.arange(4, dtype=np.float32) + 1,
        "sum_target_x2": np.arange(4, dtype=np.float32) + 2,
    }
    state = torch_port.convert_mbp_state(src)
    assert float(state.counts) == 128.0
    np.testing.assert_allclose(np.asarray(state.sum_x), src["sum_x"])
    proc = MultiBandProcessor(n_bands=4, sample_rate=24000)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 1, 2400), jnp.float32)
    y = proc.project_sample(state, x)
    assert np.isfinite(np.asarray(y)).all()
