"""Legacy training-checkpoint conversion (`ref utils/export_legacy.py`)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from audiocraft_tpu.utils import export_legacy  # noqa: E402
from audiocraft_tpu.utils.torch_port import _load_torch_state  # noqa: E402


def _legacy_lm_cfg():
    return {
        "transformer_lm": {
            "dim": 16, "num_heads": 2, "num_layers": 2,
            # experimental params dropped by the conversion
            "spectral_norm_attn_iters": 3, "spectral_norm_ff_iters": 3,
            "residual_balancer_attn": 0.1, "residual_balancer_ff": 0.1,
            "layer_drop": 0.0,
        },
        "sample_rate": 32000, "channels": 1,
    }


def test_export_lm_cleans_cfg_and_repackages(tmp_path):
    sd = {"emb.0.weight": torch.randn(40, 16)}
    pkg = {"best_state": {"model": sd}, "fsdp_best_state": None,
           "xp.cfg": _legacy_lm_cfg()}
    src = tmp_path / "legacy_lm.th"
    torch.save(pkg, src)
    out = export_legacy.export_lm(src, tmp_path / "release_lm.th")

    state, cfg = _load_torch_state(out)
    np.testing.assert_allclose(state["emb.0.weight"],
                               sd["emb.0.weight"].numpy())
    tl = cfg["transformer_lm"]
    assert tl["card"] == 2048 and tl["n_q"] == 4
    for bad in ("spectral_norm_attn_iters", "layer_drop",
                "residual_balancer_attn"):
        assert bad not in tl


def test_export_lm_prefers_fsdp_state_and_stereo_nq(tmp_path):
    sd_fsdp = {"w": torch.ones(2, 2)}
    cfg = _legacy_lm_cfg()
    cfg["interleave_stereo_codebooks"] = {"use": True, "downsample": True}
    pkg = {"best_state": {"model": {"w": torch.zeros(2, 2)}},
           "fsdp_best_state": {"model": sd_fsdp}, "xp.cfg": cfg}
    src = tmp_path / "legacy_fsdp.th"
    torch.save(pkg, src)
    out = export_legacy.export_lm(src, tmp_path / "release_fsdp.th")
    state, ccfg = _load_torch_state(out)
    assert state["w"].sum() == 4  # the fsdp state won
    assert ccfg["transformer_lm"]["n_q"] == 8  # stereo interleave
    assert "downsample" not in ccfg["interleave_stereo_codebooks"]


def test_export_encodec_takes_ema_state(tmp_path):
    sd = {"encoder.model.0.conv.conv.weight": torch.randn(4, 1, 7)}
    pkg = {"ema": {"state": {"model": sd}},
           "xp.cfg": {"sample_rate": 24000, "channels": 1}}
    src = tmp_path / "legacy_codec.th"
    torch.save(pkg, src)
    out = export_legacy.export_encodec(src, tmp_path / "release_codec.th")
    state, cfg = _load_torch_state(out)
    np.testing.assert_allclose(
        state["encoder.model.0.conv.conv.weight"],
        sd["encoder.model.0.conv.conv.weight"].numpy())
    assert cfg["sample_rate"] == 24000
