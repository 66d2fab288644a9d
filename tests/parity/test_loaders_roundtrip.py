"""End-to-end loader coverage: torch checkpoint files on disk -> working
JAX models through the public loader API (models/loaders.py), matching the
reference's on-disk formats (`ref models/loaders.py:158-268`)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference_harness import import_reference  # noqa: E402


def test_load_diffusion_models_bundle(tmp_path):
    """MBD bundle: {'sample_rate','n_bands', i: {cfg, model_state,
    processor_state}} (`ref loaders.py:181-204`)."""
    import jax.numpy as jnp
    from audiocraft_tpu.models.loaders import load_diffusion_models

    ref_unet = import_reference("models.unet")
    torch.manual_seed(0)
    n_bands = 2
    pkg = {"sample_rate": 24000, "n_bands": n_bands}
    refs = []
    for i in range(n_bands):
        m = ref_unet.DiffusionUnet(chin=1, hidden=8, depth=2, growth=2.0,
                                   num_steps=10, emb_all_layers=True,
                                   bilstm=True, codec_dim=6).eval()
        refs.append(m)
        pkg[i] = {
            "cfg": {
                "channels": 1,
                "schedule": {"num_steps": 10, "beta_t0": 1e-4,
                             "beta_t1": 0.02, "variance": "beta"},
                "diffusion_unet": {"hidden": 8, "depth": 2, "growth": 2.0,
                                   "emb_all_layers": True, "bilstm": True,
                                   "codec_dim": 6},
                "processor": {"use": True, "name": "multi_band_processor",
                              "n_bands": 4, "num_samples": 100,
                              "power_std": 1.0},
            },
            "model_state": m.state_dict(),
            "processor_state": {
                "counts": torch.tensor(50.0),
                "sum_x": torch.randn(4),
                "sum_x2": torch.rand(4) + 1.0,
                "sum_target_x2": torch.rand(4) + 1.0,
            },
        }
    path = tmp_path / "mbd_bundle.th"
    torch.save(pkg, path)

    models, schedules, proc_states, cfgs, sr = load_diffusion_models(str(path))
    assert sr == 24000 and len(models) == n_bands
    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 1).astype(np.float32)
    cond = rng.randn(1, 10, 6).astype(np.float32)
    for (model, params), ref in zip(models, refs):
        out = np.asarray(model.apply(params, jnp.asarray(x), 3,
                                     condition=jnp.asarray(cond)))
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x.transpose(0, 2, 1)), 3,
                          condition=torch.from_numpy(cond.transpose(0, 2, 1))
                          ).sample.numpy()
        err = np.abs(out.transpose(0, 2, 1) - ref_out).max()
        assert err < 2e-4, f"banded unet mismatch after disk round trip: {err}"
    assert proc_states[0] is not None
    assert float(proc_states[0].counts) == 50.0


def test_load_audioseal_models_dir(tmp_path):
    """audioseal snapshot dir: generator_<f>.pth / detector_<f>.pth with
    {'model': state} (`ref loaders.py:206-268`)."""
    import math
    import jax.numpy as jnp
    from audiocraft_tpu.models.loaders import load_audioseal_models

    seanet_mod = import_reference("modules.seanet")
    kw = dict(channels=1, dimension=16, n_filters=4, n_residual_layers=1,
              ratios=[4, 2], lstm=2, norm="weight_norm", causal=False,
              pad_mode="constant")
    torch.manual_seed(0)

    gen = torch.nn.Module()
    gen.encoder = seanet_mod.SEANetEncoder(**kw)
    gen.decoder = seanet_mod.SEANetDecoder(**kw)
    gen.msg_processor = torch.nn.Module()
    gen.msg_processor.msg_embeddings = torch.nn.Embedding(8, 16)

    det = torch.nn.Module()
    enc = seanet_mod.SEANetEncoder(**kw)
    hop = math.prod([4, 2])
    enc.reverse_convolution = torch.nn.ConvTranspose1d(16, 8, hop, stride=hop)
    det.detector = torch.nn.Sequential(enc, torch.nn.Conv1d(8, 2 + 4, 1))

    d = tmp_path / "audioseal"
    d.mkdir()
    torch.save({"model": gen.state_dict()}, d / "generator_base.pth")
    torch.save({"model": det.state_dict()}, d / "detector_base.pth")
    (d / "base.json").write_text(
        '{"nbits": 4, "seanet": {"dimension": 16, "n_filters": 4,'
        ' "ratios": [4, 2], "n_residual_layers": 1, "lstm": 2},'
        ' "detector": {"output_dim": 8}}')

    model, params = load_audioseal_models(str(d), filename="base")
    assert model.nbits == 4
    x = jnp.asarray(np.random.RandomState(0).randn(1, 1, 128), jnp.float32)
    msg = jnp.zeros((1, 4), jnp.int32)
    y = model.forward(params, x, msg)
    res = model.detect_watermark(params, y)
    assert np.asarray(y).shape == (1, 1, 128)
    assert np.asarray(res).shape == (1, 6, 128)
    np.testing.assert_allclose(np.asarray(res)[:, :2].sum(axis=1), 1.0,
                               rtol=1e-5)


def test_load_jasco_model_pkg(tmp_path):
    """JASCO export pkg: {'best_state', 'xp.cfg'} (`ref loaders.py:158-179`)."""
    import jax.numpy as jnp
    from audiocraft_tpu.models.loaders import load_jasco_model

    ref_fm = import_reference("models.flow_matching")
    ref_cond = import_reference("modules.conditioners")
    torch.manual_seed(0)
    fuser_t = ref_cond.ConditionFuser(
        {"cross": ["description"], "prepend": [], "sum": [],
         "input_interpolate": [], "ignore": ["chords"]})
    ref = ref_fm.FlowMatchingModel(
        condition_provider=None, fuser=fuser_t, dim=16, num_heads=4,
        flow_dim=8, chords_dim=4, norm_first=True, bias_proj=False,
        time_embedding_dim=16, num_layers=2, skip_connections=True,
        causal=False, cross_attention=True, activation="gelu").eval()
    state = ref.state_dict()
    # conditioner weights live under condition_provider.* in real exports
    chords_emb = torch.randn(6, 4)
    state["condition_provider.conditioners.chords.emb.weight"] = chords_emb
    cfg = {
        "transformer_lm": {"dim": 16, "num_heads": 4, "flow_dim": 8,
                           "chords_dim": 4, "norm_first": True,
                           "bias_proj": False, "time_embedding_dim": 16,
                           "num_layers": 2, "skip_connections": True,
                           "causal": False, "activation": "gelu"},
        "fuser": {"cross": ["description"], "prepend": [], "sum": [],
                  "ignore": ["chords"], "input_interpolate": []},
        "conditioners": {
            "chords": {"model": "chords_emb",
                       "chords_emb": {"card": 5, "out_dim": 4}},
            "description": {"model": "lut",
                            "lut": {"n_bins": 16, "dim": 16,
                                    "tokenizer": "whitespace"}},
        },
        "classifier_free_guidance": {"inference_coef": 2.5},
    }
    # LUT conditioner weights for 'description'
    state["condition_provider.conditioners.description.embed.weight"] = \
        torch.randn(17, 16)
    state["condition_provider.conditioners.description.output_proj.weight"] = \
        torch.randn(16, 16)
    state["condition_provider.conditioners.description.output_proj.bias"] = \
        torch.randn(16)
    path = tmp_path / "jasco_state.th"
    torch.save({"best_state": state, "xp.cfg": cfg}, path)

    model, params, loaded_cfg = load_jasco_model(str(path))
    assert model.num_layers == 2 and model.cfg_coef == 2.5
    # forward with precomputed condition tensors matches the torch model
    rng = np.random.RandomState(0)
    B, T, Td = 1, 10, 4
    latents = rng.randn(B, T, 8).astype(np.float32)
    t = np.asarray([0.5], np.float32)
    desc = rng.randn(B, Td, 16).astype(np.float32)
    chords = rng.randn(B, T, 4).astype(np.float32)
    cond_j = {"description": (jnp.asarray(desc), jnp.ones((B, Td), bool)),
              "chords": (jnp.asarray(chords), jnp.ones((B, T), bool))}
    out = np.asarray(model.apply(params, jnp.asarray(latents),
                                 jnp.asarray(t), cond_j))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(latents), torch.from_numpy(t),
                      conditions=[], condition_tensors={
                          "description": (torch.from_numpy(desc),
                                          torch.ones(B, Td, dtype=torch.bool)),
                          "chords": (torch.from_numpy(chords),
                                     torch.ones(B, T, dtype=torch.bool)),
                      }).numpy()
    err = np.abs(out - ref_out).max()
    assert err < 2e-4, f"jasco loader round-trip mismatch: {err}"
