"""JASCO drum conditioning: the full reference pipeline
(`ref jasco_conditioners.py:99-137`, `ref jasco.py:176-207`) — stem (or
provided wav) -> coarse EnCodec codes -> latents -> blur -> projection,
wired through JascoConditioningProvider and JASCO.generate."""
import jax
import jax.numpy as jnp
import numpy as np

from audiocraft_tpu.models.builders import get_debug_compression_model
from audiocraft_tpu.modules.conditioners import (ConditionFuser,
                                                 ConditioningAttributes,
                                                 LUTConditioner,
                                                 WavCondition)
from audiocraft_tpu.modules.jasco_conditioners import (DrumsConditioner,
                                                       JascoConditioningProvider,
                                                       bind_drums_codec)

SR = 32000


def _make_drums_conditioner(codec, codec_vars, output_dim=8):
    cond = DrumsConditioner(dim=32, output_dim=output_dim, sample_rate=SR,
                            blurring_factor=3,
                            compression_model_latent_dim=32,
                            compression_model_framerate=25,
                            segment_duration=0.4)
    return bind_drums_codec(cond, codec, codec_vars)


def test_drums_tokenize_runs_codec_pipeline():
    codec, codec_vars = get_debug_compression_model(SR)
    cond = _make_drums_conditioner(codec, codec_vars)
    wav = np.random.RandomState(0).randn(2, 1, SR // 2).astype(np.float32)
    x = WavCondition(wav, np.array([SR // 2, 0]), sample_rate=[SR, SR],
                     path=[None, None])
    tok = cond.tokenize(x)
    assert isinstance(tok, dict) and "latents" in tok
    lat = tok["latents"]
    assert lat.shape[0] == 2 and lat.shape[2] == 32
    # coarse-codebook latents: every frame vector is one of <=400 codewords
    assert np.isfinite(lat).all()
    variables = cond.init(jax.random.PRNGKey(0), tok)
    embeds, mask = cond.apply(variables, tok)
    assert embeds.shape == (2, lat.shape[1], 8)
    # null row masked out
    assert np.abs(np.asarray(embeds)[1]).max() == 0.0
    assert np.asarray(mask)[1].max() == 0.0


def test_drums_without_codec_passthrough():
    cond = DrumsConditioner(dim=32, output_dim=8, sample_rate=SR,
                            compression_model_latent_dim=32)
    wav = np.zeros((1, 1, 100), np.float32)
    x = WavCondition(wav, np.array([100]), sample_rate=[SR], path=[None])
    assert isinstance(cond.tokenize(x), WavCondition)


def test_provider_batches_wav_conditions():
    codec, codec_vars = get_debug_compression_model(SR)
    cond = _make_drums_conditioner(codec, codec_vars)
    conds = {"description": LUTConditioner(n_bins=128, dim=8, output_dim=8,
                                           tokenizer="whitespace"),
             "self_wav": cond}
    provider = JascoConditioningProvider(conds, sequence_length=10)
    wav = np.random.RandomState(1).randn(1, 1, SR // 2).astype(np.float32)
    attrs = [
        ConditioningAttributes(
            text={"description": "beat"},
            wav={"self_wav": WavCondition(wav, np.array([SR // 2]),
                                          sample_rate=[SR], path=[None])}),
        ConditioningAttributes(
            text={"description": "other"},
            wav={"self_wav": WavCondition(np.zeros((1, 1, 1), np.float32),
                                          np.array([0]), sample_rate=[SR],
                                          path=[None])}),
    ]
    tok = provider.tokenize(attrs)
    assert "self_wav" in tok
    lat = tok["self_wav"]["latents"]
    assert lat.shape == (2, 10, 32)   # padded to sequence_length
    assert tok["self_wav"]["valid"].reshape(-1).tolist() == [1.0, 0.0]


def test_jasco_generate_with_drums():
    from audiocraft_tpu.models.flow_matching import FlowMatchingModel
    from audiocraft_tpu.models.jasco import JASCO
    from audiocraft_tpu.modules.jasco_conditioners import ChordsEmbConditioner

    codec, codec_vars = get_debug_compression_model(SR)
    dim, chords_dim, drums_dim = 16, 8, 8
    drums = DrumsConditioner(dim=32, output_dim=drums_dim, sample_rate=SR,
                             compression_model_latent_dim=32,
                             compression_model_framerate=25,
                             segment_duration=0.4)
    conditioners = {
        "description": LUTConditioner(n_bins=128, dim=dim, output_dim=dim,
                                      tokenizer="whitespace"),
        "chords": ChordsEmbConditioner(card=194, out_dim=chords_dim),
        "self_wav": drums,
    }
    fuser = ConditionFuser({"cross": ["description"], "prepend": [],
                            "sum": [], "ignore": ["chords", "self_wav"],
                            "input_interpolate": []})
    model = FlowMatchingModel(
        conditioners=conditioners, fuser=fuser, dim=dim, num_heads=4,
        flow_dim=32, chords_dim=chords_dim, drums_dim=drums_dim,
        num_layers=2, skip_connections=True, norm_first=True)
    from audiocraft_tpu.modules.conditioners import SymbolicCondition
    attrs = [ConditioningAttributes(
        text={"description": "init"},
        symbolic={"chords": SymbolicCondition(
            frame_chords=np.zeros((8,), np.int32))},
        wav={"self_wav": WavCondition(np.zeros((1, 1, 1), np.float32),
                                      np.array([0]), sample_rate=[SR],
                                      path=[None])})]
    # binding happens inside JASCO.__init__; bind here too for init
    bind_drums_codec(drums, codec, codec_vars)
    provider = JascoConditioningProvider(conditioners, sequence_length=8)
    tokenized = provider.tokenize(attrs)
    latents = jnp.zeros((1, 8, 32))
    params = model.init(jax.random.PRNGKey(0), latents, jnp.zeros((1,)),
                        tokenized, method=FlowMatchingModel.init_all)
    jasco = JASCO("debug-drums", codec, codec_vars, model, params,
                  max_duration=0.4)
    jasco.set_generation_params(euler=True, euler_steps=2, duration=0.32)
    drums_wav = (np.random.RandomState(2)
                 .randn(1, 1, int(0.3 * SR)).astype(np.float32) * 0.1)
    wav = jasco.generate(["rock beat"], drums_wav=drums_wav)
    wav = np.asarray(wav)
    assert wav.ndim == 3 and wav.shape[0] == 1
    assert np.isfinite(wav).all()


def test_jasco_get_pretrained_wiring(monkeypatch):
    """get_pretrained glues loaders + cfg latent stats into JASCO
    (`ref jasco.py:43-65`)."""
    from audiocraft_tpu.models import jasco as jasco_mod
    from audiocraft_tpu.models import loaders

    codec, codec_vars = get_debug_compression_model(SR)
    debug = jasco_mod.JASCO.get_pretrained("debug")

    monkeypatch.setattr(loaders, "load_compression_model",
                        lambda name: (codec, codec_vars))
    monkeypatch.setattr(
        loaders, "load_jasco_model",
        lambda name, chords_mapping_path=None: (
            debug.model, debug.params,
            {"compression_model_latent_mean": 1.5,
             "compression_model_latent_std": 2.0,
             "chords_mapping_path": chords_mapping_path}))
    model = jasco_mod.JASCO.get_pretrained("facebook/jasco-chords-drums-400M")
    assert model.latent_mean == 1.5 and model.latent_std == 2.0
    assert model.compression_model is codec


def test_provider_mixes_channel_counts():
    """Mono null rows batch with stereo stems (channels harmonized before
    concatenation)."""
    codec, codec_vars = get_debug_compression_model(SR)
    cond = _make_drums_conditioner(codec, codec_vars)
    provider = JascoConditioningProvider(
        {"self_wav": cond}, sequence_length=10)
    stereo = np.random.RandomState(4).randn(1, 2, SR // 2).astype(np.float32)
    attrs = [
        ConditioningAttributes(wav={"self_wav": WavCondition(
            stereo, np.array([SR // 2]), sample_rate=[SR], path=[None])}),
        ConditioningAttributes(wav={"self_wav": WavCondition(
            np.zeros((1, 1, 1), np.float32), np.array([0]),
            sample_rate=[SR], path=[None])}),
    ]
    tok = provider.tokenize(attrs)
    assert tok["self_wav"]["latents"].shape == (2, 10, 32)
    assert tok["self_wav"]["valid"].reshape(-1).tolist() == [1.0, 0.0]
