"""export_pretrained_compression_model round trip (`ref export.py:79-96`)
and per-module optimizer param groups (`ref builders.py:68-93`)."""
import numpy as np

import jax
import jax.numpy as jnp


def test_export_pretrained_round_trip(tmp_path):
    from audiocraft_tpu.models.encodec import CompressionModel
    from audiocraft_tpu.utils.export import export_pretrained_compression_model

    out = export_pretrained_compression_model(
        "debug_compression_model", tmp_path / "codec.npz")
    assert out.exists()
    model, variables = CompressionModel.get_pretrained(str(out))
    ref_model, ref_vars = CompressionModel.get_pretrained(
        "debug_compression_model")
    assert model.sample_rate == ref_model.sample_rate
    assert model.frame_rate == ref_model.frame_rate
    x = jnp.asarray(0.1 * np.random.RandomState(0).randn(
        1, model.channels, model.sample_rate).astype(np.float32))
    codes, _ = model.encode(variables, x)
    ref_codes, _ = ref_model.encode(ref_vars, x)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(ref_codes))


def test_optim_parameter_groups_apply_different_lr():
    import optax
    from audiocraft_tpu.solvers.builders import (get_optim_parameter_groups,
                                                 get_optimizer)
    params = {"params": {
        "transformer": {"w": jnp.ones((4,))},
        "emb": {"table": jnp.ones((4,))},
    }}
    labels, groups = get_optim_parameter_groups(
        params, {"transformer": {"lr": 1e-2, "weight_decay": 0.0}})
    opt = get_optimizer({"optimizer": "adam", "lr": 1e-4}, 10,
                        param_groups=(labels, groups))
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    up_tr = float(np.abs(updates["params"]["transformer"]["w"]).mean())
    up_emb = float(np.abs(updates["params"]["emb"]["table"]).mean())
    # adam's first update is ~lr per group: 1e-2 vs 1e-4
    assert up_tr > 50 * up_emb, (up_tr, up_emb)


def test_make_optim_group_consumed_via_cfg():
    """transformer_lm.lr flows into a multi_transform optimizer in the
    MusicGen solver."""
    import optax
    from audiocraft_tpu.solvers.musicgen import MusicGenSolver
    solver = MusicGenSolver({
        "seed": 0, "sample_rate": 32000,
        "compression_model_checkpoint": "debug",
        "transformer_lm": {"dim": 16, "num_heads": 2, "num_layers": 1,
                           "n_q": 4, "card": 400, "norm_first": True,
                           "lr": 5e-3, "weight_decay": 0.01},
        "codebooks_pattern": {"modeling": "delay",
                              "delay": {"delays": [0, 1, 2, 3]}},
        "fuser": {"cross": ["description"], "prepend": [], "sum": [],
                  "input_interpolate": []},
        "conditioners": {"description": {
            "model": "lut",
            "lut": {"n_bins": 32, "dim": 16, "tokenizer": "whitespace"}}},
    })
    # a state exists and one step with the grouped optimizer is finite
    wav = (0.1 * np.random.RandomState(0).randn(1, 1, 6400)).astype(np.float32)
    from audiocraft_tpu.data.audio_dataset import AudioMeta
    from audiocraft_tpu.data.info_audio_dataset import AudioInfo
    from audiocraft_tpu.data.music_dataset import MusicInfo
    infos = [MusicInfo(**AudioInfo(AudioMeta("x.wav", 0.2, 32000), 0.0,
                                   6400, 6400, 32000, 1).to_dict(),
                       description="group test")]
    m = solver.run_step(0, (wav, infos), {})
    assert np.isfinite(float(np.asarray(m["ce"])))
