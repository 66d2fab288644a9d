"""Checkpoint loading paths: HF EnCodec snapshot conversion (numerical parity
vs torch) and our npz inference exports."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_hf_encodec_snapshot_parity(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import EncodecConfig, EncodecModel as HFEncodec
    from audiocraft_tpu.utils.torch_port import load_hf_encodec_from_dir

    cfg = EncodecConfig(audio_channels=1, num_filters=8,
                        num_residual_layers=1, upsampling_ratios=[4, 2],
                        codebook_size=32, hidden_size=16, num_lstm_layers=1,
                        target_bandwidths=[20.0, 40.0], sampling_rate=16000,
                        use_conv_shortcut=False)
    torch.manual_seed(0)
    hf = HFEncodec(cfg).eval()
    hf.save_pretrained(tmp_path)

    model, variables = load_hf_encodec_from_dir(tmp_path)
    assert model.quantizer.n_q == 4

    x = np.random.RandomState(0).randn(1, 1, 800).astype(np.float32) * 0.3
    with torch.no_grad():
        enc = hf.encode(torch.from_numpy(x), bandwidth=40.0)
        hf_codes = enc.audio_codes[0].numpy()
        hf_wav = hf.decode(enc.audio_codes, enc.audio_scales)[0].numpy()
    codes, _ = model.encode(variables, jnp.asarray(x))
    assert (np.asarray(codes) == hf_codes).mean() > 0.98
    wav = np.asarray(model.decode(variables, jnp.asarray(hf_codes)))
    T = min(wav.shape[-1], hf_wav.shape[-1])
    np.testing.assert_allclose(wav[..., :T], hf_wav[..., :T], atol=1e-4)


def test_npz_export_restore_roundtrip(tmp_path):
    from audiocraft_tpu.models.builders import get_debug_compression_model
    from audiocraft_tpu.utils.export import export_encodec
    from audiocraft_tpu.utils.torch_port import load_compression_model_from_dir

    model, variables = get_debug_compression_model(sample_rate=32000)
    cfg = {"compression_model": "encodec",
           "encodec": {"autoencoder": "seanet", "quantizer": "rvq",
                       "sample_rate": 32000, "channels": 1,
                       "seanet": {"n_filters": 4, "n_residual_layers": 1,
                                  "dimension": 32, "ratios": [10, 8, 16]},
                       "rvq": {"dimension": 32, "bins": 400, "n_q": 4,
                               "kmeans_init": False}}}
    export_encodec(variables, cfg, tmp_path / "compression.npz")
    m2, v2 = load_compression_model_from_dir(tmp_path)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 1, 3200)
                    .astype(np.float32))
    c1, _ = model.encode(variables, x)
    c2, _ = m2.encode(v2, x)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    w1 = np.asarray(model.decode(variables, c1))
    w2 = np.asarray(m2.decode(v2, c2))
    np.testing.assert_array_equal(w1, w2)
