"""CLAP JAX port: parity vs the in-image `transformers.ClapModel`
(`ref modules/conditioners.py:1021-1089`, `ref metrics/clap_consistency.py`)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_clap():
    """A tiny random HF ClapModel: same architecture family as
    laion/clap-htsat-unfused (HTSAT swin audio tower + RoBERTa text tower),
    shrunk. Resolutions stay >= window size so the swin path is the real
    shifted-window one."""
    from transformers import ClapAudioConfig, ClapConfig, ClapModel, ClapTextConfig
    audio = ClapAudioConfig(
        spec_size=64, patch_size=4, patch_stride=(4, 4), num_mel_bins=16,
        window_size=4, depths=[2, 2], num_attention_heads=[2, 2],
        patch_embeds_hidden_size=16, hidden_size=32,  # 16 * 2^(2-1)
        enable_fusion=False, projection_dim=20)
    text = ClapTextConfig(vocab_size=120, hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=2,
                          intermediate_size=64, max_position_embeddings=64,
                          projection_dim=20, pad_token_id=1)
    cfg = ClapConfig.from_text_audio_configs(text, audio, projection_dim=20)
    torch.manual_seed(0)
    model = ClapModel(cfg).eval()
    # randomize BN running stats so the eval BN path is actually tested
    bn = model.audio_model.audio_encoder.batch_norm
    bn.running_mean.normal_(0, 0.5, generator=torch.Generator().manual_seed(1))
    bn.running_var.uniform_(0.5, 2.0)
    return model


def _save(model, tmp_path, name="clap.pt"):
    pth = tmp_path / name
    torch.save(model.state_dict(), pth)
    return pth


def test_clap_audio_parity(tmp_path):
    import jax.numpy as jnp
    from audiocraft_tpu.modules.clap import clap_audio_apply, load_clap_params

    model = _tiny_clap()
    params, cfg = load_clap_params(_save(model, tmp_path))
    assert cfg["depths"] == [2, 2] and cfg["num_heads"] == [2, 2]
    assert cfg["window_size"] == 4 and cfg["freq_ratio"] == 4

    rng = np.random.RandomState(0)
    # T=200 frames exercises the bicubic time resize (200 < 64*4=256)
    mel = (20 * rng.randn(2, 200, 16) - 30).astype(np.float32)
    with torch.no_grad():
        # HF expects [B, 1, T, F]
        ref = model.get_audio_features(torch.from_numpy(mel)[:, None]).numpy()
    ours = np.asarray(clap_audio_apply(params, cfg, jnp.asarray(mel)))
    assert ours.shape == ref.shape == (2, 20)
    err = np.abs(ours - ref).max()
    assert err < 2e-3, f"clap audio embedding mismatch: {err}"
    assert np.allclose(np.linalg.norm(ours, axis=-1), 1.0, atol=1e-5)


def test_clap_audio_parity_exact_grid(tmp_path):
    """No-resize path: input frames == spec grid width."""
    import jax.numpy as jnp
    from audiocraft_tpu.modules.clap import clap_audio_apply, load_clap_params

    model = _tiny_clap()
    params, cfg = load_clap_params(_save(model, tmp_path))
    rng = np.random.RandomState(1)
    mel = (20 * rng.randn(1, 256, 16) - 30).astype(np.float32)
    with torch.no_grad():
        ref = model.get_audio_features(torch.from_numpy(mel)[:, None]).numpy()
    ours = np.asarray(clap_audio_apply(params, cfg, jnp.asarray(mel)))
    err = np.abs(ours - ref).max()
    assert err < 2e-3, f"clap audio embedding mismatch (exact grid): {err}"


def test_clap_text_parity(tmp_path):
    import jax.numpy as jnp
    from audiocraft_tpu.modules.clap import clap_text_apply, load_clap_params

    model = _tiny_clap()
    params, cfg = load_clap_params(_save(model, tmp_path), text_num_heads=2)
    rng = np.random.RandomState(0)
    ids = rng.randint(2, 120, size=(3, 12))
    mask = np.ones((3, 12), np.int64)
    ids[1, 8:] = 1  # pad
    mask[1, 8:] = 0
    ids[:, 0] = 0  # BOS
    with torch.no_grad():
        ref = model.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask)).numpy()
    ours = np.asarray(clap_text_apply(params, cfg, jnp.asarray(ids),
                                      jnp.asarray(mask)))
    assert ours.shape == ref.shape == (3, 20)
    err = np.abs(ours - ref).max()
    assert err < 2e-3, f"clap text embedding mismatch: {err}"


def test_clap_laion_layout_roundtrip(tmp_path):
    """A laion_clap-layout state dict (audio_branch/text_branch, fused qkv)
    must load to the same embeddings as the HF layout."""
    import jax.numpy as jnp
    from audiocraft_tpu.modules.clap import clap_audio_apply, load_clap_params

    model = _tiny_clap()
    hf_params, cfg = load_clap_params(_save(model, tmp_path))

    # build the laion-style dict by reversing the HF conversion renames
    laion = {}
    for k, v in model.state_dict().items():
        if k.startswith("text_model."):
            k = "module.text_branch." + k[len("text_model."):]
        elif k.startswith("audio_model.audio_encoder.batch_norm."):
            k = "module.audio_branch.bn0." + k.rsplit(".", 1)[-1]
        elif k.startswith("audio_model.audio_encoder."):
            k = "module.audio_branch." + k[len("audio_model.audio_encoder."):]
            k = (k.replace(".layernorm_before.", ".norm1.")
                 .replace(".layernorm_after.", ".norm2.")
                 .replace(".attention.output.dense.", ".attn.proj.")
                 .replace(".attention.self.relative_position_bias_table",
                          ".attn.relative_position_bias_table")
                 .replace(".attention.self.relative_position_index",
                          ".attn.relative_position_index")
                 .replace(".intermediate.dense.", ".mlp.fc1.")
                 .replace(".output.dense.", ".mlp.fc2."))
        elif k.startswith("text_projection.linear1."):
            k = "module.text_projection.0." + k.rsplit(".", 1)[-1]
        elif k.startswith("text_projection.linear2."):
            k = "module.text_projection.2." + k.rsplit(".", 1)[-1]
        elif k.startswith("audio_projection.linear1."):
            k = "module.audio_projection.0." + k.rsplit(".", 1)[-1]
        elif k.startswith("audio_projection.linear2."):
            k = "module.audio_projection.2." + k.rsplit(".", 1)[-1]
        else:
            k = "module." + k
        laion[k] = v
    # fuse q/k/v like laion's WindowAttention.qkv
    fused = {}
    for k, v in list(laion.items()):
        if ".attention.self.query." in k:
            stem, leaf = k.split(".attention.self.query.")
            q = v
            kk = laion[f"{stem}.attention.self.key.{leaf}"]
            vv = laion[f"{stem}.attention.self.value.{leaf}"]
            fused[f"{stem}.attn.qkv.{leaf}"] = torch.cat([q, kk, vv], dim=0)
        elif ".attention.self.key." in k or ".attention.self.value." in k:
            continue
        else:
            fused[k] = v
    pth = tmp_path / "laion_clap.pt"
    torch.save({"state_dict": fused}, pth)
    laion_params, laion_cfg = load_clap_params(pth)
    assert laion_cfg == cfg

    rng = np.random.RandomState(2)
    mel = (20 * rng.randn(1, 256, 16) - 30).astype(np.float32)
    a = np.asarray(clap_audio_apply(hf_params, cfg, jnp.asarray(mel)))
    b = np.asarray(clap_audio_apply(laion_params, cfg, jnp.asarray(mel)))
    assert np.abs(a - b).max() < 1e-6


def test_clap_mel_matches_feature_extractor():
    """Our numpy dB log-mel must match `transformers.ClapFeatureExtractor`
    (the non-fusion rand_trunc path the metric uses)."""
    from transformers import ClapFeatureExtractor
    from audiocraft_tpu.modules.clap import clap_mel

    fe = ClapFeatureExtractor()  # 48 kHz, 64 mels, hop 480, fft 1024
    rng = np.random.RandomState(0)
    # 2 s divides 10 s: repeatpad is pure tiling, so the comparison is exact
    wav = (0.5 * rng.randn(48000 * 2)).astype(np.float64)
    ref = fe(wav, sampling_rate=48000, return_tensors="np",
             truncation="rand_trunc", padding="repeatpad")["input_features"]
    ours = clap_mel(np.tile(wav, 5), n_mels=fe.feature_size,
                    fmin=fe.frequency_min, fmax=fe.frequency_max)
    ref2d = np.squeeze(ref)
    assert ours.shape == ref2d.shape, (ours.shape, ref2d.shape)
    err = np.abs(ours - ref2d).max()
    assert err < 1e-3, f"clap mel mismatch: {err}"


def _tiny_tokenizer_dir(tmp_path):
    """Minimal RoBERTa tokenizer files: char-level vocab, no merges."""
    import json
    d = tmp_path / "tokenizer"
    d.mkdir(exist_ok=True)
    specials = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
    chars = [chr(c) for c in range(33, 127)] + ["Ġ"]  # printable + Ġ
    vocab = {t: i for i, t in enumerate(specials + chars)}
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    return d


def test_clap_embedder_and_metric_end_to_end(tmp_path, monkeypatch):
    """CLAPEmbedder.from_checkpoint + CLAPTextConsistencyMetric availability
    probing through $CLAP_CHECKPOINT (`ref metrics/clap_consistency.py:36-80`)."""
    from audiocraft_tpu.metrics.clap_consistency import CLAPTextConsistencyMetric
    from audiocraft_tpu.modules.clap import CLAPEmbedder

    model = _tiny_clap()
    pth = _save(model, tmp_path)
    tok_dir = _tiny_tokenizer_dir(tmp_path)

    emb = CLAPEmbedder.from_checkpoint(pth, tokenizer_dir=tok_dir,
                                       text_num_heads=2)
    assert emb.tokenizer is not None
    sr = 32000
    rng = np.random.RandomState(0)
    wav = (0.1 * rng.randn(2, 1, sr)).astype(np.float32)
    a = emb.embed_audio(wav, sr)
    t = emb.embed_text(["a dog barking", "piano music"])
    assert a.shape == (2, 20) and t.shape == (2, 20)
    assert np.allclose(np.linalg.norm(a, axis=-1), 1.0, atol=1e-4)
    assert np.allclose(np.linalg.norm(t, axis=-1), 1.0, atol=1e-4)

    monkeypatch.setenv("CLAP_CHECKPOINT", str(pth))
    monkeypatch.setenv("CLAP_TOKENIZER", str(tok_dir))
    metric = CLAPTextConsistencyMetric()
    assert metric.embed_audio_fn is not None and metric.embed_text_fn is not None
    metric.update(wav, ["a dog barking", "piano music"],
                  np.asarray([sr, sr]), np.asarray([sr, sr]))
    cos = metric.compute()
    assert np.isfinite(cos) and -1.0 <= cos <= 1.0

    # without any checkpoint the probe degrades to unavailable, not an error
    monkeypatch.delenv("CLAP_CHECKPOINT")
    monkeypatch.delenv("CLAP_TOKENIZER")
    monkeypatch.delenv("AUDIOCRAFT_CACHE_DIR", raising=False)
    metric2 = CLAPTextConsistencyMetric()
    assert metric2.embed_audio_fn is None
