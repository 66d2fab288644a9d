"""JointEmbeddingConditioner: provider collation, RVQ bottleneck, null drop.
The CLAP subclass is gated (no laion_clap in this image); a stub embedder
exercises the full device path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiocraft_tpu.modules.conditioners import (
    AttributeDropout, CLAPEmbeddingConditioner, ConditioningAttributes,
    ConditioningProvider, JointEmbedCondition, JointEmbeddingConditioner)


class StubJointConditioner(JointEmbeddingConditioner):
    """Deterministic text-hash embedding standing in for CLAP."""
    embed_dim: int = 8

    def _get_embed(self, x: JointEmbedCondition):
        B = x.wav.shape[0]
        embed = np.zeros((B, self.embed_dim), np.float32)
        valid = np.zeros((B,), np.float32)
        for i, text in enumerate(x.text):
            if text:
                rs = np.random.RandomState(abs(hash(text)) % (2 ** 31))
                embed[i] = rs.randn(self.embed_dim)
                valid[i] = 1.0
        return embed, valid


def _attrs(texts):
    out = []
    for t in texts:
        a = ConditioningAttributes(text={})
        a.joint_embed["description"] = JointEmbedCondition(
            wav=np.zeros((1, 1, 10), np.float32), text=[t],
            length=np.array([10]), sample_rate=[16000], path=[None],
            seek_time=[None])
        out.append(a)
    return out


def test_joint_embed_end_to_end():
    cond = StubJointConditioner(output_dim=16, quantize=True, n_q=2, bins=8)
    provider = ConditioningProvider({"description": cond})
    tokenized = provider.tokenize(_attrs(["rock", None]))
    assert "description" in tokenized
    variables = cond.init(jax.random.PRNGKey(0), tokenized["description"])
    (embeds, mask), _ = cond.apply(variables, tokenized["description"],
                                   mutable=["quantizer"])
    assert embeds.shape == (2, 1, 16) and mask.shape == (2, 1)
    # second sample had no text -> nulled output and mask
    assert np.asarray(mask)[1, 0] == 0.0
    assert (np.asarray(embeds)[1] == 0).all()
    assert np.asarray(mask)[0, 0] == 1.0
    assert np.abs(np.asarray(embeds)[0]).sum() > 0


def test_joint_embed_attribute_dropout():
    drop = AttributeDropout(p={"joint_embed": {"description": 1.0}}, seed=0)
    drop.active_on_eval = True
    dropped = drop(_attrs(["jazz"]))
    cond = StubJointConditioner(output_dim=16)
    provider = ConditioningProvider({"description": cond})
    tokenized = provider.tokenize(dropped)
    assert tokenized["description"]["valid"].sum() == 0


def test_clap_conditioner_constructs_without_checkpoint():
    """Construction and device-side init never touch the checkpoint; only
    the first host-side `_get_embed` resolves it (and raises a clear error
    when none exists). Full embed-path coverage with a tiny replica
    checkpoint lives in tests/models/test_clap_conditioner.py."""
    c = CLAPEmbeddingConditioner(output_dim=16, checkpoint="/nonexistent.pt")
    variables = c.init(jax.random.PRNGKey(0),
                       {"embed": np.zeros((1, 8), np.float32),
                        "valid": np.ones((1, 1), np.float32)})
    emb, mask = c.apply(variables,
                        {"embed": np.ones((1, 8), np.float32),
                         "valid": np.ones((1, 1), np.float32)})
    assert emb.shape == (1, 1, 16)
    with pytest.raises(RuntimeError, match="no CLAP checkpoint"):
        c._get_embed(JointEmbedCondition(
            wav=np.zeros((1, 1, 1), np.float32), text=["hi"],
            length=np.array([1]), sample_rate=[48000], path=[None],
            seek_time=[None]))


def test_chroma_embedding_cache(tmp_path):
    """Per-file chroma cache with seek-based extraction
    (`conditioners.py:646-658`)."""
    from audiocraft_tpu.data.audio import audio_write
    from audiocraft_tpu.modules.conditioners import (ChromaStemConditioner,
                                                     WavCondition)
    sr = 16000
    wav = (0.3 * np.sin(2 * np.pi * 330 * np.arange(sr) / sr)
           ).astype(np.float32)[None]
    path = str(audio_write(tmp_path / "tone", wav, sr))
    cond = ChromaStemConditioner(dim=12, output_dim=8, sample_rate=sr,
                                 n_chroma=12, radix2_exp=10, duration=0.5,
                                 cache_path=str(tmp_path / "cache"))
    x = WavCondition(wav=np.zeros((1, 1, sr // 2), np.float32),
                     length=np.array([sr // 2]), sample_rate=[sr],
                     path=[path], seek_time=[0.0])
    tok = cond.tokenize(x)
    assert isinstance(tok, dict) and "chroma" in tok
    tok2 = cond.tokenize(x)  # second hit reads from disk cache
    np.testing.assert_allclose(tok["chroma"], tok2["chroma"])
    assert len(list((tmp_path / "cache" / "wav").iterdir())) == 1
    variables = cond.init(jax.random.PRNGKey(0), tok)
    emb, mask = cond.apply(variables, tok)
    assert emb.shape[0] == 1 and np.isfinite(np.asarray(emb)).all()
