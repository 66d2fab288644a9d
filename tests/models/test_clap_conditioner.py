"""CLAPEmbeddingConditioner end-to-end over the native JAX CLAP towers
(`ref modules/conditioners.py:1067-1293`): the clapemb2music config group
builds, the conditioner embeds text AND audio through a tiny HF-ClapModel
replica checkpoint, and an LM with CLAP conditioning takes a train step."""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

from audiocraft_tpu.config import load_config  # noqa: E402
from audiocraft_tpu.modules.conditioners import (  # noqa: E402
    CLAPEmbeddingConditioner, ConditioningAttributes, JointEmbedCondition,
    set_joint_embed_train)
from tests.metrics.test_clap import _tiny_clap  # noqa: E402


@pytest.fixture(scope="module")
def clap_ckpt(tmp_path_factory):
    """Tiny HF ClapModel state dict + char-level RoBERTa tokenizer files in
    the same directory (so `_find_tokenizer_dir` resolves them)."""
    d = tmp_path_factory.mktemp("clap")
    torch.save(_tiny_clap().state_dict(), d / "clap.pt")
    chars = [chr(c) for c in range(ord("a"), ord("z") + 1)] + ["Ġ"]
    specials = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
    vocab = {t: i for i, t in enumerate(specials + chars)}
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    return str(d / "clap.pt")


def _make_conditioner(clap_ckpt, **kw):
    cfg = load_config("conditioner/clapemb2music")
    clap_cfg = dict(cfg["conditioners"]["description"]["clap"])
    clap_cfg.update(checkpoint=clap_ckpt, dim=20, **kw)
    for k in ("attribute", "cache_path"):
        clap_cfg.pop(k, None)
    return CLAPEmbeddingConditioner(output_dim=16, attribute="description",
                                    **clap_cfg)


def _joint_cond(texts, wav_sec=0.5, sr=48000):
    B = len(texts)
    rs = np.random.RandomState(0)
    T = int(wav_sec * sr)
    return JointEmbedCondition(
        wav=rs.randn(B, 1, T).astype(np.float32) * 0.1, text=list(texts),
        length=np.full((B,), T), sample_rate=[sr] * B, path=[None] * B,
        seek_time=[None] * B)


def test_config_group_builds_conditioner(clap_ckpt):
    """`configs/conditioner/clapemb2music.yaml` -> builders -> conditioner."""
    from audiocraft_tpu.models import builders
    cfg = load_config("conditioner/clapemb2music")
    cfg["conditioners"]["description"]["clap"]["checkpoint"] = clap_ckpt
    conds = builders.get_conditioners(16, cfg)
    assert isinstance(conds["description"], CLAPEmbeddingConditioner)
    assert conds["description"].quantize and conds["description"].n_q == 12


def test_text_and_audio_embeds(clap_ckpt):
    cond = _make_conditioner(clap_ckpt, quantize=False)
    x = _joint_cond(["warm piano", None])
    # eval mode -> text branch; None text -> invalid
    embed, valid = cond._get_embed(x)
    assert embed.shape == (2, 20) and valid.tolist() == [[1.0], [0.0]]
    np.testing.assert_allclose(np.linalg.norm(embed, axis=-1), 1.0,
                               rtol=1e-4)
    # train mode with text_p=0 -> audio branch; both rows valid
    set_joint_embed_train(cond, True, seed=0)
    embed_a, valid_a = cond._get_embed(x)
    assert valid_a.tolist() == [[1.0], [1.0]]
    assert not np.allclose(embed_a[0], embed[0])
    # windowed >10s audio averages chunk embeddings (finite, normalized)
    long = _joint_cond(["x"], wav_sec=21.0)
    embed_l, _ = cond._get_embed(long)
    assert np.isfinite(embed_l).all()
    # text_p=1 at train time -> back to the text branch
    cond_t = _make_conditioner(clap_ckpt, quantize=False, text_p=1.0)
    set_joint_embed_train(cond_t, True, seed=0)
    embed_t, _ = cond_t._get_embed(x)
    np.testing.assert_allclose(embed_t[0], embed[0], atol=1e-5)


def test_nullified_audio_gets_zero_valid(clap_ckpt):
    cond = _make_conditioner(clap_ckpt, quantize=False)
    set_joint_embed_train(cond, True, seed=0)  # audio branch
    null = JointEmbedCondition(
        wav=np.zeros((1, 1, 1), np.float32), text=[None],
        length=np.array([0]), sample_rate=[0], path=[None], seek_time=[None])
    embed, valid = cond._get_embed(null)
    assert valid.tolist() == [[0.0]] and np.isfinite(embed).all()


def test_lm_with_clap_conditioner_trains(clap_ckpt):
    """clapemb-conditioned LM: init (touches the checkpoint through the
    provider tokenize), then one CE train step through the quantize+proj
    device path — the clapemb training mode of ref
    `grids/musicgen/musicgen_clapemb_32khz.py`."""
    import optax
    from audiocraft_tpu.models.lm import (LMModel, init_lm_params,
                                          tokenize_conditions)
    from audiocraft_tpu.modules.conditioners import ConditionFuser
    from audiocraft_tpu.modules.patterns import DelayedPatternProvider
    from audiocraft_tpu.solvers.musicgen import (init_train_state,
                                                 make_train_step)

    cond = _make_conditioner(clap_ckpt, quantize=True, n_q=2, bins=16)
    set_joint_embed_train(cond, True, seed=1)
    fuser = ConditionFuser({"cross": ["description"], "prepend": [],
                            "sum": [], "input_interpolate": []})
    model = LMModel(pattern_provider=DelayedPatternProvider(n_q=2),
                    conditioners={"description": cond}, fuser=fuser,
                    n_q=2, card=32, dim=16, num_heads=2, num_layers=1,
                    causal=True, cross_attention=True, norm_first=True)
    params = init_lm_params(model, jax.random.PRNGKey(0), seq_len=4)
    assert "quantizer" in params  # the RVQ bottleneck collection exists

    step = make_train_step(model, optax.adamw(1e-4))
    state = init_train_state(model, params, optax.adamw(1e-4))
    attrs = []
    for text in ("warm piano", "fast drums"):
        a = ConditioningAttributes(text={"description": text})
        a.joint_embed["description"] = _joint_cond([text], wav_sec=0.3)
        attrs.append(a)
    tokenized = tokenize_conditions(model, attrs)
    codes = jnp.asarray(np.random.RandomState(0).randint(0, 32, (2, 2, 6)))
    state, metrics = step(state, codes, tokenized,
                          jnp.ones((2, 6), bool), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["ce"]))
    state, metrics2 = step(state, codes, tokenized,
                           jnp.ones((2, 6), bool), jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics2["ce"]))
