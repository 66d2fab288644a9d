"""Checkpoint-port tests: synthetic audiocraft-named state dicts convert into
our param trees and run. Numerical orientation of each mapping rule is covered
by the torch-parity tests in tests/modules/."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiocraft_tpu.utils import torch_port


def _rand(rs, *shape):
    return rs.randn(*shape).astype(np.float32) * 0.05


def _synthetic_encodec_state(ratios=(4, 2), nres=1, lstm=1, dim=16,
                             n_filters=4, n_q=2, bins=32, seed=0):
    """Build an audiocraft-named EnCodec state dict with correct shapes."""
    rs = np.random.RandomState(seed)
    src = {}

    def conv(prefix, cin, cout, k):
        src[prefix + "weight_g"] = np.abs(_rand(rs, cout, 1, 1)) + 0.5
        src[prefix + "weight_v"] = _rand(rs, cout, cin, k)
        src[prefix + "bias"] = _rand(rs, cout)

    def convtr(prefix, cin, cout, k):
        src[prefix + "weight_g"] = np.abs(_rand(rs, cin, 1, 1)) + 0.5
        src[prefix + "weight_v"] = _rand(rs, cin, cout, k)
        src[prefix + "bias"] = _rand(rs, cout)

    # --- encoder (ratios reversed) -----------------------------------
    enc_ratios = list(reversed(ratios))
    idx = 0
    mult = 1
    conv(f"encoder.model.{idx}.conv.conv.", 1, mult * n_filters, 7); idx += 1
    for ratio in enc_ratios:
        ch = mult * n_filters
        for j in range(nres):
            conv(f"encoder.model.{idx}.block.1.conv.conv.", ch, ch // 2, 3)
            conv(f"encoder.model.{idx}.block.3.conv.conv.", ch // 2, ch, 1)
            idx += 1
        idx += 1  # activation
        conv(f"encoder.model.{idx}.conv.conv.", ch, ch * 2, ratio * 2); idx += 1
        mult *= 2
    ch = mult * n_filters
    for k in range(lstm):
        src[f"encoder.model.{idx}.lstm.weight_ih_l{k}"] = _rand(rs, 4 * ch, ch)
        src[f"encoder.model.{idx}.lstm.weight_hh_l{k}"] = _rand(rs, 4 * ch, ch)
        src[f"encoder.model.{idx}.lstm.bias_ih_l{k}"] = _rand(rs, 4 * ch)
        src[f"encoder.model.{idx}.lstm.bias_hh_l{k}"] = _rand(rs, 4 * ch)
    idx += 1
    idx += 1  # activation
    conv(f"encoder.model.{idx}.conv.conv.", ch, dim, 7)

    # --- decoder -------------------------------------------------------
    idx = 0
    mult = 2 ** len(ratios)
    conv(f"decoder.model.{idx}.conv.conv.", dim, mult * n_filters, 7); idx += 1
    ch = mult * n_filters
    for k in range(lstm):
        src[f"decoder.model.{idx}.lstm.weight_ih_l{k}"] = _rand(rs, 4 * ch, ch)
        src[f"decoder.model.{idx}.lstm.weight_hh_l{k}"] = _rand(rs, 4 * ch, ch)
        src[f"decoder.model.{idx}.lstm.bias_ih_l{k}"] = _rand(rs, 4 * ch)
        src[f"decoder.model.{idx}.lstm.bias_hh_l{k}"] = _rand(rs, 4 * ch)
    idx += 1
    for ratio in ratios:
        ch = mult * n_filters
        idx += 1  # activation
        convtr(f"decoder.model.{idx}.convtr.convtr.", ch, ch // 2, ratio * 2)
        idx += 1
        for j in range(nres):
            conv(f"decoder.model.{idx}.block.1.conv.conv.", ch // 2, ch // 4, 3)
            conv(f"decoder.model.{idx}.block.3.conv.conv.", ch // 4, ch // 2, 1)
            idx += 1
        mult //= 2
    idx += 1  # activation
    conv(f"decoder.model.{idx}.conv.conv.", n_filters, 1, 7)

    # --- quantizer -------------------------------------------------------
    for q in range(n_q):
        p = f"quantizer.vq.layers.{q}._codebook."
        src[p + "embed"] = _rand(rs, bins, dim)
        src[p + "embed_avg"] = _rand(rs, bins, dim)
        src[p + "cluster_size"] = np.abs(_rand(rs, bins)) + 1
        src[p + "inited"] = np.array([1.0])
    return src


def test_encodec_state_conversion_runs():
    from audiocraft_tpu.modules.seanet import SEANetDecoder, SEANetEncoder
    from audiocraft_tpu.quantization import ResidualVectorQuantizer
    from audiocraft_tpu.models.encodec import EncodecModel

    ratios, nres, lstm, dim, nf, n_q, bins = (4, 2), 1, 1, 16, 4, 2, 32
    src = _synthetic_encodec_state(ratios, nres, lstm, dim, nf, n_q, bins)
    variables = torch_port.convert_encodec_state(
        src, ratios=ratios, n_residual_layers=nres, lstm=lstm, n_q=n_q)

    kw = dict(channels=1, dimension=dim, n_filters=nf, n_residual_layers=nres,
              ratios=ratios, lstm=lstm, norm="weight_norm")
    model = EncodecModel(SEANetEncoder(**kw), SEANetDecoder(**kw),
                         ResidualVectorQuantizer(dimension=dim, n_q=n_q,
                                                 bins=bins, kmeans_init=False),
                         frame_rate=2000, sample_rate=16000, channels=1)
    # structure check against a fresh init
    ref_vars = model.init(jax.random.PRNGKey(0), segment_length=64)
    ref_shapes = jax.tree.map(lambda x: x.shape, ref_vars["params"])
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, variables["params"])
    assert ref_shapes == got_shapes

    # converted weights actually run the codec round trip
    x = jnp.asarray(np.random.RandomState(1).randn(1, 1, 64).astype(np.float32))
    codes, scale = model.encode(variables, x)
    wav = model.decode(variables, codes)
    assert np.isfinite(np.asarray(wav)).all()
    assert (np.asarray(codes) < bins).all()


def _synthetic_lm_state(n_q=2, card=40, dim=16, ffn=32, layers=2, seed=0):
    rs = np.random.RandomState(seed)
    src = {}
    for k in range(n_q):
        src[f"emb.{k}.weight"] = _rand(rs, card + 1, dim)
        src[f"linears.{k}.weight"] = _rand(rs, card, dim)
    src["out_norm.weight"] = np.ones(dim, np.float32)
    src["out_norm.bias"] = np.zeros(dim, np.float32)
    for i in range(layers):
        p = f"transformer.layers.{i}."
        src[p + "self_attn.in_proj_weight"] = _rand(rs, 3 * dim, dim)
        src[p + "self_attn.out_proj.weight"] = _rand(rs, dim, dim)
        src[p + "cross_attention.in_proj_weight"] = _rand(rs, 3 * dim, dim)
        src[p + "cross_attention.out_proj.weight"] = _rand(rs, dim, dim)
        src[p + "norm1.weight"] = np.ones(dim, np.float32)
        src[p + "norm1.bias"] = np.zeros(dim, np.float32)
        src[p + "norm2.weight"] = np.ones(dim, np.float32)
        src[p + "norm2.bias"] = np.zeros(dim, np.float32)
        src[p + "norm_cross.weight"] = np.ones(dim, np.float32)
        src[p + "norm_cross.bias"] = np.zeros(dim, np.float32)
        src[p + "linear1.weight"] = _rand(rs, ffn, dim)
        src[p + "linear2.weight"] = _rand(rs, dim, ffn)
    return src


def test_lm_state_conversion_runs():
    from audiocraft_tpu.models.builders import get_debug_lm_model
    model, ref_params = get_debug_lm_model()
    src = _synthetic_lm_state(n_q=model.n_q, card=model.card, dim=model.dim,
                              ffn=model.dim * model.hidden_scale,
                              layers=model.num_layers)
    converted = torch_port.convert_lm_state(
        src, n_q=model.n_q, num_layers=model.num_layers,
        cross_attention=True, bias_proj=model.bias_proj, norm_first=True)
    # note: debug LM is norm_first=False and has a conditioner; graft the
    # transformer/emb/linears into the reference tree and check shapes match
    for key in ("emb", "linears"):
        assert np.asarray(converted["params"][key]).shape == \
            np.asarray(ref_params["params"][key]).shape
    for i in range(model.num_layers):
        ours = ref_params["params"]["transformer"][f"layers_{i}"]
        theirs = converted["params"]["transformer"][f"layers_{i}"]
        assert np.asarray(theirs["self_attn"]["in_proj_weight"]).shape == \
            np.asarray(ours["self_attn"]["in_proj_weight"]).shape
        assert np.asarray(theirs["linear1"]["kernel"]).shape == \
            np.asarray(ours["linear1"]["kernel"]).shape


def test_t5_conversion_shapes():
    from audiocraft_tpu.modules.t5 import T5Encoder, T5EncoderConfig
    cfg = T5EncoderConfig(vocab_size=100, d_model=16, d_kv=4, d_ff=32,
                          num_layers=2, num_heads=4)
    rs = np.random.RandomState(0)
    src = {"shared.weight": _rand(rs, 100, 16),
           "encoder.final_layer_norm.weight": np.ones(16, np.float32)}
    for i in range(2):
        p = f"encoder.block.{i}.layer."
        for m in "qkvo":
            src[p + f"0.SelfAttention.{m}.weight"] = _rand(rs, 16, 16)
        src[p + "0.layer_norm.weight"] = np.ones(16, np.float32)
        src[p + "1.layer_norm.weight"] = np.ones(16, np.float32)
        src[p + "1.DenseReluDense.wi.weight"] = _rand(rs, 32, 16)
        src[p + "1.DenseReluDense.wo.weight"] = _rand(rs, 16, 32)
    src["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"] = \
        _rand(rs, 32, 4)
    params = {"params": torch_port.convert_t5_encoder(src, 2)}
    enc = T5Encoder(cfg)
    tokens = jnp.asarray(np.random.RandomState(1).randint(0, 100, (2, 7)))
    mask = jnp.ones((2, 7), jnp.int32)
    out = enc.apply(params, tokens, mask)
    assert out.shape == (2, 7, 16)
    assert np.isfinite(np.asarray(out)).all()
