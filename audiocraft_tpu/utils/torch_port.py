"""Torch checkpoint porting: audiocraft/HF state dicts -> our param pytrees.

The reference ships exported inference packages (`audiocraft/utils/export.py`)
whose `best_state` holds torch tensors under audiocraft module names; HF hub
checkpoints (facebook/musicgen-*, facebook/encodec_*) use the same naming
after `models/loaders.py` unpacking. This module maps those names/layouts to
our parameter trees:

  * conv weight_norm:  weight_g [Cout,1,1] -> kernel_g [Cout];
                       weight_v [Cout,Cin,K] -> kernel_v [K,Cin,Cout]
  * conv transpose:    weight_v [Cin,Cout,K] -> kernel_v [K,Cin,Cout]
  * LSTM:              weight_ih_l<k> [4H,I] -> w_ih [I,4H] (transposed)
  * attention:         in_proj_weight [3E,E] -> [E,3E] (transposed)
  * per-codebook emb/linears lists -> stacked [K, ...] tensors

Zero-egress note: checkpoints must already be on disk (torch .bin/.th or our
.npz exports). Loading torch files uses torch only for deserialization.
"""
import json
import logging
import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _ensure_omegaconf_importable() -> None:
    """Install a minimal unpickle shim when omegaconf isn't installed.

    Reference checkpoints embed OmegaConf DictConfig payloads; unpickling
    them imports omegaconf classes. The shim fabricates classes that just
    capture their pickled state; `_plain_container` unwraps them back to
    plain dict/list/scalars."""
    try:
        import omegaconf  # noqa: F401
        return
    except ImportError:
        pass
    import sys
    import types

    class _StateStub:
        def __setstate__(self, state):
            if isinstance(state, dict):
                self.__dict__.update(state)
            else:
                self.__dict__["_state"] = state

        def __init__(self, *a, **k):
            pass

    def _make_module(name):
        mod = types.ModuleType(name)
        mod.__path__ = []  # package-like for submodule imports

        def __getattr__(attr, _n=name):
            cls = type(attr, (_StateStub,), {"__module__": _n})
            setattr(mod, attr, cls)
            return cls

        mod.__getattr__ = __getattr__
        sys.modules[name] = mod
        return mod

    root = _make_module("omegaconf")
    for sub in ("dictconfig", "listconfig", "base", "nodes", "errors",
                "omegaconf"):
        setattr(root, sub, _make_module(f"omegaconf.{sub}"))


def _plain_container(obj):
    """Unwrap (possibly shim-unpickled) OmegaConf containers to plain data."""
    content = getattr(obj, "_content", None)
    if content is not None:
        return _plain_container(content)
    val = getattr(obj, "_val", None)
    if val is not None or (hasattr(obj, "__dict__") and "_val" in obj.__dict__):
        return _plain_container(obj.__dict__.get("_val"))
    if isinstance(obj, dict):
        return {k: _plain_container(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain_container(v) for v in obj]
    return obj


def _load_torch_state(path: Path) -> tp.Tuple[dict, dict]:
    """Load an audiocraft exported package: (flat state dict, cfg)."""
    import torch
    try:
        # safe path first: refuses pickled code execution
        pkg = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # reference checkpoints embed an OmegaConf cfg payload that
        # weights_only rejects; loading it executes pickle bytecode, so
        # only do this for files the user deliberately placed in the cache
        logging.getLogger(__name__).warning(
            "weights_only load failed for %s; falling back to full pickle "
            "(trusted-checkpoint path)", path)
        _ensure_omegaconf_importable()
        pkg = torch.load(path, map_location="cpu", weights_only=False)
    if "best_state" in pkg:
        state = pkg["best_state"]
        cfg = pkg.get("xp.cfg", {})
    elif "state_dict" in pkg:
        state = pkg["state_dict"]
        cfg = pkg.get("xp.cfg", {})
    else:
        state = pkg
        cfg = {}
    state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
             for k, v in state.items()}
    if not isinstance(cfg, dict):
        cfg = _plain_container(cfg)
        if not isinstance(cfg, dict):
            cfg = dict(cfg) if hasattr(cfg, "keys") else {}
    return state, cfg


# ------------------------------------------------------------- seanet maps

def _seanet_index_map(ratios: tp.Sequence[int], n_residual_layers: int,
                      lstm: int, encoder: bool) -> tp.Dict[int, str]:
    """Map the reference's nn.Sequential indices (`seanet.py:113-153,
    207-258`) to our module names."""
    idx = 0
    out: tp.Dict[int, str] = {}
    if encoder:
        out[idx] = "conv_in"; idx += 1
        for i, _ in enumerate(reversed(tuple(ratios))):
            for j in range(n_residual_layers):
                out[idx] = f"res_{i}_{j}"; idx += 1
            idx += 1  # activation
            out[idx] = f"down_{i}"; idx += 1
        if lstm:
            out[idx] = "lstm"; idx += 1
        idx += 1  # activation
        out[idx] = "conv_out"; idx += 1
    else:
        out[idx] = "conv_in"; idx += 1
        if lstm:
            out[idx] = "lstm"; idx += 1
        for i, _ in enumerate(tuple(ratios)):
            idx += 1  # activation
            out[idx] = f"up_{i}"; idx += 1
            for j in range(n_residual_layers):
                out[idx] = f"res_{i}_{j}"; idx += 1
        idx += 1  # activation
        out[idx] = "conv_out"; idx += 1
    return out


def _convert_conv(src: dict, prefix: str, transpose_conv: bool = False) -> dict:
    """NormConv1d params at `prefix` (e.g. '...conv.') -> our dict."""
    out = {}
    for g_key in (prefix + "conv.weight_g", prefix + "convtr.weight_g",
                  prefix + "weight_g"):
        if g_key in src:
            base = g_key[:-len("weight_g")]
            v = src[base + "weight_v"]
            g = src[g_key].reshape(-1)
            if transpose_conv:
                out["kernel_v"] = v.transpose(2, 0, 1)  # [Cin,Cout,K]->[K,Cin,Cout]
            else:
                out["kernel_v"] = v.transpose(2, 1, 0)  # [Cout,Cin,K]->[K,Cin,Cout]
            out["kernel_g"] = g
            if base + "bias" in src:
                out["bias"] = src[base + "bias"]
            return out
    for w_key in (prefix + "conv.weight", prefix + "convtr.weight",
                  prefix + "weight"):
        if w_key in src:
            base = w_key[:-len("weight")]
            w = src[w_key]
            out["kernel"] = w.transpose(2, 0, 1) if transpose_conv \
                else w.transpose(2, 1, 0)
            if base + "bias" in src:
                out["bias"] = src[base + "bias"]
            return out
    raise KeyError(f"no conv weights under {prefix}")





def _convert_lstm(src: dict, ref_prefix: str, num_layers: int) -> dict:
    """StreamableLSTM `<p>.lstm.weight_ih_l<k>` -> our lstm_<k>/w_ih etc."""
    out = {}
    for k in range(num_layers):
        out[f"lstm_{k}"] = {
            "w_ih": src[f"{ref_prefix}lstm.weight_ih_l{k}"].T,
            "w_hh": src[f"{ref_prefix}lstm.weight_hh_l{k}"].T,
            "b_ih": src[f"{ref_prefix}lstm.bias_ih_l{k}"],
            "b_hh": src[f"{ref_prefix}lstm.bias_hh_l{k}"],
        }
    return out


def _convert_resblock(src: dict, ref_prefix: str, true_skip: bool) -> dict:
    out = {}
    # block: Sequential [act, conv, act, conv] -> reference indices 1, 3
    for our_i, ref_i in enumerate((1, 3)):
        out[f"block_{our_i}"] = {"conv": _convert_conv(
            src, f"{ref_prefix}block.{ref_i}.conv.conv.")}
    if not true_skip:
        out["shortcut"] = {"conv": _convert_conv(
            src, f"{ref_prefix}shortcut.conv.conv.")}
    return out


def convert_seanet(src: dict, ref_root: str, ratios: tp.Sequence[int],
                   n_residual_layers: int, lstm: int, encoder: bool,
                   true_skip: bool = True) -> dict:
    """Full SEANet encoder/decoder state dict -> our params."""
    index_map = _seanet_index_map(ratios, n_residual_layers, lstm, encoder)
    out: dict = {}
    for ref_idx, our_name in index_map.items():
        p = f"{ref_root}model.{ref_idx}."
        if our_name == "lstm":
            out["lstm"] = _convert_lstm(src, p, lstm)
        elif our_name.startswith("res_"):
            out[our_name] = _convert_resblock(src, p, true_skip)
        elif our_name.startswith("up_"):
            out[our_name] = {"convtr": _convert_conv(
                src, p + "convtr.convtr.", transpose_conv=True)}
        else:  # conv_in / down_i / conv_out
            out[our_name] = {"conv": _convert_conv(src, p + "conv.conv.")}
    return out


def convert_rvq(src: dict, ref_root: str, n_q: int):
    """RVQ EMA buffers -> stacked RVQState arrays."""
    from ..quantization.core_vq import CodebookState, RVQState
    import jax.numpy as jnp
    embeds, avgs, sizes, inited = [], [], [], []
    for q in range(n_q):
        p = f"{ref_root}vq.layers.{q}._codebook."
        embeds.append(src[p + "embed"])
        avgs.append(src[p + "embed_avg"])
        sizes.append(src[p + "cluster_size"])
        inited.append(src[p + "inited"].reshape(()))
    return RVQState(codebooks=CodebookState(
        inited=jnp.asarray(np.stack(inited).astype(bool)),
        cluster_size=jnp.asarray(np.stack(sizes)),
        embed=jnp.asarray(np.stack(embeds)),
        embed_avg=jnp.asarray(np.stack(avgs))))


def convert_encodec_state(src: dict, *, ratios: tp.Sequence[int],
                          n_residual_layers: int, lstm: int, n_q: int,
                          true_skip: bool = True) -> dict:
    """audiocraft EncodecModel state dict -> our variables pytree."""
    import jax
    params = {
        "encoder": convert_seanet(src, "encoder.", ratios, n_residual_layers,
                                  lstm, encoder=True, true_skip=true_skip),
        "decoder": convert_seanet(src, "decoder.", ratios, n_residual_layers,
                                  lstm, encoder=False, true_skip=true_skip),
    }
    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    return {"params": params, "quantizer": convert_rvq(src, "quantizer.", n_q)}


def convert_hf_encodec_state(src: dict, *, ratios: tp.Sequence[int],
                             n_residual_layers: int, lstm: int, n_q: int
                             ) -> dict:
    """HF `transformers.EncodecModel` state dict -> our variables pytree.

    HF and audiocraft enumerate the SEANet Sequential identically; only leaf
    naming differs (`encoder.layers.N.conv.parametrizations.weight.original0/1`
    vs `encoder.model.N.conv.conv.weight_g/v`, transposed convs named `conv`,
    `quantizer.layers.q.codebook.*` vs `quantizer.vq.layers.q._codebook.*`).
    Rename to audiocraft convention, then reuse `convert_encodec_state`.
    """
    up_idx = {idx for idx, name in _seanet_index_map(
                  ratios, n_residual_layers, lstm, encoder=False).items()
              if name.startswith("up_")}
    renamed = {}
    for key, val in src.items():
        k = key
        k = k.replace(".parametrizations.weight.original0", ".weight_g")
        k = k.replace(".parametrizations.weight.original1", ".weight_v")
        k = k.replace("quantizer.layers.", "quantizer.vq.layers.")
        k = k.replace(".codebook.", "._codebook.")
        for tower in ("encoder", "decoder"):
            if k.startswith(f"{tower}.layers."):
                k = k.replace(f"{tower}.layers.", f"{tower}.model.", 1)
                parts = k.split(".")
                idx = int(parts[2])
                if "lstm" in k:
                    break
                # duplicate the conv module name (StreamableConv1d wraps
                # NormConv1d wraps Conv1d in audiocraft naming)
                if tower == "decoder" and idx in up_idx and parts[3] == "conv":
                    parts[3] = "convtr.convtr"
                else:
                    # top-level conv, block conv, or shortcut conv
                    ci = parts.index("conv")
                    parts[ci] = "conv.conv"
                k = ".".join(parts)
                break
        renamed[k] = val
    true_skip = not any("shortcut" in k for k in renamed)
    return convert_encodec_state(renamed, ratios=ratios,
                                 n_residual_layers=n_residual_layers,
                                 lstm=lstm, n_q=n_q, true_skip=true_skip)


def load_hf_encodec_from_dir(path: Path):
    """Load an HF EnCodec snapshot dir (config.json + weights) into
    (EncodecModel, variables) — covers facebook/encodec_24khz/32khz, the
    codecs MusicGen/AudioGen checkpoints ship with."""
    import json
    from ..models.encodec import EncodecModel
    from ..modules.seanet import SEANetDecoder, SEANetEncoder
    from ..quantization import ResidualVectorQuantizer

    path = Path(path)
    cfg = json.loads((path / "config.json").read_text())
    assert cfg.get("model_type") == "encodec", cfg.get("model_type")
    weights = None
    if (path / "model.safetensors").exists():
        from safetensors import safe_open  # bundled with transformers
        src = {}
        with safe_open(path / "model.safetensors", framework="np") as f:
            for k in f.keys():
                src[k] = f.get_tensor(k)
    else:
        import torch
        cand = next(p for p in ("pytorch_model.bin", "model.bin")
                    if (path / p).exists())
        weights = torch.load(path / cand, map_location="cpu",
                             weights_only=True)
        src = {k: v.numpy() for k, v in weights.items()}

    ratios = list(cfg["upsampling_ratios"])
    nres = cfg.get("num_residual_layers", 1)
    lstm = cfg.get("num_lstm_layers", 2)
    n_q = len({k.split(".")[2] for k in src if k.startswith("quantizer.")})
    dim = cfg.get("hidden_size", 128)
    sr = cfg.get("sampling_rate", 32000)
    channels = cfg.get("audio_channels", 1)
    true_skip = not cfg.get("use_conv_shortcut", True)

    kw = dict(channels=channels, dimension=dim,
              n_filters=cfg.get("num_filters", 32), n_residual_layers=nres,
              ratios=tuple(ratios), lstm=lstm,
              kernel_size=cfg.get("kernel_size", 7),
              last_kernel_size=cfg.get("last_kernel_size", 7),
              residual_kernel_size=cfg.get("residual_kernel_size", 3),
              dilation_base=cfg.get("dilation_growth_rate", 2),
              causal=cfg.get("use_causal_conv", True),
              true_skip=true_skip,
              norm="weight_norm" if cfg.get("norm_type") == "weight_norm"
              else "none")
    import math
    hop = int(np.prod(ratios))
    model = EncodecModel(SEANetEncoder(**kw), SEANetDecoder(**kw),
                         ResidualVectorQuantizer(
                             dimension=dim, n_q=n_q,
                             bins=cfg.get("codebook_size", 1024),
                             kmeans_init=False),
                         frame_rate=math.ceil(sr / hop), sample_rate=sr,
                         channels=channels,
                         renormalize=cfg.get("normalize", False))
    variables = convert_hf_encodec_state(src, ratios=ratios,
                                         n_residual_layers=nres, lstm=lstm,
                                         n_q=n_q)
    return model, variables


# ----------------------------------------------------------------- LM maps

def convert_lm_state(src: dict, *, n_q: int, num_layers: int,
                     cross_attention: bool = True, bias_proj: bool = False,
                     norm_first: bool = True) -> dict:
    """audiocraft LMModel state dict -> our params pytree
    (stacked emb/linears, transposed matmul weights)."""
    p: dict = {}
    p["emb"] = np.stack([src[f"emb.{k}.weight"] for k in range(n_q)])
    p["linears"] = np.stack([src[f"linears.{k}.weight"].T for k in range(n_q)])
    if bias_proj and "linears.0.bias" in src:
        p["linears_bias"] = np.stack([src[f"linears.{k}.bias"]
                                      for k in range(n_q)])
    if norm_first:
        p["out_norm"] = {"scale": src["out_norm.weight"],
                         "bias": src["out_norm.bias"]}
    p["transformer"] = _convert_streaming_layers(src, "transformer.",
                                                 num_layers, cross_attention)
    return {"params": p}


def _convert_streaming_layers(src: dict, prefix: str, num_layers: int,
                              cross_attention: bool) -> dict:
    """Reference StreamingTransformer layer stack -> our params."""
    tr: dict = {}
    for i in range(num_layers):
        rp = f"{prefix}layers.{i}."
        layer: dict = {
            "self_attn": _convert_mha(src, rp + "self_attn."),
            "norm1": {"scale": src[rp + "norm1.weight"],
                      "bias": src[rp + "norm1.bias"]},
            "norm2": {"scale": src[rp + "norm2.weight"],
                      "bias": src[rp + "norm2.bias"]},
            "linear1": _dense(src, rp + "linear1."),
            "linear2": _dense(src, rp + "linear2."),
        }
        if cross_attention:
            layer["cross_attn"] = _convert_mha(src, rp + "cross_attention.")
            layer["norm_cross"] = {"scale": src[rp + "norm_cross.weight"],
                                   "bias": src[rp + "norm_cross.bias"]}
        tr[f"layers_{i}"] = layer
    return tr


def convert_lm_conditioners(src: dict, model) -> tp.Tuple[dict, dict]:
    """Conditioner weights of an exported LM package -> (params, extra
    variable collections). Keys live under
    `condition_provider.conditioners.<name>.*` (`ref export.py:45-78`;
    T5 is frozen so only its output_proj is in the checkpoint).

    Returns ({"conditioners_<name>": ...}, extras) where extras may hold
    'quantizer' / 'batch_stats' collections (StyleConditioner)."""
    from ..modules.conditioners import (ChromaStemConditioner,
                                        FeatureExtractor, LUTConditioner,
                                        StyleConditioner, T5Conditioner)
    params: dict = {}
    extras: tp.Dict[str, dict] = {}
    for name, cond in getattr(model, "conditioners", {}).items():
        cp = f"condition_provider.conditioners.{name}."
        key = f"conditioners_{name}"
        if not any(k.startswith(cp) for k in src):
            continue
        if isinstance(cond, StyleConditioner):
            dim = cond._TR_ARGS[cond.transformer_scale]["d_model"]
            entry: dict = {"output_proj": _dense(src, cp + "output_proj.")}
            if cp + "embed.weight" in src:          # mert: Linear(768, dim)
                entry["embed"] = _dense(src, cp + "embed.")
            else:                                   # encodec: table list
                n_q = 0
                while f"{cp}embed.{n_q}.weight" in src:
                    n_q += 1
                entry["embed"] = np.stack(
                    [src[f"{cp}embed.{k}.weight"] for k in range(n_q)])
            if cond.transformer_scale != "none":
                n_layers = cond._TR_ARGS[cond.transformer_scale]["num_layers"]
                entry["transformer"] = _convert_streaming_layers(
                    src, cp + "transformer.", n_layers, cross_attention=False)
            params[key] = entry
            if cond.n_q_out > 0 and f"{cp}rvq.vq.layers.0._codebook.embed" in src:
                extras.setdefault("quantizer", {})[key] = {
                    "style_rvq": convert_rvq(src, cp + "rvq.", cond.n_q_out)}
            if cp + "batch_norm.running_mean" in src:
                extras.setdefault("batch_stats", {})[key] = {
                    "bn_mean": src[cp + "batch_norm.running_mean"],
                    "bn_var": src[cp + "batch_norm.running_var"]}
        elif isinstance(cond, LUTConditioner):
            params[key] = {"embed": {"embedding": src[cp + "embed.weight"]},
                           "output_proj": _dense(src, cp + "output_proj.")}
        elif isinstance(cond, (T5Conditioner, ChromaStemConditioner)):
            params[key] = {"output_proj": _dense(src, cp + "output_proj.")}
        elif isinstance(cond, FeatureExtractor):
            entry = {"output_proj": _dense(src, cp + "output_proj.")}
            if cp + "embed.weight" in src:
                entry["embed"] = _dense(src, cp + "embed.")
            else:
                n_q = 0
                while f"{cp}embed.{n_q}.weight" in src:
                    n_q += 1
                entry["embed"] = np.stack(
                    [src[f"{cp}embed.{k}.weight"] for k in range(n_q)])
            params[key] = entry
        else:
            logger.warning("no conversion rule for conditioner %s (%s); "
                           "its weights were skipped", name, type(cond))
    return params, extras


def _dense(src: dict, prefix: str) -> dict:
    out = {"kernel": src[prefix + "weight"].T}
    if prefix + "bias" in src:
        out["bias"] = src[prefix + "bias"]
    return out


def _convert_mha(src: dict, prefix: str) -> dict:
    # the reference's custom-MHA path stores in_proj_* directly; the
    # torch-nn.MultiheadAttention path nests them under `.mha.`
    # (`ref modules/transformer.py:203-230`) — same packing either way
    if prefix + "in_proj_weight" not in src \
            and prefix + "mha.in_proj_weight" in src:
        prefix = prefix + "mha."
    out = {
        "in_proj_weight": src[prefix + "in_proj_weight"].T,
        "out_proj": _dense(src, prefix + "out_proj."),
    }
    if prefix + "in_proj_bias" in src:
        out["in_proj_bias"] = src[prefix + "in_proj_bias"]
    return out


# ------------------------------------------------------------------ T5 map

def convert_t5_encoder(src: dict, num_layers: int) -> dict:
    """HF t5 torch state dict (encoder.*) -> our T5Encoder params."""
    p: dict = {"shared": {"embedding": src["shared.weight"]}}
    for i in range(num_layers):
        rp = f"encoder.block.{i}.layer."
        blk = {
            "ln_attn": {"weight": src[rp + "0.layer_norm.weight"]},
            "attn": {
                "q": {"kernel": src[rp + "0.SelfAttention.q.weight"].T},
                "k": {"kernel": src[rp + "0.SelfAttention.k.weight"].T},
                "v": {"kernel": src[rp + "0.SelfAttention.v.weight"].T},
                "o": {"kernel": src[rp + "0.SelfAttention.o.weight"].T},
            },
            "ln_ff": {"weight": src[rp + "1.layer_norm.weight"]},
        }
        if i == 0:
            blk["attn"]["relative_attention_bias"] = \
                src[rp + "0.SelfAttention.relative_attention_bias.weight"]
        if rp + "1.DenseReluDense.wi.weight" in src:
            blk["wi"] = {"kernel": src[rp + "1.DenseReluDense.wi.weight"].T}
        else:
            blk["wi_0"] = {"kernel": src[rp + "1.DenseReluDense.wi_0.weight"].T}
            blk["wi_1"] = {"kernel": src[rp + "1.DenseReluDense.wi_1.weight"].T}
        blk["wo"] = {"kernel": src[rp + "1.DenseReluDense.wo.weight"].T}
        p[f"block_{i}"] = blk
    p["final_ln"] = {"weight": src["encoder.final_layer_norm.weight"]}
    return p


# ------------------------------------------------------------ entry points

def load_compression_model_from_dir(path: Path):
    """Load a compression model from an exported .th/.bin/.npz
    (`loaders.py:78-109` equivalent)."""
    from ..models import builders
    path = Path(path)
    if path.is_dir():
        cands = (list(path.glob("*.th")) + list(path.glob("*.npz"))
                 + list(path.glob("compression_state_dict.bin")))
        assert cands, f"no checkpoint found in {path}"
        path = cands[0]
    if path.suffix == ".npz":
        # our own exported inference package (utils/export.py)
        import jax
        from .export import load_exported
        from .checkpoint import unflatten_like
        flat, cfg = load_exported(path)
        model = builders.get_compression_model(cfg)
        template = model.init(jax.random.PRNGKey(0))
        return model, unflatten_like(template, flat)
    state, cfg = _load_torch_state(path)
    cfg = cfg or {}
    # audiocraft exports save the full solver cfg with `seanet`/`rvq`/
    # `sample_rate`/`channels` as top-level groups (`utils/export.py:21-43`);
    # our builders expect them nested under `encodec`. Accept either shape.
    enc = dict(cfg.get("encodec", {}))
    for k in ("seanet", "rvq", "sample_rate", "channels"):
        if k not in enc and k in cfg:
            enc[k] = cfg[k]
    enc.setdefault("autoencoder", "seanet")
    enc.setdefault("quantizer", "rvq")
    enc.setdefault("sample_rate", 32000)
    enc.setdefault("channels", 1)
    seanet_cfg = dict(enc.get("seanet", {}))
    # torch EnCodec checkpoints are weight-normed (reference seanet.py default)
    seanet_cfg.setdefault("norm", "weight_norm")
    enc["seanet"] = seanet_cfg
    ratios = tuple(seanet_cfg.get("ratios", [8, 5, 4, 4]))
    nres = seanet_cfg.get("n_residual_layers", 1)
    lstm = seanet_cfg.get("lstm", 2)
    n_q = enc.get("rvq", {}).get("n_q", 4)
    model = builders.get_compression_model(
        {"compression_model": cfg.get("compression_model", "encodec"),
         "encodec": enc})
    variables = convert_encodec_state(state, ratios=ratios,
                                      n_residual_layers=nres, lstm=lstm,
                                      n_q=n_q)
    return model, variables


def load_lm_model_from_dir(path: Path):
    """Load (LMModel, params, cfg) from an exported torch package."""
    from ..models import builders
    path = Path(path)
    if path.is_dir():
        cands = list(path.glob("state_dict.bin")) + list(path.glob("*.th"))
        assert cands, f"no checkpoint found in {path}"
        path = cands[0]
    state, cfg = _load_torch_state(path)
    model = builders.get_lm_model(cfg)
    params = convert_lm_state(
        state, n_q=model.n_q, num_layers=model.num_layers,
        cross_attention=model.cross_attention, bias_proj=model.bias_proj,
        norm_first=model.norm_first)
    cond_params, extras = convert_lm_conditioners(state, model)
    params["params"].update(cond_params)
    for coll, tree in extras.items():
        params[coll] = tree
    params = jax.tree.map(jnp.asarray, params)
    return model, params, cfg


# ------------------------------------------------- MBD / AudioSeal / JASCO

def _plain_resblock(src: dict, rp: str) -> dict:
    """GroupNorm+Conv diffusion ResBlock (`ref models/unet.py:33-56`)."""
    return {
        "norm1": {"scale": src[rp + "norm1.weight"],
                  "bias": src[rp + "norm1.bias"]},
        "conv1": {"kernel": src[rp + "conv1.weight"].transpose(2, 1, 0),
                  "bias": src[rp + "conv1.bias"]},
        "norm2": {"scale": src[rp + "norm2.weight"],
                  "bias": src[rp + "norm2.bias"]},
        "conv2": {"kernel": src[rp + "conv2.weight"].transpose(2, 1, 0),
                  "bias": src[rp + "conv2.bias"]},
    }


def _convert_blstm(src: dict, rp: str, layers: int) -> dict:
    """torch bidirectional nn.LSTM + linear -> our BLSTM params
    (`ref models/unet.py:110-122`)."""
    out: dict = {}
    for i in range(layers):
        out[f"fwd_{i}"] = {
            "w_ih": src[f"{rp}lstm.weight_ih_l{i}"].T,
            "w_hh": src[f"{rp}lstm.weight_hh_l{i}"].T,
            "b_ih": src[f"{rp}lstm.bias_ih_l{i}"],
            "b_hh": src[f"{rp}lstm.bias_hh_l{i}"],
        }
        out[f"bwd_{i}"] = {
            "w_ih": src[f"{rp}lstm.weight_ih_l{i}_reverse"].T,
            "w_hh": src[f"{rp}lstm.weight_hh_l{i}_reverse"].T,
            "b_ih": src[f"{rp}lstm.bias_ih_l{i}_reverse"],
            "b_hh": src[f"{rp}lstm.bias_hh_l{i}_reverse"],
        }
    out["linear"] = _dense(src, rp + "linear.")
    return out


def _convert_transformer_layers(src: dict, ref_prefix: str, num_layers: int,
                                cross_attention: bool,
                                skip_projections: bool = False) -> dict:
    """Shared StreamingTransformer layer-stack conversion
    (`ref modules/transformer.py:454-575`)."""
    tr: dict = {}
    for i in range(num_layers):
        rp = f"{ref_prefix}layers.{i}."
        layer: dict = {
            "self_attn": _convert_mha(src, rp + "self_attn."),
            "norm1": {"scale": src[rp + "norm1.weight"],
                      "bias": src[rp + "norm1.bias"]},
            "norm2": {"scale": src[rp + "norm2.weight"],
                      "bias": src[rp + "norm2.bias"]},
            "linear1": _dense(src, rp + "linear1."),
            "linear2": _dense(src, rp + "linear2."),
        }
        if cross_attention and (
                f"{rp}cross_attention.in_proj_weight" in src
                or f"{rp}cross_attention.mha.in_proj_weight" in src):
            layer["cross_attn"] = _convert_mha(src, rp + "cross_attention.")
            layer["norm_cross"] = {"scale": src[rp + "norm_cross.weight"],
                                   "bias": src[rp + "norm_cross.bias"]}
        tr[f"layers_{i}"] = layer
    if skip_projections:
        for i in range(num_layers // 2):
            tr[f"skip_proj_{i}"] = _dense(
                src, f"{ref_prefix}skip_projections.{i}.")
    return tr


def convert_diffusion_unet(src: dict, *, depth: int = 4,
                           emb_all_layers: bool = True, bilstm: bool = True,
                           use_transformer: bool = False,
                           cross_attention: bool = False,
                           num_transformer_layers: int = 6,
                           res_blocks: int = 1,
                           lstm_layers: int = 2,
                           codec_dim: tp.Optional[int] = None) -> dict:
    """MBD DiffusionUnet torch state dict -> our params
    (`ref models/unet.py:123-214`).

    Reference `decoders` is built with insert(0, ...) so decoders[k] is the
    deepest-first; our dec_{idx} applies idx=depth-1 first, hence
    decoders.{k} <-> dec_{depth-1-k}.
    """
    p: dict = {"embedding": {"embedding": src["embedding.weight"]}}
    for d in range(depth):
        enc: dict = {
            "conv": {"kernel": src[f"encoders.{d}.conv.weight"]
                     .transpose(2, 1, 0)},
            "GroupNorm_0": {"scale": src[f"encoders.{d}.norm.weight"],
                            "bias": src[f"encoders.{d}.norm.bias"]},
        }
        for j in range(res_blocks):
            enc[f"res_{j}"] = _plain_resblock(
                src, f"encoders.{d}.res_blocks.{j}.")
        p[f"enc_{d}"] = enc
        if d > 0 and emb_all_layers:
            p[f"embedding_{d}"] = {
                "embedding": src[f"embeddings.{d - 1}.weight"]}
        ref_k = depth - 1 - d
        dp_ = f"decoders.{ref_k}."
        # flax nn.ConvTranspose correlates (no kernel flip); torch
        # ConvTranspose1d convolves, so flip K when targeting flax
        dec: dict = {
            "convtr": {"kernel": src[dp_ + "convtr.weight"]
                       .transpose(2, 0, 1)[::-1].copy()},
            "GroupNorm_0": {"scale": src[dp_ + "norm.weight"],
                            "bias": src[dp_ + "norm.bias"]},
        }
        for j in range(res_blocks):
            dec[f"res_{j}"] = _plain_resblock(src, f"{dp_}res_blocks.{j}.")
        p[f"dec_{d}"] = dec
    if bilstm:
        p["bilstm"] = _convert_blstm(src, "bilstm.", lstm_layers)
    if use_transformer:
        p["transformer"] = _convert_transformer_layers(
            src, "transformer.", num_transformer_layers, cross_attention)
    if codec_dim is not None and "conv_codec.weight" in src:
        p["conv_codec"] = {"kernel": src["conv_codec.weight"]
                           .transpose(2, 1, 0),
                           "bias": src["conv_codec.bias"]}
    return {"params": jax.tree.map(lambda x: np.asarray(x, np.float32), p)}


def convert_mbp_state(src: dict):
    """MultiBandProcessor buffers -> MBPState
    (`ref modules/diffusion_schedule.py:60-75`)."""
    from ..modules.diffusion_schedule import MBPState
    import jax.numpy as jnp
    return MBPState(
        counts=jnp.asarray(np.asarray(src["counts"], np.float32).reshape(())),
        sum_x=jnp.asarray(np.asarray(src["sum_x"], np.float32)),
        sum_x2=jnp.asarray(np.asarray(src["sum_x2"], np.float32)),
        sum_target_x2=jnp.asarray(np.asarray(src["sum_target_x2"],
                                             np.float32)))


def convert_audioseal_generator(src: dict, *, ratios=(8, 5, 4, 2),
                                n_residual_layers: int = 1,
                                lstm: int = 2) -> dict:
    """audioseal AudioSealWM state dict (`encoder.*`/`decoder.*`/
    `msg_processor.msg_embeddings.weight`) -> our AudioSealWM params."""
    p = {
        "encoder": convert_seanet(src, "encoder.", ratios, n_residual_layers,
                                  lstm, encoder=True),
        "decoder": convert_seanet(src, "decoder.", ratios, n_residual_layers,
                                  lstm, encoder=False),
    }
    if "msg_processor.msg_embeddings.weight" in src:
        p["msg_processor"] = {"msg_emb": {
            "embedding": src["msg_processor.msg_embeddings.weight"]}}
    return {"params": jax.tree.map(lambda x: np.asarray(x, np.float32), p)}


def convert_audioseal_detector(src: dict, *, ratios=(8, 5, 4, 2),
                               n_residual_layers: int = 1,
                               lstm: int = 2) -> dict:
    """audioseal AudioSealDetector state dict -> our params. The torch layout
    is Sequential(SEANetEncoderKeepDimension, Conv1d): `detector.0.model.*`,
    `detector.0.reverse_convolution.*`, `detector.1.*`."""
    p = {
        "encoder": convert_seanet(src, "detector.0.", ratios,
                                  n_residual_layers, lstm, encoder=True),
        "reverse_convolution": {
            # flip K: flax nn.ConvTranspose correlates, torch convolves
            "kernel": src["detector.0.reverse_convolution.weight"]
            .transpose(2, 0, 1)[::-1].copy(),
            "bias": src["detector.0.reverse_convolution.bias"]},
        "head": {"kernel": src["detector.1.weight"].transpose(2, 1, 0),
                 "bias": src["detector.1.bias"]},
    }
    return {"params": jax.tree.map(lambda x: np.asarray(x, np.float32), p)}


def convert_flow_matching_state(src: dict, *, num_layers: int,
                                norm_first: bool = True,
                                bias_proj: bool = False,
                                skip_connections: bool = True,
                                conditioner_specs: tp.Optional[dict] = None
                                ) -> dict:
    """JASCO FlowMatchingModel state dict -> our params
    (`ref models/flow_matching.py:121-242`).

    conditioner_specs: {name: kind} with kind in {'lut', 'chords_emb',
    'melody', 'drums', 't5'} mapping
    `condition_provider.conditioners.<name>.*` keys."""
    p: dict = {
        "emb": {"kernel": src["emb.weight"].T},
        "linear": _dense(src, "linear."),
        "temb_dense_0": _dense(src, "temb.dense.0."),
        "temb_dense_1": _dense(src, "temb.dense.1."),
        "temb_proj": _dense(src, "temb_proj."),
        "transformer": _convert_transformer_layers(
            src, "transformer.", num_layers, cross_attention=True,
            skip_projections=skip_connections),
    }
    if norm_first and "out_norm.weight" in src:
        p["out_norm"] = {"scale": src["out_norm.weight"],
                         "bias": src["out_norm.bias"]}
    for name, kind in (conditioner_specs or {}).items():
        cp = f"condition_provider.conditioners.{name}."
        key = f"conditioners_{name}"
        if kind == "lut":
            p[key] = {"embed": {"embedding": src[cp + "embed.weight"]},
                      "output_proj": _dense(src, cp + "output_proj.")}
        elif kind == "chords_emb":
            p[key] = {"emb": {"embedding": src[cp + "emb.weight"]}}
        elif kind in ("melody", "drums"):
            p[key] = {"output_proj": _dense(src, cp + "output_proj.")}
        elif kind == "t5":
            p[key] = {"output_proj": _dense(src, cp + "output_proj.")}
        else:
            raise ValueError(f"unknown conditioner kind {kind}")
    return {"params": jax.tree.map(lambda x: np.asarray(x, np.float32), p)}


# --------------------------------------------------------------------- DAC

def _wn_conv_params(src: dict, prefix: str, transpose: bool = False) -> dict:
    """Weight-normed (ConvTranspose)1d at `prefix` -> our WNConv params."""
    v = src[prefix + "weight_v"]
    g = src[prefix + "weight_g"].reshape(-1)
    out = {"kernel_g": g, "bias": src[prefix + "bias"]}
    # torch conv [O, I, K] -> [K, I, O]; convtr [I, O, K] -> [K, I, O]
    out["kernel_v"] = v.transpose(2, 0, 1) if transpose else v.transpose(2, 1, 0)
    return out


def _snake(src: dict, prefix: str) -> dict:
    return {"alpha": src[prefix + "alpha"].reshape(-1)}


def _dac_res_unit(src: dict, prefix: str) -> dict:
    """dac ResidualUnit Sequential: [Snake, conv7, Snake, conv1]."""
    return {"snake1": _snake(src, f"{prefix}block.0."),
            "conv1": _wn_conv_params(src, f"{prefix}block.1."),
            "snake2": _snake(src, f"{prefix}block.2."),
            "conv2": _wn_conv_params(src, f"{prefix}block.3.")}


def convert_dac_state(src: dict, *, n_enc_blocks: int = 4,
                      n_dec_blocks: int = 4, n_codebooks: int = 9) -> dict:
    """descript-audio-codec state dict -> our DACModel params
    (dac/model/dac.py: encoder.block.*, decoder.model.*,
    quantizer.quantizers.*)."""
    enc: dict = {"conv_in": _wn_conv_params(src, "encoder.block.0.")}
    for i in range(n_enc_blocks):
        bp = f"encoder.block.{i + 1}."
        blk: dict = {}
        for j in range(3):
            blk[f"res_{j}"] = _dac_res_unit(src, f"{bp}block.{j}.")
        blk["snake"] = _snake(src, f"{bp}block.3.")
        blk["conv"] = _wn_conv_params(src, f"{bp}block.4.")
        enc[f"block_{i}"] = blk
    enc["snake"] = _snake(src, f"encoder.block.{n_enc_blocks + 1}.")
    enc["conv_out"] = _wn_conv_params(src, f"encoder.block.{n_enc_blocks + 2}.")

    dec: dict = {"conv_in": _wn_conv_params(src, "decoder.model.0.")}
    for i in range(n_dec_blocks):
        bp = f"decoder.model.{i + 1}."
        blk = {"snake": _snake(src, f"{bp}block.0."),
               "convtr": _wn_conv_params(src, f"{bp}block.1.",
                                         transpose=True)}
        for j in range(3):
            blk[f"res_{j}"] = _dac_res_unit(src, f"{bp}block.{j + 2}.")
        dec[f"block_{i}"] = blk
    dec["snake"] = _snake(src, f"decoder.model.{n_dec_blocks + 1}.")
    dec["conv_out"] = _wn_conv_params(src, f"decoder.model.{n_dec_blocks + 2}.")

    q: dict = {"codebooks": np.stack(
        [src[f"quantizer.quantizers.{i}.codebook.weight"]
         for i in range(n_codebooks)])}
    for i in range(n_codebooks):
        qp = f"quantizer.quantizers.{i}."
        q[f"in_projs_{i}"] = _wn_conv_params(src, qp + "in_proj.")
        q[f"out_projs_{i}"] = _wn_conv_params(src, qp + "out_proj.")

    params = {"encoder": enc, "decoder": dec, "quantizer": q}
    return {"params": jax.tree.map(lambda x: np.asarray(x, np.float32),
                                   params)}


def load_dac_from_path(path, n_quantizers=None):
    """Local descript-audio-codec checkpoint -> (DAC wrapper, variables).
    Accepts the dac package's weights.pth ({'state_dict', 'metadata'}) or a
    raw state dict."""
    import torch
    from ..models.dac import DAC, DACModel
    pkg = torch.load(Path(path), map_location="cpu", weights_only=True)
    meta_kwargs: dict = {}
    if isinstance(pkg, dict) and "state_dict" in pkg:
        md = pkg.get("metadata", {}) or {}
        kw = md.get("kwargs", md) if isinstance(md, dict) else {}
        for ours, theirs in [("encoder_dim", "encoder_dim"),
                             ("decoder_dim", "decoder_dim"),
                             ("n_codebooks", "n_codebooks"),
                             ("codebook_size", "codebook_size"),
                             ("codebook_dim", "codebook_dim"),
                             ("sample_rate", "sample_rate")]:
            if theirs in kw:
                meta_kwargs[ours] = kw[theirs]
        for ours, theirs in [("encoder_rates", "encoder_rates"),
                             ("decoder_rates", "decoder_rates")]:
            if theirs in kw:
                meta_kwargs[ours] = tuple(kw[theirs])
        state = pkg["state_dict"]
    else:
        state = pkg
    src = {k: v.numpy() for k, v in state.items()}
    model = DACModel(**meta_kwargs)
    variables = convert_dac_state(
        src, n_enc_blocks=len(model.encoder_rates),
        n_dec_blocks=len(model.decoder_rates),
        n_codebooks=model.n_codebooks)
    return DAC(model, n_quantizers), variables


# ------------------------------------------------------------ HTDemucs map

def _demucs_conv2d(src: dict, prefix: str) -> dict:
    """torch Conv2d [out,in,kh,kw] -> flax kernel [kh,kw,in,out]."""
    out = {"kernel": src[prefix + "weight"].transpose(2, 3, 1, 0)}
    if prefix + "bias" in src:
        out["bias"] = src[prefix + "bias"]
    return out


def _demucs_conv1d(src: dict, prefix: str) -> dict:
    out = {"kernel": src[prefix + "weight"].transpose(2, 1, 0)}
    if prefix + "bias" in src:
        out["bias"] = src[prefix + "bias"]
    return out


def _demucs_convtr(src: dict, prefix: str, freq: bool) -> dict:
    """torch ConvTranspose [in,out,k...] -> flax ConvTranspose kernel
    [k...,in,out]; flax correlates, torch convolves, so flip the spatial
    axes."""
    w = src[prefix + "weight"]
    if freq:  # [in, out, kh, kw]
        k = w.transpose(2, 3, 0, 1)[::-1].copy()
    else:     # [in, out, k]
        k = w.transpose(2, 0, 1)[::-1].copy()
    out = {"kernel": k}
    if prefix + "bias" in src:
        out["bias"] = src[prefix + "bias"]
    return out


def _demucs_norm(src: dict, prefix: str) -> dict:
    return {"scale": src[prefix + "weight"], "bias": src[prefix + "bias"]}


def _demucs_dconv(src: dict, prefix: str, depth: int) -> dict:
    out = {}
    for j in range(depth):
        p = f"{prefix}layers.{j}."
        out[f"layers_{j}_conv1"] = _demucs_conv1d(src, p + "0.")
        out[f"layers_{j}_norm1"] = _demucs_norm(src, p + "1.")
        out[f"layers_{j}_conv2"] = _demucs_conv1d(src, p + "3.")
        out[f"layers_{j}_norm2"] = _demucs_norm(src, p + "4.")
        out[f"layers_{j}_scale"] = {"scale": src[p + "6.scale"]}
    return out


def _demucs_tlayer(src: dict, prefix: str, cross: bool) -> dict:
    """MyTransformerEncoderLayer / CrossTransformerEncoderLayer
    (`demucs/transformer.py`) -> modules.demucs._TransformerLayer."""
    attn_p = prefix + ("cross_attn." if cross else "self_attn.")
    out = {
        "attn": {
            "in_proj_weight": src[attn_p + "in_proj_weight"].T,
            "in_proj_bias": src[attn_p + "in_proj_bias"],
            "out_proj": _dense(src, attn_p + "out_proj."),
        },
        "linear1": _dense(src, prefix + "linear1."),
        "linear2": _dense(src, prefix + "linear2."),
        "norm1": _demucs_norm(src, prefix + "norm1."),
        "norm2": _demucs_norm(src, prefix + "norm2."),
        "gamma_1": {"scale": src[prefix + "gamma_1.scale"]},
        "gamma_2": {"scale": src[prefix + "gamma_2.scale"]},
        "norm_out": _demucs_norm(src, prefix + "norm_out."),
    }
    if cross:
        out["norm3"] = _demucs_norm(src, prefix + "norm3.")
    return out


def infer_htdemucs_config(src: dict) -> dict:
    """Read the architecture hyperparameters out of a torch htdemucs state
    dict (shapes define them; see modules/demucs.py HTDemucs fields)."""
    depth = 1 + max(int(k.split(".")[1]) for k in src
                    if k.startswith("encoder."))
    channels = src["encoder.0.conv.weight"].shape[0]
    audio_channels = src["tencoder.0.conv.weight"].shape[1]
    growth = src["encoder.1.conv.weight"].shape[0] // channels
    kernel_size = src["encoder.0.conv.weight"].shape[2]
    hidden = src["encoder.0.dconv.layers.0.0.weight"].shape[0]
    dconv_depth = 1 + max(
        int(k.split(".")[4]) for k in src
        if k.startswith("encoder.0.dconv.layers."))
    t_depth = 1 + max(int(k.split(".")[2]) for k in src
                      if k.startswith("crosstransformer.layers."))
    bottom = (src["channel_upsampler.weight"].shape[0]
              if "channel_upsampler.weight" in src else 0)
    stride = 4  # fixed in demucs for freq/time enc layers
    nfft = src["freq_emb.embedding.weight"].shape[0] * stride * 2
    return dict(depth=depth, channels=channels,
                audio_channels=audio_channels, growth=growth,
                kernel_size=kernel_size, stride=stride,
                dconv_compress=channels // hidden, dconv_depth=dconv_depth,
                t_depth=t_depth, bottom_channels=bottom, nfft=nfft)


def convert_htdemucs(src: dict) -> dict:
    """torch htdemucs state dict -> flax variables for
    `modules.demucs.HTDemucs`. Asserts every source key is consumed so a
    layout drift fails loudly instead of separating garbage."""
    cfg = infer_htdemucs_config(src)
    used: set = set()
    params: dict = {"freq_emb": {"embedding": {
        "embedding": src["freq_emb.embedding.weight"]}}}
    used.add("freq_emb.embedding.weight")

    def mark(prefix):
        used.update(k for k in src if k.startswith(prefix))

    for i in range(cfg["depth"]):
        for name, tp_, freq in [("encoder", "encoder", True),
                                ("tencoder", "tencoder", False)]:
            p = f"{tp_}.{i}."
            conv = (_demucs_conv2d if freq else _demucs_conv1d)(src, p + "conv.")
            rewrite = (_demucs_conv2d if freq else _demucs_conv1d)(
                src, p + "rewrite.")
            params[f"{name}_{i}"] = {
                "conv": conv, "rewrite": rewrite,
                "dconv": _demucs_dconv(src, p + "dconv.",
                                       cfg["dconv_depth"])}
            mark(p)
        for name, freq in [("decoder", True), ("tdecoder", False)]:
            p = f"{name}.{i}."
            params[f"{name}_{i}"] = {
                "rewrite": (_demucs_conv2d if freq else _demucs_conv1d)(
                    src, p + "rewrite."),
                "conv_tr": _demucs_convtr(src, p + "conv_tr.", freq)}
            mark(p)

    if cfg["bottom_channels"]:
        u = _demucs_conv1d(src, "channel_upsampler.")
        params["channel_upsampler"] = {
            "kernel": u["kernel"][None], "bias": u["bias"]}
        d = _demucs_conv1d(src, "channel_downsampler.")
        params["channel_downsampler"] = {
            "kernel": d["kernel"][None], "bias": d["bias"]}
        params["channel_upsampler_t"] = _demucs_conv1d(
            src, "channel_upsampler_t.")
        params["channel_downsampler_t"] = _demucs_conv1d(
            src, "channel_downsampler_t.")
        mark("channel_")

    ct = {"norm_in": _demucs_norm(src, "crosstransformer.norm_in."),
          "norm_in_t": _demucs_norm(src, "crosstransformer.norm_in_t.")}
    for i in range(cfg["t_depth"]):
        cross = i % 2 == 1
        ct[f"layers_{i}"] = _demucs_tlayer(
            src, f"crosstransformer.layers.{i}.", cross)
        ct[f"layers_t_{i}"] = _demucs_tlayer(
            src, f"crosstransformer.layers_t.{i}.", cross)
    params["crosstransformer"] = ct
    mark("crosstransformer.")

    leftover = [k for k in src if k not in used]
    assert not leftover, f"unconsumed htdemucs keys: {leftover[:8]}"
    params = jax.tree.map(jnp.asarray, params)
    return {"params": params}


def load_htdemucs_from_path(path):
    """Load a demucs-package checkpoint (`demucs/states.py` payloads:
    {'klass','args','kwargs','state'} or a raw state dict) and return
    (HTDemucs module, variables)."""
    import torch
    from ..modules.demucs import HTDemucs
    pkg = torch.load(Path(path), map_location="cpu", weights_only=False)
    kwargs: dict = {}
    if isinstance(pkg, dict) and "state" in pkg:
        kwargs = dict(pkg.get("kwargs", {}) or {})
        state = pkg["state"]
    else:
        state = pkg
    src = {k: np.asarray(v.detach().to(torch.float32).numpy())
           for k, v in state.items()}
    cfg = infer_htdemucs_config(src)
    fields = dict(cfg)
    # head count / ffn scale / freq-emb weight are invisible to shapes —
    # read them from the demucs payload kwargs when present so non-default
    # checkpoints don't silently load with wrong attention partitioning
    kw_map = {"sources": "sources", "samplerate": "samplerate",
              "segment": "segment", "t_heads": "t_heads",
              "t_hidden_scale": "t_hidden_scale", "freq_emb":
              "freq_emb_weight", "emb_scale": "emb_scale"}
    for theirs, ours in kw_map.items():
        if theirs in kwargs:
            val = kwargs[theirs]
            fields[ours] = tuple(val) if theirs == "sources" else val
    model = HTDemucs(**fields)
    return model, convert_htdemucs(src)


# --------------------------------------------------------- HuBERT/MERT map

def convert_hubert(src: dict) -> dict:
    """HF transformers Hubert/MERT state dict -> flax variables for
    `modules.mert.MERTModel`. Handles both the old weight-norm naming
    (`pos_conv_embed.conv.weight_g/_v`) and the parametrizations one
    (`...parametrizations.weight.original0/1`)."""
    params: dict = {"feature_extractor": {}}
    n_conv = 1 + max(int(k.split(".")[2]) for k in src
                     if k.startswith("feature_extractor.conv_layers."))
    for i in range(n_conv):
        p = f"feature_extractor.conv_layers.{i}."
        conv = {"kernel": src[p + "conv.weight"].transpose(2, 1, 0)}
        if p + "conv.bias" in src:
            conv["bias"] = src[p + "conv.bias"]
        params["feature_extractor"][f"conv_{i}"] = conv
        if i == 0 and p + "layer_norm.weight" in src:
            params["feature_extractor"]["group_norm"] = _demucs_norm(
                src, p + "layer_norm.")
    params["fp_layer_norm"] = _demucs_norm(src, "feature_projection.layer_norm.")
    params["fp_projection"] = _dense(src, "feature_projection.projection.")

    # weight-normed positional conv: materialize the effective weight
    pc = "encoder.pos_conv_embed.conv."
    if pc + "weight" in src:
        w = src[pc + "weight"]
    else:
        if pc + "weight_g" in src:
            g, v = src[pc + "weight_g"], src[pc + "weight_v"]
        else:
            g = src[pc + "parametrizations.weight.original0"]
            v = src[pc + "parametrizations.weight.original1"]
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)   # torch weight_norm dim=2
    params["pos_conv_embed"] = {"conv": {
        # grouped torch conv [out, in/groups, k] -> flax [k, in/groups, out]
        "kernel": w.transpose(2, 1, 0), "bias": src[pc + "bias"]}}
    params["encoder_layer_norm"] = _demucs_norm(src, "encoder.layer_norm.")

    n_layers = 1 + max(int(k.split(".")[2]) for k in src
                       if k.startswith("encoder.layers."))
    for i in range(n_layers):
        p = f"encoder.layers.{i}."
        params[f"layers_{i}"] = {
            "q_proj": _dense(src, p + "attention.q_proj."),
            "k_proj": _dense(src, p + "attention.k_proj."),
            "v_proj": _dense(src, p + "attention.v_proj."),
            "out_proj": _dense(src, p + "attention.out_proj."),
            "layer_norm": _demucs_norm(src, p + "layer_norm."),
            "intermediate_dense": _dense(
                src, p + "feed_forward.intermediate_dense."),
            "output_dense": _dense(src, p + "feed_forward.output_dense."),
            "final_layer_norm": _demucs_norm(src, p + "final_layer_norm."),
        }
    params = jax.tree.map(jnp.asarray, params)
    return {"params": params}


def load_mert_from_path(path):
    """Load a local MERT/HuBERT torch checkpoint (HF pytorch_model.bin or a
    raw state dict) and return (MERTModel, variables)."""
    import torch
    from ..modules.mert import MERTModel
    p = Path(path)
    if p.is_dir():
        cands = (list(p.glob("model.safetensors"))
                 + list(p.glob("pytorch_model.bin"))
                 + list(p.glob("*.bin")) + list(p.glob("*.pt")))
        assert cands, f"no torch checkpoint under {p}"
        p = cands[0]
    if p.suffix == ".safetensors":
        from safetensors import safe_open
        src = {}
        with safe_open(p, framework="np") as f:
            for k in f.keys():
                src[k.replace("hubert.", "")] = np.asarray(f.get_tensor(k),
                                                           np.float32)
    else:
        state = torch.load(p, map_location="cpu", weights_only=True)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        src = {k.replace("hubert.", ""): np.asarray(
            v.detach().to(torch.float32).numpy())
            for k, v in state.items()}
    hidden = src["feature_projection.projection.weight"].shape[0]
    n_layers = 1 + max(int(k.split(".")[2]) for k in src
                       if k.startswith("encoder.layers."))
    ffn = src["encoder.layers.0.feed_forward.intermediate_dense.weight"].shape[0]
    n_conv = 1 + max(int(k.split(".")[2]) for k in src
                     if k.startswith("feature_extractor.conv_layers."))
    conv_dim = tuple(
        src[f"feature_extractor.conv_layers.{i}.conv.weight"].shape[0]
        for i in range(n_conv))
    kernels = tuple(
        src[f"feature_extractor.conv_layers.{i}.conv.weight"].shape[2]
        for i in range(n_conv))
    pc = "encoder.pos_conv_embed.conv."
    pos_w = src.get(pc + "weight",
                    src.get(pc + "weight_v",
                            src.get(pc + "parametrizations.weight.original1")))
    model = MERTModel(hidden=hidden, num_layers=n_layers,
                      num_heads=max(1, hidden // 64), intermediate=ffn,
                      conv_dim=conv_dim, conv_kernel=kernels,
                      conv_stride=(5,) + (2,) * (n_conv - 1),
                      pos_kernel=pos_w.shape[2],
                      pos_groups=hidden // pos_w.shape[1],
                      conv_bias="feature_extractor.conv_layers.0.conv.bias"
                      in src)
    return model, convert_hubert(src)
