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

import numpy as np

logger = logging.getLogger(__name__)


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
    if hasattr(cfg, "keys") and not isinstance(cfg, dict):
        try:  # OmegaConf
            from omegaconf import OmegaConf  # type: ignore
            cfg = OmegaConf.to_container(cfg)
        except Exception:
            cfg = dict(cfg)
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
    tr: dict = {}
    for i in range(num_layers):
        rp = f"transformer.layers.{i}."
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
    p["transformer"] = tr
    return {"params": p}


def _dense(src: dict, prefix: str) -> dict:
    out = {"kernel": src[prefix + "weight"].T}
    if prefix + "bias" in src:
        out["bias"] = src[prefix + "bias"]
    return out


def _convert_mha(src: dict, prefix: str) -> dict:
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
    return model, params, cfg
