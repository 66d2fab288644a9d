"""CLAP (contrastive language-audio pretraining) in JAX.

Parity: the reference conditions on and evaluates with LAION-CLAP through the
`laion_clap` pip package (`ref modules/conditioners.py:1021-1089`,
`ref metrics/clap_consistency.py:36-80`), which cannot be installed here and
whose checkpoints cannot be downloaded (zero-egress). This module is a
first-party port of the CLAP inference path:

- the audio tower is HTSAT — a Swin transformer over 48 kHz log-mel
  spectrograms: BatchNorm over mel bins, the HTSAT mel->image reshape
  (time split into `freq_ratio` chunks stacked along frequency), 4x4 conv
  patch embed, windowed attention with relative position bias and shifted
  windows, patch merging between stages, mean-pooled features;
- the text tower is a RoBERTa encoder (post-LN BERT layers, offset position
  ids, tanh pooler over the CLS token);
- both towers feed 2-layer MLP projections (linear-ReLU-linear) and the
  embeddings are L2-normalized.

Semantics follow the HuggingFace `transformers.ClapModel` port of LAION-CLAP
(the in-image ground truth the parity tests run against —
`tests/metrics/test_clap.py`). Weights load from a local checkpoint in
either HF layout (`text_model.*` / `audio_model.audio_encoder.*`) or the
raw laion_clap layout (`audio_branch.*` / `text_branch.*`, fused qkv), which
is re-keyed on load. Fusion variants are not supported.
"""
import logging
import typing as tp
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

SAMPLE_RATE = 48000
N_FFT = 1024
HOP_LENGTH = 480
MAX_LENGTH_S = 10.0
TEXT_MAX_TOKENS = 77


# ------------------------------------------------------------ preprocessing

def _mel_filter_bank(n_freqs: int, n_mels: int, fmin: float, fmax: float,
                     sample_rate: float, scale: str = "slaney") -> np.ndarray:
    """Triangular mel filterbank [n_freqs, n_mels]; slaney scale + slaney
    norm (the HF ClapFeatureExtractor non-fusion path) or htk."""
    from ..ops.stft import mel_filters
    htk = scale == "htk"
    return mel_filters(int(sample_rate), 2 * (n_freqs - 1), n_mels,
                       fmin, fmax, htk=htk, norm=None if htk else "slaney")


def clap_mel(wav: np.ndarray, n_mels: int = 64, fmin: float = 50.0,
             fmax: float = 14000.0) -> np.ndarray:
    """[T] mono 48 kHz waveform -> [frames, n_mels] dB log-mel, matching
    `transformers.ClapFeatureExtractor` (power STFT with periodic hann,
    centered reflect padding, slaney mel, 10*log10)."""
    x = np.asarray(wav, np.float32)
    pad = N_FFT // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - N_FFT) // HOP_LENGTH
    idx = (np.arange(N_FFT)[None, :]
           + HOP_LENGTH * np.arange(n_frames)[:, None])
    window = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(N_FFT)
                                 / N_FFT)).astype(np.float64)  # periodic
    spec = np.abs(np.fft.rfft(x[idx] * window, axis=-1)) ** 2
    mel = spec @ _mel_filter_bank(spec.shape[-1], n_mels, fmin, fmax,
                                  SAMPLE_RATE).astype(np.float64)
    return (10.0 * np.log10(np.maximum(mel, 1e-10))).astype(np.float32)


def _bicubic_time_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] interpolation matrix: torch bicubic, align_corners=True
    (the HTSAT mel->img resize of the time axis)."""
    a = -0.75

    def kernel(x):
        x = np.abs(x)
        return np.where(
            x <= 1, (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1,
            np.where(x < 2, a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a,
                     0.0))

    W = np.zeros((n_out, n_in))
    scale = (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
    for i in range(n_out):
        src = i * scale
        base = int(np.floor(src))
        for k in range(-1, 3):
            idx = min(max(base + k, 0), n_in - 1)
            W[i, idx] += kernel(src - (base + k))
    return W.astype(np.float32)


# ------------------------------------------------------------------ network

def _layer_norm(x, p, eps):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]


def _lin(x, p):
    return x @ p["kernel"] + p["bias"]


def _rel_position_index(ws: int) -> np.ndarray:
    """Swin relative position index [ws*ws, ws*ws] into the bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + np.array([ws - 1, ws - 1])
    return rel[..., 0] * (2 * ws - 1) + rel[..., 1]


def _shift_attn_mask(Hp: int, Wp: int, ws: int, shift: int) -> np.ndarray:
    """[nW, ws*ws, ws*ws] additive mask for shifted-window attention."""
    img = np.zeros((Hp, Wp))
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[h, w] = cnt
            cnt += 1
    win = img.reshape(Hp // ws, ws, Wp // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def _swin_block(x, p, H: int, W: int, ws: int, shift: int, n_heads: int):
    """One HTSAT/Swin layer: shifted-window attention with relative position
    bias + MLP, both with pre-LN residuals (HF `ClapAudioLayer`)."""
    B, N, C = x.shape
    shortcut = x
    x = _layer_norm(x, p["ln1"], 1e-5).reshape(B, H, W, C)
    pad_b, pad_r = (ws - H % ws) % ws, (ws - W % ws) % ws
    x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    Hp, Wp = H + pad_b, W + pad_r
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    nW = (Hp // ws) * (Wp // ws)
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B * nW, ws * ws, C)

    hd = C // n_heads

    def heads(t):
        return t.reshape(-1, ws * ws, n_heads, hd).transpose(0, 2, 1, 3)
    q = heads(_lin(x, p["q"])) / np.sqrt(hd)
    k, v = heads(_lin(x, p["k"])), heads(_lin(x, p["v"]))
    attn = q @ k.transpose(0, 1, 3, 2)  # [B*nW, nH, N, N]
    bias = p["rel_bias_table"][_rel_position_index(ws).reshape(-1)]
    bias = bias.reshape(ws * ws, ws * ws, n_heads).transpose(2, 0, 1)
    attn = attn + bias[None]
    if shift > 0:
        mask = jnp.asarray(_shift_attn_mask(Hp, Wp, ws, shift))
        attn = attn.reshape(B, nW, n_heads, ws * ws, ws * ws)
        attn = attn + mask[None, :, None]
        attn = attn.reshape(B * nW, n_heads, ws * ws, ws * ws)
    attn = jax.nn.softmax(attn, axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(-1, ws * ws, C)
    out = _lin(out, p["proj"])

    out = out.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    if shift > 0:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    out = out[:, :H, :W].reshape(B, N, C)
    x = shortcut + out
    h = _layer_norm(x, p["ln2"], 1e-5)
    h = jax.nn.gelu(_lin(h, p["fc1"]), approximate=False)
    return x + _lin(h, p["fc2"])


def _patch_merge(x, p, H: int, W: int):
    """Swin patch merging: 2x2 neighbors -> concat(4C) -> LN -> Linear(2C),
    neighbor order [even-even, odd-even, even-odd, odd-odd] (HF layout)."""
    B, _, C = x.shape
    x = x.reshape(B, H, W, C)
    if H % 2 or W % 2:
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
    x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                         x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
    x = x.reshape(B, -1, 4 * C)
    x = _layer_norm(x, p["norm"], 1e-5)
    return x @ p["reduction"]


def clap_audio_apply(params: dict, cfg: dict, mel: jax.Array) -> jax.Array:
    """[B, T_frames, n_mels] dB log-mel -> [B, proj_dim] L2-normalized
    audio embedding (HF `ClapModel.get_audio_features`)."""
    n_mels, fr = cfg["num_mel_bins"], cfg["freq_ratio"]
    spec_size = cfg["spec_size"]
    spec_width = spec_size * fr
    B, T, F = mel.shape
    assert F == n_mels, f"expected {n_mels} mel bins, got {F}"
    # BatchNorm over mel bins (HTSAT bn0, eval-mode running stats)
    bn = params["batch_norm"]
    x = (mel - bn["mean"]) / jnp.sqrt(bn["var"] + 1e-5) \
        * bn["scale"] + bn["bias"]
    # time resize to the spectrogram grid (torch bicubic align_corners)
    assert T <= spec_width, f"input longer than spec grid ({T} > {spec_width})"
    if T != spec_width:
        x = jnp.einsum("ot,btf->bof", jnp.asarray(
            _bicubic_time_matrix(T, spec_width)), x)
    # mel -> image: stack freq_ratio time chunks along frequency
    # [B, 1, T', F] -> [B, fr, T'/fr, F] -> [B, fr, F, T'/fr] -> [B, F*fr, T'/fr]
    x = x.reshape(B, fr, spec_width // fr, F).transpose(0, 1, 3, 2)
    x = x.reshape(B, fr * F, spec_width // fr)
    # patch embed: conv k4 s4 over the [freq*fr, time/fr] image
    x = x[..., None]  # NHWC
    ps = cfg["patch_stride"]
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["kernel"], window_strides=(ps, ps),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + params["patch_embed"]["bias"]
    B_, H, W, C = x.shape
    x = x.reshape(B_, H * W, C)
    x = _layer_norm(x, params["patch_norm"], 1e-5)

    ws = cfg["window_size"]
    for i, stage in enumerate(params["stages"]):
        n_heads = cfg["num_heads"][i]
        blk_ws, can_shift = (min(H, W), False) if min(H, W) <= ws \
            else (ws, True)
        for j, blk in enumerate(stage["blocks"]):
            shift = blk_ws // 2 if (can_shift and j % 2 == 1) else 0
            x = _swin_block(x, blk, H, W, blk_ws, shift, n_heads)
        if stage.get("downsample") is not None:
            x = _patch_merge(x, stage["downsample"], H, W)
            H, W = (H + 1) // 2, (W + 1) // 2
    x = _layer_norm(x, params["norm"], 1e-5)
    pooled = x.mean(axis=1)  # HTSAT avgpool over all token positions
    h = jax.nn.relu(_lin(pooled, params["audio_projection"]["linear1"]))
    out = _lin(h, params["audio_projection"]["linear2"])
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def clap_text_apply(params: dict, cfg: dict, input_ids: jax.Array,
                    attention_mask: jax.Array) -> jax.Array:
    """[B, L] token ids + mask -> [B, proj_dim] L2-normalized text embedding
    (RoBERTa encoder + tanh pooler, HF `ClapModel.get_text_features`)."""
    pad_id = cfg["pad_token_id"]
    eps = 1e-12
    mask = attention_mask.astype(jnp.int32)
    # RoBERTa offset position ids: cumsum over non-pad tokens + padding_idx
    nonpad = (input_ids != pad_id).astype(jnp.int32)
    position_ids = jnp.cumsum(nonpad, axis=1) * nonpad + pad_id
    emb = params["embeddings"]
    x = (emb["word"][input_ids] + emb["position"][position_ids]
         + emb["token_type"][jnp.zeros_like(input_ids)])
    x = _layer_norm(x, emb["norm"], eps)
    n_heads = cfg["text_num_heads"]
    bias = (1.0 - mask[:, None, None, :].astype(x.dtype)) * -1e9
    for layer in params["text_layers"]:
        B, L, D = x.shape
        hd = D // n_heads

        def heads(t):
            return t.reshape(B, L, n_heads, hd).transpose(0, 2, 1, 3)
        q, k, v = (heads(_lin(x, layer[n])) for n in ("q", "k", "v"))
        attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd)
                              + bias, axis=-1)
        ctx = (attn @ v).transpose(0, 2, 1, 3).reshape(B, L, D)
        x = _layer_norm(x + _lin(ctx, layer["attn_out"]), layer["attn_norm"],
                        eps)
        h = jax.nn.gelu(_lin(x, layer["fc1"]), approximate=False)
        x = _layer_norm(x + _lin(h, layer["fc2"]), layer["out_norm"], eps)
    pooled = jnp.tanh(_lin(x[:, 0], params["pooler"]))
    h = jax.nn.relu(_lin(pooled, params["text_projection"]["linear1"]))
    out = _lin(h, params["text_projection"]["linear2"])
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


# ------------------------------------------------------------ weight loading

_LAION_SWAPS = [
    ("text_branch.", "text_model."),
    ("audio_branch.bn0.", "audio_model.audio_encoder.batch_norm."),
    ("audio_branch.patch_embed.", "audio_model.audio_encoder.patch_embed."),
    ("audio_branch.norm.", "audio_model.audio_encoder.norm."),
    ("audio_branch.layers.", "audio_model.audio_encoder.layers."),
    (".attn.relative_position_bias_table",
     ".attention.self.relative_position_bias_table"),
    (".attn.relative_position_index",
     ".attention.self.relative_position_index"),
    (".attn.proj.", ".attention.output.dense."),
    (".norm1.", ".layernorm_before."),
    (".norm2.", ".layernorm_after."),
    (".mlp.fc1.", ".intermediate.dense."),
    (".mlp.fc2.", ".output.dense."),
    ("text_projection.0.", "text_projection.linear1."),
    ("text_projection.2.", "text_projection.linear2."),
    ("audio_projection.0.", "audio_projection.linear1."),
    ("audio_projection.2.", "audio_projection.linear2."),
]


def _laion_to_hf(src: tp.Dict[str, np.ndarray]) -> tp.Dict[str, np.ndarray]:
    """Re-key a raw laion_clap state dict into the HF ClapModel layout
    (the renames the HF conversion script applies), splitting fused qkv."""
    out: tp.Dict[str, np.ndarray] = {}
    for k, v in src.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith(("audio_branch.head", "audio_branch.tscam_conv",
                         "audio_branch.spec", "text_transform")):
            continue  # HTSAT classification head / unused towers
        for old, new in _LAION_SWAPS:
            k = k.replace(old, new)
        if ".attn.qkv." in k:
            stem, leaf = k.split(".attn.qkv.")
            q, kk, vv = np.split(v, 3, axis=0)
            for name, part in (("query", q), ("key", kk), ("value", vv)):
                out[f"{stem}.attention.self.{name}.{leaf}"] = part
            continue
        out[k] = v
    return out


def load_clap_params(path: tp.Union[str, Path],
                     text_num_heads: tp.Optional[int] = None
                     ) -> tp.Tuple[dict, dict]:
    """Load CLAP weights from a local checkpoint: HF ClapModel layout
    (``.bin``/``.pt``/``.safetensors``) or raw laion_clap layout (``.pt``
    with ``audio_branch``/``text_branch`` keys). Returns (params, cfg) with
    the architecture inferred from the weight shapes."""
    path = Path(path)
    if path.suffix == ".npz":
        src = {k: np.asarray(v) for k, v in np.load(path).items()}
    elif path.suffix == ".safetensors":
        from safetensors.numpy import load_file
        src = load_file(str(path))
    else:
        import torch
        state = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        src = {k: np.asarray(v.float() if v.dtype.is_floating_point else v)
               for k, v in state.items()}
    if any("audio_branch" in k or "text_branch" in k for k in src):
        src = _laion_to_hf(src)
    prefix = "audio_model.audio_encoder."
    if not any(k.startswith(prefix) for k in src):
        raise ValueError(f"unrecognized CLAP checkpoint layout: {path}")

    def lin(p):
        return {"kernel": jnp.asarray(src[p + ".weight"].T),
                "bias": jnp.asarray(src[p + ".bias"])}

    def ln(p):
        return {"scale": jnp.asarray(src[p + ".weight"]),
                "bias": jnp.asarray(src[p + ".bias"])}

    # ---- audio tower
    n_stages = 1 + max(int(k.split("layers.")[1].split(".")[0])
                       for k in src if prefix + "layers." in k)
    depths = []
    heads = []
    stages = []
    for i in range(n_stages):
        sp = f"{prefix}layers.{i}."
        depth = 1 + max(int(k.split("blocks.")[1].split(".")[0])
                        for k in src if sp + "blocks." in k)
        depths.append(depth)
        table = src[sp + "blocks.0.attention.self.relative_position_bias_table"]
        heads.append(int(table.shape[1]))
        blocks = []
        for j in range(depth):
            bp = f"{sp}blocks.{j}."
            blocks.append({
                "ln1": ln(bp + "layernorm_before"),
                "q": lin(bp + "attention.self.query"),
                "k": lin(bp + "attention.self.key"),
                "v": lin(bp + "attention.self.value"),
                "rel_bias_table": jnp.asarray(
                    src[bp + "attention.self.relative_position_bias_table"]),
                "proj": lin(bp + "attention.output.dense"),
                "ln2": ln(bp + "layernorm_after"),
                "fc1": lin(bp + "intermediate.dense"),
                "fc2": lin(bp + "output.dense"),
            })
        down = None
        if sp + "downsample.reduction.weight" in src:
            down = {"norm": ln(sp + "downsample.norm"),
                    "reduction": jnp.asarray(
                        src[sp + "downsample.reduction.weight"].T)}
        stages.append({"blocks": blocks, "downsample": down})

    pw = src[prefix + "patch_embed.proj.weight"]  # [C, 1, k, k]
    table0 = src[prefix + "layers.0.blocks.0.attention.self."
                 "relative_position_bias_table"]
    window_size = (int(np.sqrt(table0.shape[0])) + 1) // 2
    n_mels = int(src[prefix + "batch_norm.weight"].shape[0])
    params = {
        "batch_norm": {
            "scale": jnp.asarray(src[prefix + "batch_norm.weight"]),
            "bias": jnp.asarray(src[prefix + "batch_norm.bias"]),
            "mean": jnp.asarray(src[prefix + "batch_norm.running_mean"]),
            "var": jnp.asarray(src[prefix + "batch_norm.running_var"])},
        "patch_embed": {"kernel": jnp.asarray(pw.transpose(2, 3, 1, 0)),
                        "bias": jnp.asarray(
                            src[prefix + "patch_embed.proj.bias"])},
        "patch_norm": ln(prefix + "patch_embed.norm"),
        "stages": stages,
        "norm": ln(prefix + "norm"),
        "audio_projection": {"linear1": lin("audio_projection.linear1"),
                             "linear2": lin("audio_projection.linear2")},
    }
    cfg = {
        "num_mel_bins": n_mels,
        # freq_ratio = spec_size // num_mel_bins = 4 across the released
        # HTSAT family (64 mels / spec 256); tiny test configs scale with it
        "spec_size": 4 * n_mels,
        "freq_ratio": 4,
        "patch_stride": int(pw.shape[-1]),
        "window_size": window_size,
        "depths": depths,
        "num_heads": heads,
    }

    # ---- text tower
    tp_ = "text_model."
    n_layers = 1 + max(int(k.split("encoder.layer.")[1].split(".")[0])
                       for k in src if tp_ + "encoder.layer." in k)
    text_layers = []
    for i in range(n_layers):
        lp = f"{tp_}encoder.layer.{i}."
        text_layers.append({
            "q": lin(lp + "attention.self.query"),
            "k": lin(lp + "attention.self.key"),
            "v": lin(lp + "attention.self.value"),
            "attn_out": lin(lp + "attention.output.dense"),
            "attn_norm": ln(lp + "attention.output.LayerNorm"),
            "fc1": lin(lp + "intermediate.dense"),
            "fc2": lin(lp + "output.dense"),
            "out_norm": ln(lp + "output.LayerNorm"),
        })
    q0 = src[tp_ + "encoder.layer.0.attention.self.query.weight"]
    params.update({
        "embeddings": {
            "word": jnp.asarray(src[tp_ + "embeddings.word_embeddings.weight"]),
            "position": jnp.asarray(
                src[tp_ + "embeddings.position_embeddings.weight"]),
            "token_type": jnp.asarray(
                src[tp_ + "embeddings.token_type_embeddings.weight"]),
            "norm": ln(tp_ + "embeddings.LayerNorm")},
        "text_layers": text_layers,
        "pooler": lin(tp_ + "pooler.dense"),
        "text_projection": {"linear1": lin("text_projection.linear1"),
                            "linear2": lin("text_projection.linear2")},
    })
    d_model = int(q0.shape[0])
    cfg.update({
        "pad_token_id": 1,  # RoBERTa convention
        # head count is not recoverable from weight shapes; default to the
        # BERT head-dim-64 convention (RoBERTa-base: 768 -> 12 heads)
        "text_num_heads": text_num_heads or max(d_model // 64, 1),
    })
    return params, cfg


def find_clap_checkpoint() -> tp.Optional[Path]:
    """Locate a local CLAP checkpoint: $CLAP_CHECKPOINT, then
    AUDIOCRAFT_CACHE_DIR/clap.{pt,pth,bin,safetensors,npz}."""
    from ..utils.utils import find_local_checkpoint
    return find_local_checkpoint(
        "CLAP_CHECKPOINT",
        ("clap.pt", "clap.pth", "clap.bin", "clap.safetensors",
         "clap.npz", "clap/clap.pt"))


def _find_tokenizer_dir(ckpt: Path) -> tp.Optional[Path]:
    """RoBERTa tokenizer files (vocab.json + merges.txt) next to the
    checkpoint, in $CLAP_TOKENIZER, or in AUDIOCRAFT_CACHE_DIR/roberta."""
    import os
    cands = [Path(os.environ["CLAP_TOKENIZER"])] \
        if os.environ.get("CLAP_TOKENIZER") else []
    cands += [ckpt.parent, ckpt.parent / "tokenizer"]
    if os.environ.get("AUDIOCRAFT_CACHE_DIR"):
        cands.append(Path(os.environ["AUDIOCRAFT_CACHE_DIR"]) / "roberta")
    for d in cands:
        if (d / "vocab.json").exists() and (d / "merges.txt").exists():
            return d
    return None


class CLAPEmbedder:
    """Audio/text embedding front end over the JAX CLAP towers.

    `embed_audio(wav [B, C, T], sr) -> [B, D]` resamples to 48 kHz, applies
    the laion repeat-pad (short) / center-crop (long — deterministic eval
    variant of laion's random crop) to exactly 10 s, computes the dB
    log-mel, and runs the HTSAT tower. `embed_text(texts) -> [B, D]` runs
    the RoBERTa tower over local tokenizer files.
    """

    def __init__(self, params: dict, cfg: dict, tokenizer=None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        # at most 10 s, capped to what the tower's spectrogram grid admits
        spec_frames = cfg["spec_size"] * cfg["freq_ratio"]
        self.max_samples = min(int(MAX_LENGTH_S * SAMPLE_RATE),
                               (spec_frames - 1) * HOP_LENGTH)
        self._audio = jax.jit(partial(clap_audio_apply, cfg=cfg))
        self._text = jax.jit(partial(clap_text_apply, cfg=cfg))

    @classmethod
    def from_checkpoint(cls, path: tp.Union[str, Path],
                        tokenizer_dir: tp.Optional[Path] = None,
                        text_num_heads: tp.Optional[int] = None
                        ) -> "CLAPEmbedder":
        params, cfg = load_clap_params(path, text_num_heads=text_num_heads)
        tok_dir = tokenizer_dir or _find_tokenizer_dir(Path(path))
        tokenizer = None
        if tok_dir is not None:
            try:
                from transformers import RobertaTokenizer
                tokenizer = RobertaTokenizer.from_pretrained(str(tok_dir))
            except Exception as exc:  # noqa: BLE001
                logger.warning("CLAP tokenizer load failed from %s: %s",
                               tok_dir, exc)
        if tokenizer is None:
            logger.warning(
                "No RoBERTa tokenizer files near %s (need vocab.json + "
                "merges.txt, or set CLAP_TOKENIZER); embed_text disabled.",
                path)
        return cls(params, cfg, tokenizer)

    def embed_audio(self, wav: np.ndarray, sample_rate: int) -> np.ndarray:
        from ..ops.resample import resample_frac
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 2:
            wav = wav[:, None]
        max_len = self.max_samples
        mels = []
        for b in range(wav.shape[0]):
            mono = wav[b].mean(axis=0)
            if sample_rate != SAMPLE_RATE:
                mono = np.asarray(resample_frac(
                    jnp.asarray(mono[None, None]), sample_rate,
                    SAMPLE_RATE))[0, 0]
            if len(mono) < max_len:  # laion "repeatpad"
                n_repeat = max(max_len // max(len(mono), 1), 1)
                mono = np.tile(mono, n_repeat)
                mono = np.pad(mono, (0, max_len - len(mono)))
            elif len(mono) > max_len:  # deterministic center crop
                start = (len(mono) - max_len) // 2
                mono = mono[start:start + max_len]
            mels.append(clap_mel(mono, n_mels=self.cfg["num_mel_bins"]))
        out = self._audio(self.params, mel=jnp.asarray(np.stack(mels)))
        return np.asarray(out)

    def embed_text(self, texts: tp.List[str]) -> np.ndarray:
        if self.tokenizer is None:
            raise RuntimeError(
                "CLAP text embedding needs RoBERTa tokenizer files "
                "(vocab.json + merges.txt) next to the checkpoint or in "
                "$CLAP_TOKENIZER.")
        enc = self.tokenizer(list(texts), padding=True, truncation=True,
                             max_length=TEXT_MAX_TOKENS, return_tensors="np")
        out = self._text(self.params,
                         input_ids=jnp.asarray(enc["input_ids"]),
                         attention_mask=jnp.asarray(enc["attention_mask"]))
        return np.asarray(out)
