"""PaSST audio classifier in JAX (for the KLD metric).

Parity: the reference computes KLD with the `hear21passt` PaSST classifier
(`ref metrics/kld.py:116-180`): a DeiT-style ViT over mel spectrograms with
patchout training (Koutini et al., arXiv:2110.05069), 527 AudioSet classes.
Here the inference path is implemented first-party so the metric runs
on-device with no torch/timm dependency:

- preprocessing follows hear21passt's ``AugmentMelSTFT`` in eval mode:
  preemphasis (0.97), STFT with n_fft=1024 / hop=320 / symmetric-hann
  win_length=800 / centered reflect padding, power spectrogram, 128 slaney
  mel bands, ``log(mel + 1e-5)``, then the fixed ``(x + 4.5) / 5``
  normalization;
- the network is the PaSST-S ViT: Conv2d patch embed (16x16 kernel, 10x10
  stride), decomposed time/frequency positional embeddings, cls + dist
  tokens, 12 pre-LN transformer blocks (dim 768, 12 heads, MLP ratio 4),
  head = LayerNorm + Linear over the mean of the two token features.

Weights load from a locally provided hear21passt ``.pt`` state dict (the
``passt-s-f128-p16-s10`` family) or an ``.npz`` export (zero-egress: the
checkpoint cannot be downloaded here; the pipeline reproduces the classifier
logits when given one — see `tests/metrics/test_passt.py` for the parity
harness against a torch replica).
"""
import logging
import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

SAMPLE_RATE = 32000
N_FFT = 1024
WIN_LENGTH = 800
HOP_LENGTH = 320
N_MELS = 128
N_CLASSES = 527
EMBED_DIM = 768


# ------------------------------------------------------------ preprocessing

def _slaney_mel_matrix(n_freqs: int, sample_rate: float, n_mels: int,
                       fmin: float, fmax: float) -> np.ndarray:
    """librosa-style mel filterbank: slaney scale + slaney (area) norm,
    as built by hear21passt (htk=False, norm=1). [n_freqs, n_mels]."""
    from ..ops.stft import mel_filters
    return mel_filters(int(sample_rate), 2 * (n_freqs - 1), n_mels,
                       fmin, fmax, htk=False, norm="slaney")


def passt_mel(wav: np.ndarray, fmin: float = 0.0,
              fmax: tp.Optional[float] = None) -> np.ndarray:
    """[T] mono 32 kHz waveform -> [128, F] normalized log-mel
    (hear21passt ``AugmentMelSTFT`` forward, eval mode)."""
    x = np.asarray(wav, np.float32)
    # preemphasis: conv1d with [-0.97, 1], no padding -> length T-1
    x = x[1:] - 0.97 * x[:-1]
    # centered STFT, reflect padding, symmetric hann of win_length zero-padded
    # to n_fft (torch.stft semantics)
    pad = N_FFT // 2
    x = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - N_FFT) // HOP_LENGTH
    idx = (np.arange(N_FFT)[None, :]
           + HOP_LENGTH * np.arange(n_frames)[:, None])
    frames = x[idx]
    window = np.hanning(WIN_LENGTH).astype(np.float32)  # symmetric
    lpad = (N_FFT - WIN_LENGTH) // 2
    window = np.pad(window, (lpad, N_FFT - WIN_LENGTH - lpad))
    spec = np.abs(np.fft.rfft(frames * window, axis=-1)) ** 2  # power
    if fmax is None:
        fmax = SAMPLE_RATE / 2
    mel = spec @ _slaney_mel_matrix(spec.shape[-1], SAMPLE_RATE, N_MELS,
                                    fmin, fmax)
    log_mel = np.log(mel + 1e-5).T  # [128, F]
    return ((log_mel + 4.5) / 5.0).astype(np.float32)


# ------------------------------------------------------------------ network

def _layer_norm(x, p):
    from ..modules.clap import _layer_norm as _ln
    return _ln(x, p, 1e-6)


def _block(x, p):
    """Pre-LN ViT block: x + attn(LN(x)); x + mlp(LN(x)).

    Head count follows the ViT head-dim-64 convention (768 -> 12 heads)."""
    B, N, D = x.shape
    n_heads = max(D // 64, 1)
    h = _layer_norm(x, p["norm1"])
    qkv = h @ p["qkv"]["kernel"] + p["qkv"]["bias"]  # [B, N, 3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = D // n_heads

    def heads(t):
        return t.reshape(B, N, n_heads, hd).transpose(0, 2, 1, 3)
    q, k, v = heads(q), heads(k), heads(v)
    att = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) / np.sqrt(hd), axis=-1)
    out = (att @ v).transpose(0, 2, 1, 3).reshape(B, N, D)
    x = x + (out @ p["proj"]["kernel"] + p["proj"]["bias"])
    h = _layer_norm(x, p["norm2"])
    h = jax.nn.gelu(h @ p["fc1"]["kernel"] + p["fc1"]["bias"],
                    approximate=False)
    x = x + (h @ p["fc2"]["kernel"] + p["fc2"]["bias"])
    return x


def passt_apply(params: dict, mel: jax.Array) -> jax.Array:
    """[B, 128, F] normalized log-mel -> [B, 527] AudioSet logits."""
    x = mel[:, :, :, None]  # NHWC: [B, freq, time, 1]
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["kernel"], window_strides=(10, 10),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + params["patch_embed"]["bias"]      # [B, F', T', D]
    B, Fp, Tp, D = x.shape
    # decomposed positional embeddings: freq [1, F', 1, D], time [1, 1, Tmax, D]
    time_pos = params["time_pos_embed"]
    assert Tp <= time_pos.shape[2], \
        f"input longer than the pretrained time positions ({Tp} > {time_pos.shape[2]})"
    x = x + params["freq_pos_embed"][:, :Fp]
    x = x + time_pos[:, :, :Tp]
    x = x.reshape(B, Fp * Tp, D)
    cls = jnp.broadcast_to(params["cls_token"] + params["token_pos_embed"][:, 0:1],
                           (B, 1, D))
    dist = jnp.broadcast_to(params["dist_token"] + params["token_pos_embed"][:, 1:2],
                            (B, 1, D))
    x = jnp.concatenate([cls, dist, x], axis=1)
    for blk in params["blocks"]:
        x = _block(x, blk)
    x = _layer_norm(x, params["norm"])
    feats = (x[:, 0] + x[:, 1]) / 2.0
    h = _layer_norm(feats, params["head_norm"])
    return h @ params["head"]["kernel"] + params["head"]["bias"]


# ------------------------------------------------------------ weight loading

def load_passt_params(path: tp.Union[str, Path]) -> dict:
    """Load PaSST weights from a hear21passt ``.pt`` state dict (bare
    PaSST keys or ``net.``-prefixed PasstBasicWrapper keys) or an ``.npz``
    export of the same flattened names."""
    path = Path(path)
    if path.suffix == ".npz":
        src = dict(np.load(path))
    else:
        import torch
        state = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(state, "state_dict"):
            state = state.state_dict()
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        src = {k: np.asarray(v) for k, v in state.items()}
    if any(k.startswith("net.") for k in src):
        src = {k[len("net."):]: v for k, v in src.items()
               if k.startswith("net.")}

    def lin(prefix):
        return {"kernel": jnp.asarray(src[prefix + ".weight"].T),
                "bias": jnp.asarray(src[prefix + ".bias"])}

    def ln(prefix):
        return {"scale": jnp.asarray(src[prefix + ".weight"]),
                "bias": jnp.asarray(src[prefix + ".bias"])}

    n_blocks = 1 + max(int(k.split(".")[1]) for k in src
                       if k.startswith("blocks."))
    w = src["patch_embed.proj.weight"]  # [D, 1, 16, 16]
    params: dict = {
        "patch_embed": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                        "bias": jnp.asarray(src["patch_embed.proj.bias"])},
        "cls_token": jnp.asarray(src["cls_token"])[0],          # [1, D]
        "dist_token": jnp.asarray(src["dist_token"])[0],        # [1, D]
        "token_pos_embed": jnp.asarray(src["new_pos_embed"]),   # [1, 2, D]
        # torch stores [1, D, F', 1] / [1, D, 1, T'] -> NHWC-ish layouts
        "freq_pos_embed": jnp.asarray(
            src["freq_new_pos_embed"].transpose(0, 2, 3, 1)),   # [1, F', 1, D]
        "time_pos_embed": jnp.asarray(
            src["time_new_pos_embed"].transpose(0, 2, 3, 1)),   # [1, 1, T', D]
        "norm": ln("norm"),
        "head_norm": ln("head.0"),
        "head": lin("head.1"),
        "blocks": [
            {"norm1": ln(f"blocks.{i}.norm1"),
             "qkv": lin(f"blocks.{i}.attn.qkv"),
             "proj": lin(f"blocks.{i}.attn.proj"),
             "norm2": ln(f"blocks.{i}.norm2"),
             "fc1": lin(f"blocks.{i}.mlp.fc1"),
             "fc2": lin(f"blocks.{i}.mlp.fc2")}
            for i in range(n_blocks)],
    }
    return params


def find_passt_checkpoint() -> tp.Optional[Path]:
    """Locate a local PaSST checkpoint: $PASST_CHECKPOINT, then
    AUDIOCRAFT_CACHE_DIR/passt.{pt,pth,npz}."""
    from ..utils.utils import find_local_checkpoint
    return find_local_checkpoint(
        "PASST_CHECKPOINT",
        ("passt.pt", "passt.pth", "passt.npz", "passt/passt.pt"))


class PasstClassifier:
    """classifier_fn-compatible callable: wav [B, C, T] + sr -> [B, 527]
    mean class probabilities (segments averaged like `ref kld.py:173-180`)."""

    def __init__(self, params: dict, max_duration: float = 10.0,
                 min_duration: float = 0.15):
        self.params = params
        # cap segments to the checkpoint's time-position capacity: with P
        # time patches the conv (k16 s10) admits at most 10P+15 mel frames,
        # i.e. (10P+14)*320+1 samples (mel frames(L) = 1 + (L-1)//320)
        P = int(params["time_pos_embed"].shape[2])
        self.max_frames = min(int(max_duration * SAMPLE_RATE),
                              (10 * P + 14) * HOP_LENGTH + 1)
        self.min_frames = int(min_duration * SAMPLE_RATE)
        self._apply = jax.jit(passt_apply)

    def __call__(self, wav: np.ndarray, sample_rate: int) -> np.ndarray:
        from ..ops.resample import resample_frac
        wav = np.asarray(wav, np.float32)
        out = np.zeros((wav.shape[0], N_CLASSES), np.float32)
        for b in range(wav.shape[0]):
            mono = wav[b].mean(axis=0)
            if sample_rate != SAMPLE_RATE:
                mono = np.asarray(resample_frac(
                    jnp.asarray(mono[None, None]), sample_rate,
                    SAMPLE_RATE))[0, 0]
            # split into model-length segments, drop the too-short tail
            segs = [mono[s:s + self.max_frames]
                    for s in range(0, max(len(mono), 1), self.max_frames)]
            segs = [s for s in segs if len(s) > self.min_frames]
            if not segs:  # all-too-short input: pad one segment
                segs = [np.pad(mono, (0, self.min_frames + 1 - len(mono)))]
            probs = []
            for s in segs:
                mel = passt_mel(s)[None]  # [1, 128, F]
                logits = self._apply(self.params, jnp.asarray(mel))
                probs.append(np.asarray(jax.nn.softmax(logits, axis=-1))[0])
            out[b] = np.mean(probs, axis=0)
        return out
