"""VGGish audio embedding network in JAX (for the real FAD).

Parity: the reference computes FAD by shelling out to Google's TF
implementation with the VGGish checkpoint (`ref metrics/fad.py:29-123`).
Here the VGGish network (6 conv + 3 fc layers, 128-D embedding) and its
exact preprocessing (16 kHz, 25ms/10ms STFT, 64 HTK-mel bins 125-7500 Hz,
log(mel + 0.01), 96-frame non-overlapping examples) are implemented
first-party, so FAD runs on-device with no TF dependency. Weights load from
a locally provided torchvggish ``vggish.pth`` state dict or an ``.npz``
export (zero-egress: the checkpoint cannot be downloaded here, but the
pipeline reproduces Google's embeddings bit-for-math when given one).
"""
import logging
import typing as tp
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

SAMPLE_RATE = 16000
STFT_WINDOW = 400   # 25 ms
STFT_HOP = 160      # 10 ms
NUM_MEL_BINS = 64
MEL_MIN_HZ = 125.0
MEL_MAX_HZ = 7500.0
LOG_OFFSET = 0.01
EXAMPLE_FRAMES = 96  # 0.96 s per example
EMBEDDING_SIZE = 128


# ------------------------------------------------------------ preprocessing

def _hertz_to_mel(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_matrix(num_spectrogram_bins: int, audio_sample_rate: float
                ) -> np.ndarray:
    """Google mel_features.spectrogram_to_mel_matrix (HTK mel scale)."""
    nyquist = audio_sample_rate / 2.0
    spectrogram_bins_hertz = np.linspace(0.0, nyquist, num_spectrogram_bins)
    spectrogram_bins_mel = _hertz_to_mel(spectrogram_bins_hertz)
    band_edges_mel = np.linspace(_hertz_to_mel(MEL_MIN_HZ),
                                 _hertz_to_mel(MEL_MAX_HZ), NUM_MEL_BINS + 2)
    mel_weights = np.empty((num_spectrogram_bins, NUM_MEL_BINS))
    for i in range(NUM_MEL_BINS):
        lower, center, upper = band_edges_mel[i:i + 3]
        lower_slope = ((spectrogram_bins_mel - lower) / (center - lower))
        upper_slope = ((upper - spectrogram_bins_mel) / (upper - center))
        mel_weights[:, i] = np.maximum(0.0, np.minimum(lower_slope,
                                                       upper_slope))
    mel_weights[0, :] = 0.0  # DC bin never contributes
    return mel_weights.astype(np.float32)


def waveform_to_examples(wav: np.ndarray, sample_rate: int) -> np.ndarray:
    """[T] or [C, T] float waveform -> [N, 96, 64] log-mel examples
    (Google vggish_input.waveform_to_examples)."""
    from ..ops.resample import resample_frac
    data = np.asarray(wav, np.float32)
    if data.ndim == 2:
        data = data.mean(axis=0)
    if sample_rate != SAMPLE_RATE:
        data = np.asarray(resample_frac(jnp.asarray(data[None, None]),
                                        sample_rate, SAMPLE_RATE))[0, 0]
    if len(data) < STFT_WINDOW:
        return np.zeros((0, EXAMPLE_FRAMES, NUM_MEL_BINS), np.float32)
    # framed periodic-hann magnitude STFT, fft 512
    num_frames = 1 + (len(data) - STFT_WINDOW) // STFT_HOP
    idx = (np.arange(STFT_WINDOW)[None, :]
           + STFT_HOP * np.arange(num_frames)[:, None])
    frames = data[idx]
    window = 0.5 - 0.5 * np.cos(2 * np.pi / STFT_WINDOW
                                * np.arange(STFT_WINDOW))
    spec = np.abs(np.fft.rfft(frames * window, n=512, axis=-1))
    mel = spec @ _mel_matrix(spec.shape[-1], SAMPLE_RATE)
    log_mel = np.log(mel + LOG_OFFSET)  # [F, 64]
    n = log_mel.shape[0] // EXAMPLE_FRAMES
    if n == 0:
        return np.zeros((0, EXAMPLE_FRAMES, NUM_MEL_BINS), np.float32)
    return log_mel[:n * EXAMPLE_FRAMES].reshape(
        n, EXAMPLE_FRAMES, NUM_MEL_BINS).astype(np.float32)


# ------------------------------------------------------------------ network

# (name, out_channels) for the conv tower; each followed by relu, with
# maxpool after conv1, conv2, conv3_2, conv4_2 (VGG-ish)
_CONV_LAYERS = [("conv1", 64, True), ("conv2", 128, True),
                ("conv3_1", 256, False), ("conv3_2", 256, True),
                ("conv4_1", 512, False), ("conv4_2", 512, True)]


def vggish_apply(params: dict, examples: jax.Array) -> jax.Array:
    """[N, 96, 64] log-mel examples -> [N, 128] embeddings."""
    x = examples[..., None]  # NHWC
    for name, _, pool in _CONV_LAYERS:
        w, b = params[name]["kernel"], params[name]["bias"]
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        x = jax.nn.relu(x)
        if pool:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
    # torchvggish transposes NCHW -> NHWC before flattening (to match the
    # original TF layout); we're already NHWC, so flatten directly
    x = x.reshape(x.shape[0], -1)
    for name in ("fc1_1", "fc1_2", "fc2"):
        x = jax.nn.relu(x @ params[name]["kernel"] + params[name]["bias"])
    return x


def load_vggish_params(path: tp.Union[str, Path]) -> dict:
    """Load VGGish weights from a torchvggish ``.pth`` state dict
    (features.{0,3,6,8,11,13} convs + embeddings.{0,2,4} linears) or an
    ``.npz`` of the same flattened names."""
    path = Path(path)
    if path.suffix == ".npz":
        src = dict(np.load(path))
    else:
        import torch
        state = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(state, "state_dict"):
            state = state.state_dict()
        src = {k: v.numpy() for k, v in state.items()}
    conv_map = dict(zip([n for n, _, _ in _CONV_LAYERS],
                        ["features.0", "features.3", "features.6",
                         "features.8", "features.11", "features.13"]))
    fc_map = {"fc1_1": "embeddings.0", "fc1_2": "embeddings.2",
              "fc2": "embeddings.4"}
    params: dict = {}
    for ours, theirs in conv_map.items():
        w = src[theirs + ".weight"]  # [O, I, H, W]
        params[ours] = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                        "bias": jnp.asarray(src[theirs + ".bias"])}
    for ours, theirs in fc_map.items():
        params[ours] = {"kernel": jnp.asarray(src[theirs + ".weight"].T),
                        "bias": jnp.asarray(src[theirs + ".bias"])}
    return params


def find_vggish_checkpoint() -> tp.Optional[Path]:
    """Locate a local VGGish checkpoint: $VGGISH_CHECKPOINT, then
    AUDIOCRAFT_CACHE_DIR/vggish.{pth,npz}."""
    from ..utils.utils import find_local_checkpoint
    return find_local_checkpoint(
        "VGGISH_CHECKPOINT",
        ("vggish.pth", "vggish.npz", "vggish/vggish.pth"))


class VGGishEmbedder:
    """embed_fn-compatible callable: wav [B, C, T] + sr -> [N, 128]."""

    def __init__(self, params: dict, batch_size: int = 64):
        self.params = params
        self.batch_size = batch_size
        self._apply = jax.jit(vggish_apply)

    def __call__(self, wav: np.ndarray, sample_rate: int) -> np.ndarray:
        outs = []
        for b in range(np.asarray(wav).shape[0]):
            ex = waveform_to_examples(np.asarray(wav)[b], sample_rate)
            if ex.shape[0] == 0:
                continue
            for s in range(0, ex.shape[0], self.batch_size):
                outs.append(np.asarray(self._apply(
                    self.params, jnp.asarray(ex[s:s + self.batch_size]))))
        if not outs:
            return np.zeros((0, EMBEDDING_SIZE), np.float32)
        return np.concatenate(outs)
