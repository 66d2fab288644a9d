"""Audio tensor utilities: channel conversion, resampling, loudness /
normalization, PCM conversion.

Parity: `audiocraft/data/audio_utils.py:54-374`. Resampling uses our
polyphase sinc op (`ops/resample.py`) instead of julius; loudness implements
ITU-R BS.1770-4 (K-weighting + gated measurement) natively instead of
torchaudio. The mp3/aac round-trip augmentations require ffmpeg, which is not
in this image — they raise a clear error when invoked (`audio_utils.py:233-316`).
"""
import logging
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

from ..ops.resample import resample_frac


def convert_audio_channels(wav, channels: int = 2):
    """Convert to the requested channel count (`audio_utils.py:16-51`).
    wav: [..., C, T]."""
    xp = jnp if isinstance(wav, jax.Array) else np
    *shape, src_channels, length = wav.shape
    if src_channels == channels:
        pass
    elif channels == 1:
        # averaging the available channels
        wav = wav.mean(axis=-2, keepdims=True)
    elif src_channels == 1:
        # replicate mono to all channels
        reps = [1] * (wav.ndim - 2) + [channels, 1]
        wav = xp.tile(wav, reps)
    elif src_channels >= channels:
        wav = wav[..., :channels, :]
    else:
        raise ValueError("The audio file has less channels than requested but is not mono.")
    return wav


def convert_audio(wav, from_rate: float, to_rate: float, to_channels: int):
    """Channel + sample-rate conversion (`audio_utils.py:54-67`). [..., C, T]."""
    wav = jnp.asarray(wav, jnp.float32)
    if int(from_rate) != int(to_rate):
        wav = resample_frac(wav, int(from_rate), int(to_rate))
    return convert_audio_channels(wav, to_channels)


# ------------------------------------------------------------- loudness

def _k_weighting_coeffs(sample_rate: int):
    """ITU-R BS.1770-4 pre-filter (shelving) + RLB high-pass biquads,
    designed for arbitrary sample rate (standard bilinear redesign)."""
    import math
    # stage 1: spherical head shelving filter
    f0, G, Q = 1681.974450955533, 3.999843853973347, 0.7071752369554196
    K = math.tan(math.pi * f0 / sample_rate)
    Vh = 10.0 ** (G / 20.0)
    Vb = Vh ** 0.4996667741545416
    a0 = 1.0 + K / Q + K * K
    b_shelf = np.array([(Vh + Vb * K / Q + K * K) / a0,
                        2.0 * (K * K - Vh) / a0,
                        (Vh - Vb * K / Q + K * K) / a0])
    a_shelf = np.array([1.0, 2.0 * (K * K - 1.0) / a0,
                        (1.0 - K / Q + K * K) / a0])
    # stage 2: RLB high-pass
    f0, Q = 38.13547087602444, 0.5003270373238773
    K = math.tan(math.pi * f0 / sample_rate)
    d0 = 1.0 + K / Q + K * K
    b_hp = np.array([1.0, -2.0, 1.0]) / d0
    a_hp = np.array([1.0, 2.0 * (K * K - 1.0) / d0, (1.0 - K / Q + K * K) / d0])
    return (b_shelf, a_shelf), (b_hp, a_hp)


def _biquad(x: np.ndarray, b: np.ndarray, a: np.ndarray) -> np.ndarray:
    from scipy.signal import lfilter
    return lfilter(b, a, x, axis=-1)


def measure_loudness(wav: np.ndarray, sample_rate: int) -> float:
    """Integrated loudness (LKFS) per BS.1770-4 with -70 LKFS absolute and
    -10 LU relative gating. wav: [C, T] numpy."""
    wav = np.asarray(wav, np.float64)
    if wav.ndim == 1:
        wav = wav[None]
    (bs, as_), (bh, ah) = _k_weighting_coeffs(sample_rate)
    y = _biquad(_biquad(wav, bs, as_), bh, ah)
    # 400ms blocks, 75% overlap
    block = int(0.4 * sample_rate)
    step = max(block // 4, 1)
    if y.shape[-1] < block:
        pad = np.zeros((y.shape[0], block - y.shape[-1]))
        y = np.concatenate([y, pad], axis=-1)
    n_blocks = 1 + (y.shape[-1] - block) // step
    weights = np.ones(y.shape[0])  # mono/stereo channel weights (G_i = 1)
    powers = np.empty(n_blocks)
    for i in range(n_blocks):
        seg = y[:, i * step:i * step + block]
        powers[i] = float(np.sum(weights * np.mean(seg ** 2, axis=-1)))
    loud = -0.691 + 10 * np.log10(np.maximum(powers, 1e-12))
    gated = powers[loud > -70.0]
    if len(gated) == 0:
        return -70.0
    rel_threshold = -0.691 + 10 * np.log10(gated.mean()) - 10.0
    gated2 = powers[(loud > -70.0) & (loud > rel_threshold)]
    if len(gated2) == 0:
        return -70.0
    return float(-0.691 + 10 * np.log10(gated2.mean()))


def normalize_loudness(wav: np.ndarray, sample_rate: int,
                       loudness_headroom_db: float = 14.0,
                       loudness_compressor: bool = False,
                       energy_floor: float = 2e-3) -> np.ndarray:
    """Normalize to -`loudness_headroom_db` LKFS (`audio_utils.py:70-100`)."""
    energy = float(np.sqrt(np.mean(np.square(wav))))
    if energy < energy_floor:
        return wav
    input_loudness_db = measure_loudness(wav, sample_rate)
    delta_loudness = -loudness_headroom_db - input_loudness_db
    gain = 10.0 ** (delta_loudness / 20.0)
    output = gain * wav
    if loudness_compressor:
        output = np.tanh(output)
    assert np.isfinite(output).all(), (input_loudness_db, float(np.abs(wav).max()))
    return output


def _clip_wav(wav: np.ndarray, log_clipping: bool = False,
              stem_name: tp.Optional[str] = None) -> np.ndarray:
    """Hard clip with optional logging (`audio_utils.py:103-117`)."""
    max_scale = float(np.abs(wav).max())
    if log_clipping and max_scale > 1:
        clamp_prob = float((np.abs(wav) > 1).astype(np.float32).mean())
        print(f"CLIPPING {stem_name or ''} happening with proba (a bit of clipping is okay):",
              clamp_prob, "maximum scale: ", max_scale)
    return np.clip(wav, -1, 1)


def normalize_audio(wav: np.ndarray, normalize: bool = True,
                    strategy: str = "peak", peak_clip_headroom_db: float = 1.0,
                    rms_headroom_db: float = 18.0,
                    loudness_headroom_db: float = 14.0,
                    loudness_compressor: bool = False,
                    log_clipping: bool = False, sample_rate: tp.Optional[int] = None,
                    stem_name: tp.Optional[str] = None) -> np.ndarray:
    """Peak/clip/rms/loudness normalization strategies
    (`audio_utils.py:120-164`)."""
    wav = np.asarray(wav, np.float32)
    scale_peak = 10 ** (-peak_clip_headroom_db / 20)
    scale_rms = 10 ** (-rms_headroom_db / 20)
    if strategy == "peak":
        rescaling = scale_peak / max(float(np.abs(wav).max()), 1e-8)
        if normalize or rescaling < 1:
            wav = wav * rescaling
    elif strategy == "clip":
        wav = _clip_wav(wav, log_clipping=log_clipping, stem_name=stem_name)
    elif strategy == "rms":
        mono = wav.mean(axis=0) if wav.ndim > 1 else wav
        rescaling = scale_rms / max(float(np.sqrt(np.mean(mono ** 2))), 1e-8)
        if normalize or rescaling < 1:
            wav = wav * rescaling
        wav = _clip_wav(wav, log_clipping=log_clipping, stem_name=stem_name)
    elif strategy == "loudness":
        assert sample_rate is not None, "Loudness normalization requires sample rate."
        wav = normalize_loudness(wav, sample_rate, loudness_headroom_db,
                                 loudness_compressor)
        wav = _clip_wav(wav, log_clipping=log_clipping, stem_name=stem_name)
    else:
        assert float(np.abs(wav).max()) <= 1
        assert not normalize or strategy == "" or strategy == "none", \
            f"Unexpected strategy: '{strategy}'"
    return wav


def f32_pcm(wav: np.ndarray) -> np.ndarray:
    """int PCM -> float32 in [-1, 1] (`audio_utils.py:167-181`)."""
    if wav.dtype.kind == "f":
        return wav.astype(np.float32)
    elif wav.dtype == np.int16:
        return (wav.astype(np.float32)) / 2 ** 15
    elif wav.dtype == np.int32:
        return (wav.astype(np.float32)) / 2 ** 31
    raise ValueError(f"Unsupported wav dtype: {wav.dtype}")


def i16_pcm(wav: np.ndarray) -> np.ndarray:
    """float -> int16 PCM, with saturation (`audio_utils.py:184-196`)."""
    if wav.dtype.kind == "f":
        assert np.abs(wav).max() <= 1
        candidate = (wav * 2 ** 15).round()
        candidate = np.clip(candidate, -2 ** 15, 2 ** 15 - 1)
        return candidate.astype(np.int16)
    assert wav.dtype == np.int16
    return wav


def _parse_bitrate(bitrate: str) -> int:
    import re
    match = re.search(r"\d+(\.\d+)?", str(bitrate))
    return int(float(match.group())) if match else 128


def _codec_round_trip(wav: np.ndarray, sr: int, fmt: str, bitrate_kbps: int
                      ) -> np.ndarray:
    """Host-side lossy round trip through the native libav wrapper.

    Mirrors the reference's flatten-compress-reshape scheme
    (`audio_utils.py:250-271`): the [B, C, T] batch is flattened to one long
    mono stream so a single encoder call covers the batch.
    """
    import tempfile
    from . import _native
    wav = np.asarray(wav, np.float32)
    b, c, t = wav.shape
    flat = np.clip(wav.reshape(1, -1), -1.0, 1.0)
    suffix = ".m4a" if fmt == "aac" else "." + fmt
    with tempfile.NamedTemporaryFile(suffix=suffix) as f:
        _native.av_write(f.name, flat, sr, fmt, bitrate_kbps)
        back, _ = _native.av_read(f.name)
    back = back.reshape(-1)
    total = b * c * t
    if back.shape[0] >= total:
        back = back[:total]
    else:
        back = np.pad(back, (0, total - back.shape[0]))
    return back.reshape(b, c, t).astype(np.float32)


def _jittable_round_trip(wav, sr: int, fmt: str, bitrate: str):
    """Round trip usable under jit: pure_callback to the host codec with a
    straight-through gradient (the reference detaches the codec delta the
    same way, `audio_effects.py:146-175`). pure_callback has no JVP rule, so
    the identity gradient is attached with custom_vjp."""
    kbps = _parse_bitrate(bitrate)
    if isinstance(wav, np.ndarray):
        return _codec_round_trip(wav, sr, fmt, kbps)

    @jax.custom_vjp
    def round_trip(x):
        return jax.pure_callback(
            lambda a: _codec_round_trip(np.asarray(a), sr, fmt, kbps),
            jax.ShapeDtypeStruct(x.shape, jnp.float32), x,
            vmap_method="sequential")

    round_trip.defvjp(lambda x: (round_trip(x), None),
                      lambda _, g: (g,))
    return round_trip(wav)


def get_mp3(wav, sr: int, bitrate: str = "128k"):
    """mp3 round-trip augmentation via native libav (`audio_utils.py:233-271`).

    Accepts [B, C, T] numpy (eager) or jax arrays (jit-safe via
    pure_callback with straight-through gradients)."""
    return _jittable_round_trip(wav, sr, "mp3", bitrate)


def get_aac(wav, sr: int, bitrate: str = "128k", lowpass_freq=None):
    """aac round-trip augmentation via native libav (`audio_utils.py:274-316`).
    `lowpass_freq` is accepted for API parity; the native encoder does not
    expose ffmpeg's -cutoff, so it is ignored (warned once)."""
    if lowpass_freq is not None:
        logger.warning("get_aac: lowpass_freq is not supported by the native "
                       "encoder and is ignored")
    return _jittable_round_trip(wav, sr, "aac", bitrate)
