"""Audio IO: read/write with seek support.

Parity: `audiocraft/data/audio.py:26-291`. The reference decodes via
PyAV/soundfile and encodes via ffmpeg subprocess. Here WAV reads go through a
first-party RIFF reader (16/24/32-bit PCM + float32, byte-range seek without
loading the whole file), and compressed formats (mp3/ogg/flac/aac/opus)
decode/encode through `native/av_io.cc`, a C++ wrapper over the system
libavformat/libavcodec with sample-accurate pre-roll seek. The data plane is
host-side by design — decoding never touches the TPU.
"""
import struct
import typing as tp
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from .audio_utils import f32_pcm, i16_pcm, normalize_audio

_WAV_FORMATS = {1: "pcm", 3: "float", 0xFFFE: "extensible"}


@dataclass(frozen=True)
class AudioFileInfo:
    """`audio.py:34-38`."""
    sample_rate: int
    duration: float
    channels: int


def _parse_wav_header(f) -> tp.Tuple[int, int, int, int, int, int]:
    """Return (sample_rate, channels, bits, audio_format, data_offset, data_size)."""
    riff = f.read(12)
    if len(riff) < 12 or riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
        raise ValueError("Not a RIFF/WAVE file")
    fmt = None
    while True:
        header = f.read(8)
        if len(header) < 8:
            raise ValueError("Malformed WAV: missing data chunk")
        chunk_id, size = header[:4], struct.unpack("<I", header[4:])[0]
        if chunk_id == b"fmt ":
            fmt = f.read(size)
            if size % 2:
                f.read(1)
        elif chunk_id == b"data":
            if fmt is None:
                raise ValueError("Malformed WAV: data before fmt")
            audio_format, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", fmt[:16])
            if audio_format == 0xFFFE and len(fmt) >= 40:
                audio_format = struct.unpack("<H", fmt[24:26])[0]
            return sample_rate, channels, bits, audio_format, f.tell(), size
        else:
            f.seek(size + (size % 2), 1)


def audio_info(filepath: tp.Union[str, Path]) -> AudioFileInfo:
    """File metadata without decoding (`audio.py:44-69`)."""
    filepath = Path(filepath)
    from . import _native
    if filepath.suffix.lower() != ".wav":
        if _native.av_available():
            sr, ch, _, dur = _native.av_info(str(filepath))
            return AudioFileInfo(sr, dur, ch)
        raise RuntimeError(
            f"Cannot read {filepath.suffix}: the native libav wrapper is "
            "unavailable (build with `make -C native`); only WAV has a "
            "pure-python fallback.")
    if _native.available():
        sr, ch, frames = _native.wav_info(str(filepath))
        return AudioFileInfo(sr, frames / sr, ch)
    with open(filepath, "rb") as f:
        sample_rate, channels, bits, _, _, data_size = _parse_wav_header(f)
        frames = data_size // (channels * (bits // 8))
        return AudioFileInfo(sample_rate, frames / sample_rate, channels)


def audio_read(filepath: tp.Union[str, Path], seek_time: float = 0.0,
               duration: float = -1.0, pad: bool = False
               ) -> tp.Tuple[np.ndarray, int]:
    """Read audio with seek, returning ([C, T] float32, sample_rate)
    (`audio.py:116-145`). WAV goes through the byte-range RIFF reader;
    compressed formats (mp3/ogg/flac/aac/opus) decode through the native
    libav wrapper with sample-accurate pre-roll seek."""
    filepath = Path(filepath)
    from . import _native
    if filepath.suffix.lower() != ".wav":
        if not _native.av_available():
            raise RuntimeError(
                f"Cannot decode {filepath.suffix}: the native libav wrapper "
                "is unavailable (build with `make -C native`); only WAV has "
                "a pure-python fallback.")
        wav, sample_rate = _native.av_read(str(filepath), seek_time, duration)
        if duration > 0:
            expected_frames = int(duration * sample_rate)
            if pad and wav.shape[-1] < expected_frames:
                wav = np.pad(wav, ((0, 0), (0, expected_frames - wav.shape[-1])))
        return wav, sample_rate
    if _native.available():
        wav, sample_rate = _native.wav_read(str(filepath), seek_time, duration)
        if duration > 0:
            expected_frames = int(duration * sample_rate)
            if pad and wav.shape[-1] < expected_frames:
                wav = np.pad(wav, ((0, 0), (0, expected_frames - wav.shape[-1])))
        return wav, sample_rate
    with open(filepath, "rb") as f:
        sample_rate, channels, bits, audio_format, offset, data_size = \
            _parse_wav_header(f)
        bytes_per_frame = channels * (bits // 8)
        total_frames = data_size // bytes_per_frame
        start = int(seek_time * sample_rate) if seek_time else 0
        start = min(start, total_frames)
        num = total_frames - start
        if duration > 0:
            num = min(num, int(duration * sample_rate))
        f.seek(offset + start * bytes_per_frame)
        raw = f.read(num * bytes_per_frame)
    num = len(raw) // bytes_per_frame
    if bits == 16:
        data = np.frombuffer(raw, dtype="<i2", count=num * channels)
        wav = f32_pcm(data)
    elif bits == 32 and audio_format == 3:
        wav = np.frombuffer(raw, dtype="<f4", count=num * channels).astype(np.float32)
    elif bits == 32:
        data = np.frombuffer(raw, dtype="<i4", count=num * channels)
        wav = f32_pcm(data)
    elif bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8, count=num * channels * 3)
        b = b.reshape(-1, 3)
        vals = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16))
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        wav = (vals / (1 << 23)).astype(np.float32)
    else:
        raise ValueError(f"Unsupported WAV bit depth: {bits}")
    wav = wav.reshape(-1, channels).T.copy()  # [C, T]
    if duration > 0:
        expected_frames = int(duration * sample_rate)
        if pad and wav.shape[-1] < expected_frames:
            wav = np.pad(wav, ((0, 0), (0, expected_frames - wav.shape[-1])))
    return wav, sample_rate


def _write_wav(path: Path, wav: np.ndarray, sample_rate: int):
    """Write int16 PCM WAV. wav: [C, T] float32 in [-1, 1]."""
    pcm = i16_pcm(wav).T  # [T, C] interleaved
    data = pcm.astype("<i2").tobytes()
    channels = pcm.shape[1] if pcm.ndim > 1 else 1
    byte_rate = sample_rate * channels * 2
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(data)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                            byte_rate, channels * 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(data)))
        f.write(data)


def audio_write(stem_name: tp.Union[str, Path], wav, sample_rate: int,
                format: str = "wav", normalize: bool = True,
                strategy: str = "peak", peak_clip_headroom_db: float = 1.0,
                rms_headroom_db: float = 18.0, loudness_headroom_db: float = 14.0,
                loudness_compressor: bool = False, log_clipping: bool = True,
                make_parent_dir: bool = True,
                add_suffix: bool = True) -> Path:
    """Normalize + write audio (`audio.py:147-232`). wav: [C, T] or [T]."""
    wav = np.asarray(wav, np.float32)
    if wav.ndim == 1:
        wav = wav[None]
    elif wav.ndim != 2:
        raise ValueError("Input wav should be at most 2 dimension.")
    assert np.isfinite(wav).all()
    wav = normalize_audio(wav, normalize, strategy, peak_clip_headroom_db,
                          rms_headroom_db, loudness_headroom_db,
                          loudness_compressor, log_clipping=log_clipping,
                          sample_rate=sample_rate, stem_name=str(stem_name))
    from . import _native
    if format == "wav":
        writer = lambda p: _write_wav(p, wav, sample_rate)  # noqa: E731
        suffix = ".wav"
    elif format in ("mp3", "ogg", "flac", "aac", "opus"):
        if not _native.av_available():
            raise RuntimeError(
                f"Invalid format {format}: the native libav wrapper is "
                "unavailable (build with `make -C native`).")
        bitrate = {"mp3": 320, "ogg": 128, "aac": 128, "opus": 128,
                   "flac": 0}[format]
        writer = lambda p: _native.av_write(  # noqa: E731
            str(p), wav, sample_rate, format, bitrate)
        suffix = ".m4a" if format == "aac" else "." + format
    else:
        raise RuntimeError(f"Invalid format {format}. Only wav/mp3/ogg/flac/"
                           "aac/opus are supported.")
    path = Path(str(stem_name) + suffix) if add_suffix else Path(stem_name)
    if make_parent_dir:
        path.parent.mkdir(exist_ok=True, parents=True)
    try:
        writer(path)
    except Exception:
        if path.exists():
            path.unlink()
        raise
    return path


def get_spec(y: np.ndarray, sr: int = 16000, n_fft: int = 4096,
             hop_length: int = 128, dur: float = 8) -> np.ndarray:
    """Mel spectrogram in dB from raw audio (`audio.py:234-254`; the
    reference uses librosa, here our own matmul-DFT mel)."""
    import jax.numpy as jnp

    from ..ops.stft import mel_spectrogram
    y = np.asarray(y, np.float32).reshape(-1)[:int(dur * sr)]
    mel = np.asarray(mel_spectrogram(jnp.asarray(y[None]), sr, n_fft=n_fft,
                                     hop_length=hop_length, n_mels=128))[0]
    power = np.maximum(mel, 1e-10)
    db = 10.0 * np.log10(power)
    return np.maximum(db - db.max(), -80.0)  # librosa power_to_db(ref=max)


def save_spectrograms(ys: tp.List[np.ndarray], sr: int, path: str,
                      names: tp.List[str], n_fft: int = 4096,
                      hop_length: int = 128, dur: float = 8.0) -> None:
    """Stacked spectrogram plot for a list of waveforms
    (`audio.py:257-320`; watermark-solver sample dumps)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if not names:
        names = ["Ground Truth", "Audio Watermarked", "Watermark"]
    assert len(names) == len(ys), \
        f"There are {len(ys)} wavs but {len(names)} names ({names})"
    fig, axes = plt.subplots(len(ys), 1, figsize=(8, 3 * len(ys)),
                             squeeze=False)
    for ax, y, name in zip(axes[:, 0], ys, names):
        spec = get_spec(np.asarray(y), sr=sr, n_fft=n_fft,
                        hop_length=hop_length, dur=dur)
        ax.imshow(spec, origin="lower", aspect="auto", cmap="magma",
                  vmin=-80.0, vmax=0.0)
        ax.set_title(name, fontsize=10)
        ax.set_ylabel("mel bin")
    axes[-1, 0].set_xlabel("frame")
    fig.tight_layout()
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(path)
    plt.close(fig)
