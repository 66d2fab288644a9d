"""ctypes bindings for the native (C++) data-plane library.

`native/audio_io.cc` provides WAV decode with seek + polyphase resampling
+ fused read-resample-convert — the host-side hot path of `AudioDataset`.
Falls back gracefully when the library hasn't been built (`make -C native`).
"""
import ctypes
import logging
import typing as tp
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).parent.parent.parent / "native"
_LIB_PATHS = [
    _NATIVE_DIR / "libaudiocraft_io.so",
    Path("/usr/local/lib/libaudiocraft_io.so"),
]


def _maybe_build() -> None:
    """Build the native libraries from source when missing or stale.

    The .so files are intentionally NOT committed (binaries can't be
    reviewed); each is compiled on first use from its .cc. Targets are
    built independently so a missing libav toolchain only loses the
    compressed-audio path, never the WAV fast path.
    """
    import subprocess
    for src_name, so_name in [("audio_io.cc", "libaudiocraft_io.so"),
                              ("av_io.cc", "libaudiocraft_av.so")]:
        src = _NATIVE_DIR / src_name
        so = _NATIVE_DIR / so_name
        if not src.exists():
            continue
        if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
            continue
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR), so_name],
                           check=True, capture_output=True, timeout=120)
        except Exception as e:  # missing toolchain: fall back to python path
            logger.warning("native lib %s build failed: %s", so_name, e)


_lib = None
_avlib = None
_maybe_build()
for p in _LIB_PATHS:
    if p.exists():
        try:
            _lib = ctypes.CDLL(str(p))
            break
        except OSError as e:
            logger.warning("Failed loading native audio lib %s: %s", p, e)
for p in [_NATIVE_DIR / "libaudiocraft_av.so",
          Path("/usr/local/lib/libaudiocraft_av.so")]:
    if p.exists():
        try:
            _avlib = ctypes.CDLL(str(p))
            break
        except OSError as e:  # e.g. system libav* missing at runtime
            logger.warning("Failed loading native libav wrapper %s: %s", p, e)

if _lib is not None:
    _lib.wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_long)]
    _lib.wav_info.restype = ctypes.c_int
    _lib.wav_read.argtypes = [ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
                              ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    _lib.wav_read.restype = ctypes.c_long
    _lib.resample.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                              ctypes.c_int, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int, ctypes.c_float,
                              ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    _lib.resample.restype = ctypes.c_long
    _lib.wav_read_resample.argtypes = [
        ctypes.c_char_p, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    _lib.wav_read_resample.restype = ctypes.c_long


if _avlib is not None:
    _avlib.av_audio_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_double)]
    _avlib.av_audio_info.restype = ctypes.c_int
    _avlib.av_audio_read.argtypes = [
        ctypes.c_char_p, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _avlib.av_audio_read.restype = ctypes.c_long
    _avlib.av_audio_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
    _avlib.av_audio_write.restype = ctypes.c_int


def available() -> bool:
    return _lib is not None


def av_available() -> bool:
    """Whether the libav-backed compressed-audio path is usable."""
    return _avlib is not None


def av_info(path: str) -> tp.Tuple[int, int, int, float]:
    """(sample_rate, channels, est_frames, duration_sec) for any format
    ffmpeg can demux (mp3/ogg/flac/aac/opus/wav)."""
    assert _avlib is not None
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    n = ctypes.c_long()
    dur = ctypes.c_double()
    rc = _avlib.av_audio_info(str(path).encode(), ctypes.byref(sr),
                              ctypes.byref(ch), ctypes.byref(n),
                              ctypes.byref(dur))
    if rc != 0:
        raise RuntimeError(f"native av_audio_info failed ({rc}) for {path}")
    return sr.value, ch.value, n.value, dur.value


def av_read(path: str, seek_time: float = 0.0, duration: float = -1.0
            ) -> tp.Tuple[np.ndarray, int]:
    """Decode compressed audio with sample-accurate seek: ([C, T] f32, sr)."""
    assert _avlib is not None
    sr, ch, total, dur = av_info(path)
    if duration > 0:
        cap = int(duration * sr + 0.5) + 1
    else:
        # VBR estimates can undershoot; leave headroom and trim after
        cap = max(total - int(seek_time * sr), 0) + sr
    cap = max(cap, 1)
    out = np.zeros((max(ch, 1), cap), np.float32)
    out_sr = ctypes.c_int()
    out_ch = ctypes.c_int()
    got = _avlib.av_audio_read(
        str(path).encode(), float(seek_time), float(duration),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        ctypes.byref(out_sr), ctypes.byref(out_ch))
    if got < 0:
        raise RuntimeError(f"native av_audio_read failed ({got}) for {path}")
    return out[:out_ch.value, :got].copy(), out_sr.value


def av_write(path: str, wav: np.ndarray, sample_rate: int, format: str,
             bitrate_kbps: int = 0) -> None:
    """Encode [C, T] float32 to wav/mp3/ogg/flac/aac/opus."""
    assert _avlib is not None
    wav = np.ascontiguousarray(np.asarray(wav, np.float32).T)  # [T, C]
    frames, ch = wav.shape
    rc = _avlib.av_audio_write(
        str(path).encode(),
        wav.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        frames, ch, int(sample_rate), format.encode(), int(bitrate_kbps))
    if rc != 0:
        raise RuntimeError(f"native av_audio_write failed ({rc}) for {path}")


def wav_info(path: str) -> tp.Tuple[int, int, int]:
    """(sample_rate, channels, num_frames)."""
    assert _lib is not None
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    n = ctypes.c_long()
    rc = _lib.wav_info(str(path).encode(), ctypes.byref(sr), ctypes.byref(ch),
                       ctypes.byref(n))
    if rc != 0:
        raise RuntimeError(f"native wav_info failed ({rc}) for {path}")
    return sr.value, ch.value, n.value


def wav_read(path: str, seek_time: float = 0.0, duration: float = -1.0
             ) -> tp.Tuple[np.ndarray, int]:
    """Decode ([C, T] float32, sample_rate) via the native library."""
    assert _lib is not None
    sr, ch, total = wav_info(path)
    start = int(seek_time * sr)
    want = int(duration * sr) if duration > 0 else max(total - start, 0)
    # the native side writes channel c at stride out_capacity_frames, so the
    # capacity we pass MUST be the allocated column count
    out = np.empty((ch, max(want, 1)), np.float32)
    got = _lib.wav_read(str(path).encode(), start, want,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        out.shape[1])
    if got < 0:
        raise RuntimeError(f"native wav_read failed ({got}) for {path}")
    return out[:, :got].copy(), sr


def wav_read_resample(path: str, seek_time: float, duration: float,
                      target_sr: int, target_channels: int) -> np.ndarray:
    """Fused decode + resample + channel conversion: [C_t, T_t] float32."""
    assert _lib is not None
    sr, ch, total = wav_info(path)
    want_src = int(duration * sr) if duration > 0 else total
    cap = int(np.ceil(want_src * target_sr / sr)) + 16
    out = np.empty((target_channels, cap), np.float32)
    got = _lib.wav_read_resample(
        str(path).encode(), float(seek_time), float(duration), target_sr,
        target_channels, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap)
    if got < 0:
        raise RuntimeError(f"native wav_read_resample failed ({got}) for {path}")
    return out[:, :got].copy()
