"""Manifest-driven audio dataset with weighted random segment sampling.

Parity: `audiocraft/data/audio_dataset.py:39-587` — jsonl `AudioMeta`
manifests, weighted (duration x weight) file sampling, deterministic per-epoch
RNG, file-permutation mode, retry-on-decode-error, padding collate,
`find_audio_files` manifest builder and CLI.

Torch-free: numpy RNG (determinism per (epoch, index) is preserved; the draw
values differ from torch's generators), numpy waveforms; batches feed the
device via `jnp.asarray` at the training-step boundary.
"""
import argparse
import copy
import gzip
import json
import logging
import os
import random
import sys
import typing as tp
from concurrent.futures import ThreadPoolExecutor, Future
from dataclasses import dataclass, fields
from functools import lru_cache
from pathlib import Path

import numpy as np

from .audio import audio_info, audio_read
from .audio_utils import convert_audio
from .zip import PathInZip

try:
    import dora
except ImportError:
    dora = None  # type: ignore


class BaseInfo:
    """dict <-> dataclass helpers (`audio_dataset.py:39-57`)."""

    @classmethod
    def _dict2fields(cls, dictionary: dict):
        return {f.name: dictionary[f.name]
                for f in fields(cls) if f.name in dictionary}

    @classmethod
    def from_dict(cls, dictionary: dict):
        return cls(**cls._dict2fields(dictionary))

    def to_dict(self):
        return {f.name: self.__getattribute__(f.name) for f in fields(self)}


@dataclass(order=True)
class AudioMeta(BaseInfo):
    """One manifest line (`audio_dataset.py:61-83`)."""
    path: str
    duration: float
    sample_rate: int
    amplitude: tp.Optional[float] = None
    weight: tp.Optional[float] = None
    info_path: tp.Optional[PathInZip] = None

    @classmethod
    def from_dict(cls, dictionary: dict):
        base = cls._dict2fields(dictionary)
        if "info_path" in base and base["info_path"] is not None:
            base["info_path"] = PathInZip(base["info_path"])
        return cls(**base)

    def to_dict(self):
        d = super().to_dict()
        if d["info_path"] is not None:
            d["info_path"] = str(d["info_path"])
        return d


@dataclass(order=True)
class SegmentInfo(BaseInfo):
    """`audio_dataset.py:85-95`."""
    meta: AudioMeta
    seek_time: float
    n_frames: int      # actual number of frames without padding
    total_frames: int  # total number of frames, padding included
    sample_rate: int
    channels: int


DEFAULT_EXTS = [".wav", ".mp3", ".flac", ".ogg", ".m4a"]
logger = logging.getLogger(__name__)


def _get_audio_meta(file_path: str, minimal: bool = True) -> AudioMeta:
    """`audio_dataset.py:101-116`."""
    info = audio_info(file_path)
    amplitude: tp.Optional[float] = None
    if not minimal:
        wav, sr = audio_read(file_path)
        amplitude = float(np.abs(wav).max())
    return AudioMeta(file_path, info.duration, info.sample_rate, amplitude)


def _resolve_audio_meta(m: AudioMeta, fast: bool = True) -> AudioMeta:
    """Resolve relative paths (`audio_dataset.py:119-143`)."""
    def is_abs(m):
        if fast:
            return str(m)[0] == "/"
        return os.path.isabs(str(m))

    if dora is None:
        return m
    if not is_abs(m.path):
        m.path = dora.git_save.to_absolute_path(m.path)
    if m.info_path is not None and not is_abs(m.info_path.zip_path):
        m.info_path.zip_path = dora.git_save.to_absolute_path(m.path)
    return m


def find_audio_files(path: tp.Union[Path, str],
                     exts: tp.List[str] = DEFAULT_EXTS,
                     resolve: bool = True, minimal: bool = True,
                     progress: bool = False, workers: int = 0
                     ) -> tp.List[AudioMeta]:
    """Build a manifest by scanning a directory (`audio_dataset.py:145-203`)."""
    audio_files = []
    futures: tp.List[Future] = []
    pool: tp.Optional[ThreadPoolExecutor] = None
    with ThreadPoolExecutor(max(workers, 1)) as pool:
        for root, folders, files in os.walk(path, followlinks=True):
            for file in files:
                full_path = Path(root) / file
                if full_path.suffix.lower() in exts:
                    audio_files.append(full_path)
                    if workers > 0:
                        futures.append(pool.submit(_get_audio_meta,
                                                   str(audio_files[-1]), minimal))
                    if progress:
                        print(format(len(audio_files), " 8d"), end="\r",
                              file=sys.stderr)
        meta: tp.List[AudioMeta] = []
        for idx, file_path in enumerate(audio_files):
            try:
                if workers > 0:
                    m = futures[idx].result()
                else:
                    m = _get_audio_meta(str(file_path), minimal)
            except Exception as err:
                print("Error with", str(file_path), err, file=sys.stderr)
                continue
            if resolve:
                m = _resolve_audio_meta(m)
            meta.append(m)
            if progress:
                print(format((1 + idx) / len(audio_files), " 3.1%"), end="\r",
                      file=sys.stderr)
    meta.sort()
    return meta


def load_audio_meta(path: tp.Union[str, Path], resolve: bool = True,
                    fast: bool = True) -> tp.List[AudioMeta]:
    """Load a jsonl(.gz) manifest (`audio_dataset.py:206-226`)."""
    open_fn = gzip.open if str(path).lower().endswith(".gz") else open
    with open_fn(path, "rb") as fp:  # type: ignore
        lines = fp.readlines()
    meta = []
    for line in lines:
        d = json.loads(line)
        m = AudioMeta.from_dict(d)
        if resolve:
            m = _resolve_audio_meta(m, fast=fast)
        meta.append(m)
    return meta


def save_audio_meta(path: tp.Union[str, Path], meta: tp.List[AudioMeta]):
    """Save a jsonl(.gz) manifest (`audio_dataset.py:229-241`)."""
    Path(path).parent.mkdir(exist_ok=True, parents=True)
    open_fn = gzip.open if str(path).lower().endswith(".gz") else open
    with open_fn(path, "wb") as fp:  # type: ignore
        for m in meta:
            json_str = json.dumps(m.to_dict()) + "\n"
            fp.write(json_str.encode("utf-8"))


class AudioDataset:
    """Random-segment dataset over an AudioMeta manifest
    (`audio_dataset.py:244-562`). See the reference docstring for semantics;
    `start_epoch(epoch)` gives deterministic per-epoch shuffling."""

    def __init__(self, meta: tp.List[AudioMeta],
                 segment_duration: tp.Optional[float] = None,
                 shuffle: bool = True, num_samples: int = 10_000,
                 sample_rate: int = 48_000, channels: int = 2,
                 pad: bool = True, sample_on_duration: bool = True,
                 sample_on_weight: bool = True, min_segment_ratio: float = 0.5,
                 max_read_retry: int = 10, return_info: bool = False,
                 min_audio_duration: tp.Optional[float] = None,
                 max_audio_duration: tp.Optional[float] = None,
                 shuffle_seed: int = 0, load_wav: bool = True,
                 permutation_on_files: bool = False):
        assert len(meta) > 0, \
            "No audio meta provided to AudioDataset. Please check loading of audio meta."
        assert segment_duration is None or segment_duration > 0
        assert segment_duration is None or min_segment_ratio >= 0
        self.segment_duration = segment_duration
        self.min_segment_ratio = min_segment_ratio
        self.max_audio_duration = max_audio_duration
        self.min_audio_duration = min_audio_duration
        if self.min_audio_duration is not None and self.max_audio_duration is not None:
            assert self.min_audio_duration <= self.max_audio_duration
        self.meta: tp.List[AudioMeta] = self._filter_duration(meta)
        assert len(self.meta)
        self.total_duration = sum(d.duration for d in self.meta)

        if segment_duration is None:
            num_samples = len(self.meta)
        self.num_samples = num_samples
        self.shuffle = shuffle
        self.sample_rate = sample_rate
        self.channels = channels
        self.pad = pad
        self.sample_on_weight = sample_on_weight
        self.sample_on_duration = sample_on_duration
        self.sampling_probabilities = self._get_sampling_probabilities()
        self.max_read_retry = max_read_retry
        self.return_info = return_info
        self.shuffle_seed = shuffle_seed
        self.current_epoch: tp.Optional[int] = None
        self.load_wav = load_wav
        if not load_wav:
            assert segment_duration is not None
        self.permutation_on_files = permutation_on_files
        if permutation_on_files:
            assert not self.sample_on_duration
            assert not self.sample_on_weight
            assert self.shuffle

    def start_epoch(self, epoch: int):
        self.current_epoch = epoch

    def __len__(self):
        return self.num_samples

    def _get_sampling_probabilities(self, normalized: bool = True) -> np.ndarray:
        """`audio_dataset.py:362-376`."""
        scores: tp.List[float] = []
        for file_meta in self.meta:
            score = 1.0
            if self.sample_on_weight and file_meta.weight is not None:
                score *= file_meta.weight
            if self.sample_on_duration:
                score *= file_meta.duration
            scores.append(score)
        probabilities = np.array(scores, dtype=np.float64)
        if normalized:
            probabilities /= probabilities.sum()
        return probabilities

    @staticmethod
    @lru_cache(16)
    def _get_file_permutation(num_files: int, permutation_index: int,
                              base_seed: int) -> np.ndarray:
        rng = np.random.RandomState(base_seed + permutation_index)
        return rng.permutation(num_files)

    def sample_file(self, index: int, rng: np.random.RandomState) -> AudioMeta:
        """Weighted/permutation file sampling (`audio_dataset.py:380-402`)."""
        if self.permutation_on_files:
            assert self.current_epoch is not None
            total_index = self.current_epoch * len(self) + index
            permutation_index = total_index // len(self.meta)
            relative_index = total_index % len(self.meta)
            permutation = AudioDataset._get_file_permutation(
                len(self.meta), permutation_index, self.shuffle_seed)
            return self.meta[int(permutation[relative_index])]
        if not self.sample_on_weight and not self.sample_on_duration:
            file_index = int(rng.randint(len(self.sampling_probabilities)))
        else:
            file_index = int(rng.choice(len(self.sampling_probabilities),
                                        p=self.sampling_probabilities))
        return self.meta[file_index]

    def _audio_read(self, path: str, seek_time: float = 0, duration: float = -1):
        if self.load_wav:
            return audio_read(path, seek_time, duration, pad=False)
        assert self.segment_duration is not None
        n_frames = int(self.sample_rate * self.segment_duration)
        return np.zeros((self.channels, n_frames), np.float32), self.sample_rate

    def __getitem__(self, index: int):
        """`audio_dataset.py:404-457`."""
        if self.segment_duration is None:
            file_meta = self.meta[index]
            out, sr = audio_read(file_meta.path)
            out = np.asarray(convert_audio(out, sr, self.sample_rate, self.channels))
            n_frames = out.shape[-1]
            segment_info = SegmentInfo(file_meta, seek_time=0.0, n_frames=n_frames,
                                       total_frames=n_frames,
                                       sample_rate=self.sample_rate,
                                       channels=out.shape[0])
        else:
            if self.shuffle:
                if self.current_epoch is None:
                    seed = index + self.num_samples * random.randint(0, 2 ** 24)
                else:
                    seed = index + self.num_samples * (self.current_epoch + self.shuffle_seed)
            else:
                seed = index
            rng = np.random.RandomState(seed & 0x7FFFFFFF)

            for retry in range(self.max_read_retry):
                file_meta = self.sample_file(index, rng)
                max_seek = max(0, file_meta.duration
                               - self.segment_duration * self.min_segment_ratio)
                seek_time = rng.rand() * max_seek
                try:
                    out, sr = self._audio_read(file_meta.path, seek_time,
                                               self.segment_duration)
                    out = np.asarray(convert_audio(out, sr, self.sample_rate,
                                                   self.channels))
                    n_frames = out.shape[-1]
                    target_frames = int(self.segment_duration * self.sample_rate)
                    if self.pad:
                        out = np.pad(out, ((0, 0), (0, target_frames - n_frames)))
                    segment_info = SegmentInfo(file_meta, seek_time,
                                               n_frames=n_frames,
                                               total_frames=target_frames,
                                               sample_rate=self.sample_rate,
                                               channels=out.shape[0])
                except Exception as exc:
                    logger.warning("Error opening file %s: %r", file_meta.path, exc)
                    if retry == self.max_read_retry - 1:
                        raise
                else:
                    break

        if self.return_info:
            return out, segment_info
        return out

    def collater(self, samples):
        """Pad + stack a batch (`audio_dataset.py:462-500`)."""
        if self.segment_duration is None and len(samples) > 1:
            assert self.pad, "Must allow padding when batching examples of different durations."
        to_pad = self.segment_duration is None and self.pad
        if to_pad:
            max_len = max(wav.shape[-1] for wav, _ in samples) \
                if self.return_info else max(w.shape[-1] for w in samples)

            def _pad_wav(wav):
                return np.pad(wav, ((0, 0), (0, max_len - wav.shape[-1])))

        if self.return_info:
            if len(samples) > 0:
                assert len(samples[0]) == 2
                assert isinstance(samples[0][1], SegmentInfo)
            wavs = [wav for wav, _ in samples]
            segment_infos = [copy.deepcopy(info) for _, info in samples]
            if to_pad:
                for i in range(len(samples)):
                    segment_infos[i].total_frames = max_len
                    wavs[i] = _pad_wav(wavs[i])
            return np.stack(wavs), segment_infos
        if to_pad:
            samples = [_pad_wav(s) for s in samples]
        return np.stack(samples)

    def _filter_duration(self, meta: tp.List[AudioMeta]) -> tp.List[AudioMeta]:
        """`audio_dataset.py:502-527`."""
        orig_len = len(meta)
        if self.min_audio_duration is not None:
            meta = [m for m in meta if m.duration >= self.min_audio_duration]
        if self.max_audio_duration is not None:
            meta = [m for m in meta if m.duration <= self.max_audio_duration]
        filtered_len = len(meta)
        removed_percentage = 100 * (1 - float(filtered_len) / orig_len)
        msg = "Removed %.2f percent of the data because it was too short or too long." \
            % removed_percentage
        if removed_percentage < 10:
            logging.debug(msg)
        else:
            logging.warning(msg)
        return meta

    @classmethod
    def from_meta(cls, root: tp.Union[str, Path], **kwargs):
        """`audio_dataset.py:529-546`."""
        root = Path(root)
        if root.is_dir():
            if (root / "data.jsonl").exists():
                root = root / "data.jsonl"
            elif (root / "data.jsonl.gz").exists():
                root = root / "data.jsonl.gz"
            else:
                raise ValueError(
                    "Don't know where to read metadata from in the dir. "
                    "Expecting either a data.jsonl or data.jsonl.gz file but none found.")
        meta = load_audio_meta(root)
        return cls(meta, **kwargs)

    @classmethod
    def from_path(cls, root: tp.Union[str, Path], minimal_meta: bool = True,
                  exts: tp.List[str] = DEFAULT_EXTS, **kwargs):
        """`audio_dataset.py:548-562`."""
        root = Path(root)
        if root.is_file():
            meta = load_audio_meta(root, resolve=True)
        else:
            meta = find_audio_files(root, exts, minimal=minimal_meta, resolve=True)
        return cls(meta, **kwargs)


def main():
    """Manifest-builder CLI (`audio_dataset.py:562-587`)."""
    logging.basicConfig(stream=sys.stderr, level=logging.INFO)
    parser = argparse.ArgumentParser(
        prog="audio_dataset",
        description="Generate .jsonl files by scanning a folder.")
    parser.add_argument("root", help="Root folder with all the audio files")
    parser.add_argument("output_meta_file",
                        help="Output file to store the metadata")
    parser.add_argument("--complete", action="store_false", dest="minimal",
                        default=True,
                        help="Retrieve all metadata, even the expensive ones.")
    parser.add_argument("--resolve", action="store_true", default=False,
                        help="Resolve the paths to be absolute.")
    parser.add_argument("--workers", default=10, type=int)
    args = parser.parse_args()
    meta = find_audio_files(args.root, DEFAULT_EXTS, progress=True,
                            resolve=args.resolve, minimal=args.minimal,
                            workers=args.workers)
    save_audio_meta(args.output_meta_file, meta)


if __name__ == "__main__":
    main()
