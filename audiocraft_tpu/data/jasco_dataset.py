"""JASCO dataset: music + symbolic conditions (per-frame chords, melody
salience).

Parity: `audiocraft/data/jasco_dataset.py:23-312` — pickled per-track
(time, chord) sequences -> per-frame chord labels via binary search;
salience-matrix melody loading with frame-rate interpolation.
"""
import bisect
import math
import os
import pickle
import typing as tp
from dataclasses import dataclass, fields
from pathlib import Path

import numpy as np

from ..modules.conditioners import ConditioningAttributes, SymbolicCondition
from ..utils.utils import construct_frame_chords
from .music_dataset import MusicDataset, MusicInfo


@dataclass
class JascoInfo(MusicInfo):
    """`jasco_dataset.py:23-48`."""
    chords: tp.Optional[SymbolicCondition] = None
    melody: tp.Optional[SymbolicCondition] = None

    def to_condition_attributes(self) -> ConditioningAttributes:
        out = ConditioningAttributes()
        for _field in fields(self):
            key, value = _field.name, getattr(self, _field.name)
            if key == "self_wav":
                out.wav[key] = value
            elif key in {"chords", "melody"}:
                out.symbolic[key] = value
            elif key == "joint_embed":
                for embed_attribute, embed_cond in value.items():
                    out.joint_embed[embed_attribute] = embed_cond
            else:
                if isinstance(value, list):
                    value = " ".join(value)
                out.text[key] = value
        return out


class MelodyData:
    """Salience-matrix loader with frame-rate interpolation
    (`jasco_dataset.py:50-172`)."""

    SALIENCE_MODEL_EXPECTED_SAMPLE_RATE = 22050
    SALIENCE_MODEL_EXPECTED_HOP_SIZE = 256

    def __init__(self, latent_fr: int, segment_duration: float,
                 melody_fr: int = 86, melody_salience_dim: int = 53,
                 chroma_root: tp.Optional[str] = None,
                 override_cache: bool = False, do_argmax: bool = True):
        self.segment_duration = segment_duration
        self.melody_fr = melody_fr
        self.latent_fr = latent_fr
        self.melody_salience_dim = melody_salience_dim
        self.do_argmax = do_argmax
        self.tgt_chunk_len = int(latent_fr * segment_duration)
        self.null_op = chroma_root is None
        if not self.null_op:
            cache_file = Path(chroma_root) / "cache.pkl"
            if cache_file.exists() and not override_cache:
                with open(cache_file, "rb") as f:
                    tmp = pickle.load(f)
                self.tracks = tmp["tracks"]
                self.saliency_files = tmp["saliency_files"]
                self.trk2idx = tmp["trk2idx"]
            else:
                self.tracks = []
                for file in sorted(Path(chroma_root).rglob("*.txt")):
                    with open(file) as f:
                        self.tracks += [line.strip() for line in f.readlines()]
                self.saliency_files = []
                for track in self.tracks:
                    stem = track.split("/")[-1].split(".")[0]
                    sf = f"{chroma_root}/{stem}_multif0_salience.npz"
                    assert os.path.exists(sf), f"File {sf} does not exist"
                    self.saliency_files.append(sf)
                self.trk2idx = {t.split("/")[-1].split(".")[0]: i
                                for i, t in enumerate(self.tracks)}
                with open(cache_file, "wb") as f:
                    pickle.dump({"tracks": self.tracks,
                                 "saliency_files": self.saliency_files,
                                 "trk2idx": self.trk2idx}, f)
        self.model_frame_rate = int(self.SALIENCE_MODEL_EXPECTED_SAMPLE_RATE
                                    / self.SALIENCE_MODEL_EXPECTED_HOP_SIZE)

    def get_null_salience(self) -> np.ndarray:
        return np.zeros((self.melody_salience_dim, self.tgt_chunk_len),
                        np.float32)

    def _interpolate(self, sal: np.ndarray) -> np.ndarray:
        """Linear interpolation on the time axis to the latent frame rate."""
        src_T = sal.shape[-1]
        tgt_T = self.tgt_chunk_len
        x_src = np.linspace(0, 1, src_T)
        x_tgt = np.linspace(0, 1, tgt_T)
        return np.stack([np.interp(x_tgt, x_src, sal[i])
                         for i in range(sal.shape[0])]).astype(np.float32)

    def __call__(self, x: MusicInfo) -> np.ndarray:
        if self.null_op:
            return self.get_null_salience()
        stem = x.meta.path.split("/")[-1].split(".")[0]
        if stem not in self.trk2idx:
            return self.get_null_salience()
        sal_npz = np.load(self.saliency_files[self.trk2idx[stem]])
        salience = np.asarray(sal_npz["salience"])  # [freq_bins, T]
        start = int(x.seek_time * self.model_frame_rate)
        end = start + int(self.segment_duration * self.model_frame_rate)
        chunk = salience[:self.melody_salience_dim, start:end]
        out = self._interpolate(chunk)
        if self.do_argmax and out.size:
            am = out.argmax(axis=0)
            hard = np.zeros_like(out)
            hard[am, np.arange(out.shape[1])] = 1.0
            out = hard * (out.max(axis=0, keepdims=True) > 0)
        return out


class JascoDataset(MusicDataset):
    """`jasco_dataset.py:173-312`."""

    @classmethod
    def from_meta(cls, root: tp.Union[str, Path], **kwargs):
        """`jasco_dataset.py:183-208`: expects data.jsonl(.gz) + optional
        chords/chord_to_index mappings next to it."""
        root = Path(root)
        if root.is_dir():
            if (root / "data.jsonl").exists():
                manifest = root / "data.jsonl"
            elif (root / "data.jsonl.gz").exists():
                manifest = root / "data.jsonl.gz"
            else:
                raise ValueError(
                    "Don't know where to read metadata from in the dir. "
                    "Expecting either a data.jsonl or data.jsonl.gz file.")
        else:
            manifest = root
            root = root.parent
        from .audio_dataset import load_audio_meta
        meta = load_audio_meta(manifest)
        kwargs.setdefault("chords_path", str(root / "chords_per_track.pkl"))
        kwargs.setdefault("chords_mapping_path",
                          str(root / "chord_to_index_mapping.pkl"))
        return cls(meta, **kwargs)

    def __init__(self, *args, compression_model_framerate: int = 50,
                 chords_card: int = 194,
                 chords_path: tp.Optional[str] = None,
                 chords_mapping_path: tp.Optional[str] = None,
                 melody_kwargs: tp.Optional[dict] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.chords_per_track = None
        self.mapping_dict = None
        if chords_path and os.path.exists(chords_path):
            with open(chords_path, "rb") as f:
                self.chords_per_track = pickle.load(f)
        if chords_mapping_path and os.path.exists(chords_mapping_path):
            with open(chords_mapping_path, "rb") as f:
                self.mapping_dict = pickle.load(f)
        self.compression_model_framerate = compression_model_framerate
        self.null_chord_idx = chords_card
        self.melody_module = MelodyData(**(melody_kwargs or dict(
            latent_fr=compression_model_framerate,
            segment_duration=self.segment_duration or 10.0)))

    def _get_relevant_sublist(self, chords, timestamp):
        """Binary-search the chord sublist for a segment
        (`jasco_dataset.py:239-267`)."""
        end_time = timestamp + (self.segment_duration or 0.0)
        start_index = bisect.bisect_left(chords, (timestamp,))
        prev_chord = chords[start_index - 1] if start_index != 0 else (0.0, "N")
        relevant_chords = []
        for time_changed, chord in chords[start_index:]:
            if time_changed >= end_time:
                break
            relevant_chords.append((time_changed, chord))
        return relevant_chords, prev_chord

    def _get_chords(self, music_info: MusicInfo,
                    effective_segment_dur: float) -> np.ndarray:
        """Per-frame chord labels (`jasco_dataset.py:269-295`)."""
        if self.chords_per_track is None:
            seq_len = math.ceil(self.compression_model_framerate
                                * effective_segment_dur)
            return np.full((seq_len,), self.null_chord_idx, np.int64)
        fr = self.compression_model_framerate
        idx = music_info.meta.path.split("/")[-1].split(".")[0]
        chords = self.chords_per_track[idx]
        min_timestamp = music_info.seek_time
        chords = [(item[1], item[0]) for item in chords]
        chords, prev_chord = self._get_relevant_sublist(chords, min_timestamp)
        iter_min_timestamp = int(min_timestamp * fr) + 1
        frame_chords = construct_frame_chords(
            iter_min_timestamp, chords, self.mapping_dict, prev_chord[1],
            fr, self.segment_duration)
        return np.asarray(frame_chords, np.int64)

    def __getitem__(self, index):
        """`jasco_dataset.py:296-312`."""
        wav, music_info = super().__getitem__(index)
        assert np.isfinite(wav).all(), f"inf in wav file: {music_info}"
        jasco_info = JascoInfo(**{f.name: getattr(music_info, f.name)
                                  for f in fields(music_info)})
        effective_segment_dur = (wav.shape[-1] / self.sample_rate) \
            if self.segment_duration is None else self.segment_duration
        frame_chords = self._get_chords(music_info, effective_segment_dur)
        jasco_info.chords = SymbolicCondition(frame_chords=frame_chords)
        jasco_info.melody = SymbolicCondition(
            melody=self.melody_module(music_info))
        return wav, jasco_info
