"""Sound dataset: environmental-sound metadata + on-the-fly batch mixing
augmentation with SNR control and text concat.

Parity: `audiocraft/data/sound_dataset.py:30-330` (numpy waveforms).
"""
import json
import logging
import random
import typing as tp
from dataclasses import dataclass, fields, replace
from pathlib import Path

import numpy as np

from ..modules.conditioners import ConditioningAttributes, WavCondition
from .info_audio_dataset import (InfoAudioDataset,
                                 get_keyword_or_keyword_list)
from .audio_dataset import SegmentInfo

logger = logging.getLogger(__name__)

EPS = 1e-8
TARGET_LEVEL_LOWER = -35
TARGET_LEVEL_UPPER = -15


@dataclass
class SoundInfo(SegmentInfo):
    """`sound_dataset.py:34-85`."""
    description: tp.Optional[str] = None
    self_wav: tp.Optional[WavCondition] = None

    @property
    def has_sound_meta(self) -> bool:
        return self.description is not None

    def to_condition_attributes(self) -> ConditioningAttributes:
        out = ConditioningAttributes()
        for _field in fields(self):
            key, value = _field.name, getattr(self, _field.name)
            if key == "self_wav":
                out.wav[key] = value
            else:
                out.text[key] = value
        return out

    @staticmethod
    def attribute_getter(attribute):
        if attribute == "description":
            return get_keyword_or_keyword_list
        return None

    @classmethod
    def from_dict(cls, dictionary: dict, fields_required: bool = False):
        _dictionary: tp.Dict[str, tp.Any] = {}
        post_init_attributes = ["self_wav"]
        for _field in fields(cls):
            if _field.name in post_init_attributes:
                continue
            elif _field.name not in dictionary:
                if fields_required:
                    raise KeyError(f"Unexpected missing key: {_field.name}")
            else:
                preprocess_func = cls.attribute_getter(_field.name)
                value = dictionary[_field.name]
                if preprocess_func:
                    value = preprocess_func(value)
                _dictionary[_field.name] = value
        return cls(**_dictionary)


class SoundDataset(InfoAudioDataset):
    """AudioCaps-style dataset with mixing augmentation
    (`sound_dataset.py:88-173`)."""

    def __init__(self, *args, info_fields_required: bool = True,
                 external_metadata_source: tp.Optional[str] = None,
                 aug_p: float = 0., mix_p: float = 0., mix_snr_low: int = -5,
                 mix_snr_high: int = 5, mix_min_overlap: float = 0.5, **kwargs):
        kwargs["return_info"] = True
        super().__init__(*args, **kwargs)
        self.info_fields_required = info_fields_required
        self.external_metadata_source = external_metadata_source
        self.aug_p = aug_p
        self.mix_p = mix_p
        if self.aug_p > 0:
            assert self.mix_p > 0, "Expecting some mixing proportion mix_p if aug_p > 0"
            assert self.channels == 1, \
                "SoundDataset with audio mixing considers only monophonic audio"
        self.mix_snr_low = mix_snr_low
        self.mix_snr_high = mix_snr_high
        self.mix_min_overlap = mix_min_overlap

    def _get_info_path(self, path: tp.Union[str, Path]) -> Path:
        """`sound_dataset.py:129-140`."""
        info_path = Path(path).with_suffix(".json")
        if Path(info_path).exists():
            return info_path
        elif self.external_metadata_source and \
                (Path(self.external_metadata_source) / info_path.name).exists():
            return Path(self.external_metadata_source) / info_path.name
        raise Exception(f"Unable to find a metadata JSON for path: {path}")

    def __getitem__(self, index):
        wav, info = super().__getitem__(index)
        info_data = info.to_dict()
        info_path = self._get_info_path(info.meta.path)
        if Path(info_path).exists():
            with open(info_path, "r") as json_file:
                sound_data = json.load(json_file)
                sound_data.update(info_data)
                sound_info = SoundInfo.from_dict(
                    sound_data, fields_required=self.info_fields_required)
                if isinstance(sound_info.description, list):
                    sound_info.description = random.choice(sound_info.description)
        else:
            sound_info = SoundInfo.from_dict(info_data, fields_required=False)

        sound_info.self_wav = WavCondition(
            wav=wav[None], length=np.array([info.n_frames]),
            sample_rate=[sound_info.sample_rate], path=[info.meta.path],
            seek_time=[info.seek_time])
        return wav, sound_info

    def collater(self, samples):
        """Batch mixing happens at collate time (`sound_dataset.py:165-173`)."""
        wav, sound_info = super().collater(samples)
        if self.aug_p > 0:
            wav, sound_info = mix_samples(
                wav, sound_info, self.aug_p, self.mix_p,
                snr_low=self.mix_snr_low, snr_high=self.mix_snr_high,
                min_overlap=self.mix_min_overlap)
        return wav, sound_info


def rms_f(x: np.ndarray) -> np.ndarray:
    return np.sqrt((x ** 2).mean(axis=1))


def normalize(audio: np.ndarray, target_level: int = -25) -> np.ndarray:
    """Normalize to the target dB level (`sound_dataset.py:176-183`)."""
    rms = rms_f(audio)
    scalar = 10 ** (target_level / 20) / (rms + EPS)
    return audio * scalar[:, None]


def is_clipped(audio: np.ndarray, clipping_threshold: float = 0.99) -> np.ndarray:
    return (np.abs(audio) > clipping_threshold).any(axis=1)


def mix_pair(src: np.ndarray, dst: np.ndarray, min_overlap: float) -> np.ndarray:
    """`sound_dataset.py:189-196`."""
    start = random.randint(0, int(src.shape[1] * (1 - min_overlap)))
    remainder = src.shape[1] - start
    src = src.copy()
    if dst.shape[1] > remainder:
        src[:, start:] = src[:, start:] + dst[:, :remainder]
    else:
        src[:, start:start + dst.shape[1]] = src[:, start:start + dst.shape[1]] + dst
    return src


def snr_mixer(clean: np.ndarray, noise: np.ndarray, snr: int, min_overlap: float,
              target_level: int = -25, clipping_threshold: float = 0.99
              ) -> np.ndarray:
    """Mix at a given SNR (`sound_dataset.py:199-250`)."""
    if clean.shape[1] > noise.shape[1]:
        noise = np.pad(noise, ((0, 0), (0, clean.shape[1] - noise.shape[1])))
    else:
        noise = noise[:, :clean.shape[1]]

    clean = clean / (np.abs(clean).max(axis=1, keepdims=True) + EPS)
    clean = normalize(clean, target_level)
    rmsclean = rms_f(clean)

    noise = noise / (np.abs(noise).max(axis=1, keepdims=True) + EPS)
    noise = normalize(noise, target_level)
    rmsnoise = rms_f(noise)

    noisescalar = (rmsclean / (10 ** (snr / 20)) / (rmsnoise + EPS))[:, None]
    noisenewlevel = noise * noisescalar
    noisyspeech = mix_pair(clean, noisenewlevel, min_overlap)

    noisy_rms_level = np.random.randint(TARGET_LEVEL_LOWER, TARGET_LEVEL_UPPER)
    rmsnoisy = rms_f(noisyspeech)
    scalarnoisy = (10 ** (noisy_rms_level / 20) / (rmsnoisy + EPS))[:, None]
    noisyspeech = noisyspeech * scalarnoisy
    clean = clean * scalarnoisy
    noisenewlevel = noisenewlevel * scalarnoisy

    clipped = is_clipped(noisyspeech)
    if clipped.any():
        maxamp = (np.abs(noisyspeech[clipped]).max(axis=1, keepdims=True)
                  / (clipping_threshold - EPS))
        noisyspeech[clipped] = noisyspeech[clipped] / maxamp
    return noisyspeech


def snr_mix(src: np.ndarray, dst: np.ndarray, snr_low: int, snr_high: int,
            min_overlap: float):
    """`sound_dataset.py:253-259`."""
    if snr_low == snr_high:
        snr = snr_low
    else:
        snr = np.random.randint(snr_low, snr_high)
    return snr_mixer(src, dst, snr, min_overlap)


def mix_text(src_text: str, dst_text: str) -> str:
    if src_text == dst_text:
        return src_text
    return src_text + " " + dst_text


def mix_samples(wavs: np.ndarray, infos: tp.List[SoundInfo], aug_p: float,
                mix_p: float, snr_low: int, snr_high: int, min_overlap: float):
    """Batch mixing: sum waveforms + concat descriptions
    (`sound_dataset.py:268-330`)."""
    if mix_p == 0:
        return wavs, infos

    if random.uniform(0, 1) < aug_p:
        assert wavs.shape[1] == 1, \
            f"Mix samples requires monophonic audio but C={wavs.shape[1]}"
        wavs2 = wavs.mean(axis=1)
        B, T = wavs2.shape
        k = int(mix_p * B)
        mixed_sources_idx = np.random.permutation(B)[:k]
        mixed_targets_idx = np.random.permutation(B)[:k]
        aug_wavs = snr_mix(wavs2[mixed_sources_idx], wavs2[mixed_targets_idx],
                           snr_low, snr_high, min_overlap)
        descriptions = [info.description for info in infos]
        aug_infos = []
        for i, j in zip(mixed_sources_idx, mixed_targets_idx):
            text = mix_text(descriptions[i], descriptions[j])
            m = replace(infos[i])
            m.description = text
            aug_infos.append(m)
        aug_wavs = aug_wavs[:, None]
        assert aug_wavs.shape[0] > 0, "Samples mixing returned empty batch."
        assert aug_wavs.shape[0] == len(aug_infos)
        return aug_wavs, aug_infos
    else:
        B, C, T = wavs.shape
        k = int(mix_p * B)
        wav_idx = np.random.permutation(B)[:k]
        wavs = wavs[wav_idx]
        infos = [infos[i] for i in wav_idx]
        return wavs, infos
