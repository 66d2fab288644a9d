"""Datasets returning metadata bridging to conditioning attributes.

Parity: `audiocraft/data/info_audio_dataset.py:25-110`.
"""
import logging
import math
import re
import typing as tp
from dataclasses import dataclass

import numpy as np

from ..environment import AudioCraftEnvironment
from ..modules.conditioners import ConditioningAttributes
from .audio_dataset import AudioDataset, AudioMeta, SegmentInfo

logger = logging.getLogger(__name__)


def _clusterify_meta(meta: AudioMeta) -> AudioMeta:
    """`info_audio_dataset.py:25-30`."""
    meta.path = AudioCraftEnvironment.apply_dataset_mappers(meta.path)
    if meta.info_path is not None:
        meta.info_path.zip_path = AudioCraftEnvironment.apply_dataset_mappers(
            meta.info_path.zip_path)
    return meta


def clusterify_all_meta(meta: tp.List[AudioMeta]) -> tp.List[AudioMeta]:
    return [_clusterify_meta(m) for m in meta]


@dataclass
class SegmentWithAttributes(SegmentInfo):
    """Base for metadata that converts to conditioning attributes
    (`conditioners.py:127-136`)."""

    def to_condition_attributes(self) -> ConditioningAttributes:
        raise NotImplementedError()


@dataclass
class AudioInfo(SegmentWithAttributes):
    """SegmentInfo with (empty) conditioning attributes
    (`info_audio_dataset.py:38-52`)."""
    audio_tokens: tp.Optional[np.ndarray] = None  # cached LM batches

    def to_condition_attributes(self) -> ConditioningAttributes:
        return ConditioningAttributes()


class InfoAudioDataset(AudioDataset):
    """AudioDataset returning (wav, SegmentWithAttributes)
    (`info_audio_dataset.py:54-70`)."""

    def __init__(self, meta: tp.List[AudioMeta], **kwargs):
        super().__init__(clusterify_all_meta(meta), **kwargs)

    def __getitem__(self, index: int):
        if not self.return_info:
            return super().__getitem__(index)
        wav, meta = super().__getitem__(index)
        return wav, AudioInfo(**meta.to_dict())


def get_keyword_or_keyword_list(value: tp.Optional[str]):
    """`info_audio_dataset.py:72-78`."""
    if isinstance(value, list):
        return get_keyword_list(value)
    return get_keyword(value)


def get_string(value: tp.Optional[str]) -> tp.Optional[str]:
    if value is None or (not isinstance(value, str)) or len(value) == 0 or value == "None":
        return None
    return value.strip()


def get_keyword(value: tp.Optional[str]) -> tp.Optional[str]:
    if value is None or (not isinstance(value, str)) or len(value) == 0 or value == "None":
        return None
    return value.strip().lower()


def get_keyword_list(values: tp.Union[str, tp.List[str]]) -> tp.Optional[tp.List[str]]:
    """`info_audio_dataset.py:95-110`."""
    if isinstance(values, str):
        values = [v.strip() for v in re.split(r"[,\s]", values)]
    elif isinstance(values, float) and math.isnan(values):
        values = []
    if not isinstance(values, list):
        logger.debug(f"Unexpected keyword list {values}")
        values = [str(values)]
    kws = [get_keyword(v) for v in values]
    kw_list = [k for k in kws if k is not None]
    return kw_list if kw_list else None
