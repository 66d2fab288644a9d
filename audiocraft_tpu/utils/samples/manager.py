"""Generated-sample artifact store with hashed ids per XP folder.

Parity: `audiocraft/utils/samples/manager.py:42-366` — sha1 sample ids from
conditioning+prompt, per-epoch folders, JSON metadata sidecars, cross-XP
stable-sample matching.
"""
import hashlib
import json
import logging
import re
import typing as tp
import unicodedata
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import asdict, dataclass
from functools import lru_cache
from pathlib import Path

import numpy as np

from ...data.audio import audio_read, audio_write

logger = logging.getLogger(__name__)


@dataclass
class ReferenceSample:
    id: str
    path: str
    duration: float


@dataclass
class Sample:
    id: str
    path: str
    epoch: int
    duration: float
    conditioning: tp.Optional[tp.Dict[str, tp.Any]]
    prompt: tp.Optional[ReferenceSample]
    reference: tp.Optional[ReferenceSample]
    generation_args: tp.Optional[tp.Dict[str, tp.Any]]

    def __hash__(self):
        return hash(self.id)

    def audio(self):
        return audio_read(self.path)

    def audio_prompt(self):
        return audio_read(self.prompt.path) if self.prompt is not None else None

    def audio_reference(self):
        return audio_read(self.reference.path) if self.reference is not None else None


class SampleManager:
    """Sample IO within an XP folder (`manager.py:72-303`)."""

    def __init__(self, xp, map_reference_to_sample_id: bool = False):
        self.xp = xp
        gen_cfg = xp.cfg.get("generate", {}) if isinstance(xp.cfg, dict) else {}
        self.base_folder: Path = Path(xp.folder) / gen_cfg.get("path", "samples")
        self.reference_folder = self.base_folder / "reference"
        self.map_reference_to_sample_id = map_reference_to_sample_id
        self.audio_cfg = gen_cfg.get("audio", {})
        self.sample_rate = (xp.cfg.get("sample_rate", 16000)
                            if isinstance(xp.cfg, dict) else 16000)
        self.samples: tp.List[Sample] = []
        self._load_samples()

    @property
    def latest_epoch(self) -> int:
        return max(self.samples, key=lambda x: x.epoch).epoch if self.samples else 0

    def _load_samples(self):
        jsons = self.base_folder.glob("**/*.json")
        with ThreadPoolExecutor(6) as pool:
            self.samples = list(pool.map(self._load_sample, jsons))

    @staticmethod
    @lru_cache(2 ** 16)
    def _load_sample(json_file: Path) -> Sample:
        with open(json_file, "r") as f:
            data: tp.Dict[str, tp.Any] = json.load(f)
        prompt_data = data.get("prompt")
        prompt = ReferenceSample(**prompt_data) if prompt_data else None
        reference_data = data.get("reference")
        reference = ReferenceSample(**reference_data) if reference_data else None
        return Sample(id=data["id"], path=data["path"], epoch=data["epoch"],
                      duration=data["duration"], prompt=prompt,
                      conditioning=data.get("conditioning"),
                      reference=reference,
                      generation_args=data.get("generation_args"))

    def _get_tensor_id(self, tensor: np.ndarray) -> str:
        return hashlib.sha1(np.ascontiguousarray(tensor)).hexdigest()

    def _get_sample_id(self, index: int, prompt_wav, conditions) -> str:
        """Deterministic sha1 id from inputs (`manager.py:134-172`)."""
        if prompt_wav is None and not conditions:
            return f"noinput_{uuid.uuid4().hex}"
        hr_label = ""
        hash_id = hashlib.sha1()
        hash_id.update(f"{index}".encode())
        if prompt_wav is not None:
            hash_id.update(np.ascontiguousarray(np.asarray(prompt_wav)))
            hr_label += "_prompted"
        else:
            hr_label += "_unprompted"
        if conditions:
            encoded_json = json.dumps(conditions, sort_keys=True).encode()
            hash_id.update(encoded_json)
            cond_str = "-".join(f"{key}={slugify(value)}"
                                for key, value in sorted(conditions.items()))
            cond_str = cond_str[:100]
            hr_label += f"_{cond_str or 'unconditioned'}"
        else:
            hr_label += "_unconditioned"
        return hash_id.hexdigest() + hr_label

    def _store_audio(self, wav, stem_path: Path, overwrite: bool = False) -> Path:
        """`manager.py:173-195`."""
        existing = [p for p in stem_path.parent.glob(stem_path.stem + ".*")
                    if p.suffix != ".json"]
        if existing and not overwrite:
            return existing[0]
        return audio_write(stem_path, np.asarray(wav), self.sample_rate,
                           **self.audio_cfg)

    def add_sample(self, sample_wav, epoch: int, index: int = 0,
                   conditions: tp.Optional[tp.Dict[str, str]] = None,
                   prompt_wav=None, ground_truth_wav=None,
                   generation_args: tp.Optional[dict] = None) -> Sample:
        """Store one sample + metadata (`manager.py:196-237`)."""
        sample_id = self._get_sample_id(index, prompt_wav, conditions)
        reuse_id = self.map_reference_to_sample_id
        prompt, ground_truth = None, None
        duration = float(np.asarray(sample_wav).shape[-1]) / self.sample_rate
        if prompt_wav is not None:
            prompt_id = sample_id if reuse_id else self._get_tensor_id(
                np.asarray(prompt_wav))
            prompt_duration = float(np.asarray(prompt_wav).shape[-1]) / self.sample_rate
            prompt_path = self._store_audio(
                prompt_wav, self.base_folder / str(epoch) / "prompt" / prompt_id)
            prompt = ReferenceSample(prompt_id, str(prompt_path), prompt_duration)
        if ground_truth_wav is not None:
            gt_id = sample_id if reuse_id else self._get_tensor_id(
                np.asarray(ground_truth_wav))
            gt_duration = float(np.asarray(ground_truth_wav).shape[-1]) / self.sample_rate
            gt_path = self._store_audio(ground_truth_wav,
                                        self.reference_folder / gt_id)
            ground_truth = ReferenceSample(gt_id, str(gt_path), gt_duration)
        sample_path = self._store_audio(
            sample_wav, self.base_folder / str(epoch) / sample_id,
            overwrite=True)
        sample = Sample(sample_id, str(sample_path), epoch, duration,
                        conditions, prompt, ground_truth, generation_args)
        self.samples.append(sample)
        with open(str(sample_path.with_suffix(".json")), "w") as f:
            data = asdict(sample)
            json.dump(data, f, indent=2)
        return sample

    def add_samples(self, samples_wavs, epoch: int,
                    conditioning: tp.Optional[tp.List[tp.Dict[str, tp.Any]]] = None,
                    prompt_wavs=None, ground_truth_wavs=None,
                    generation_args: tp.Optional[dict] = None) -> tp.List[Sample]:
        """Batch variant (`manager.py:238-268`)."""
        samples = []
        for idx, wav in enumerate(samples_wavs):
            prompt_wav = prompt_wavs[idx] if prompt_wavs is not None else None
            gt_wav = ground_truth_wavs[idx] if ground_truth_wavs is not None else None
            conditions = conditioning[idx] if conditioning is not None else None
            samples.append(self.add_sample(wav, epoch, idx, conditions,
                                           prompt_wav, gt_wav, generation_args))
        return samples

    def get_samples(self, epoch: int = -1, max_epoch: int = -1,
                    exclude_prompted: bool = False,
                    exclude_unprompted: bool = False,
                    exclude_conditioned: bool = False,
                    exclude_unconditioned: bool = False) -> tp.Set[Sample]:
        """Filtered sample retrieval (`manager.py:269-303`)."""
        if max_epoch >= 0:
            samples_epoch = max(s.epoch for s in self.samples if s.epoch <= max_epoch)
        else:
            samples_epoch = self.latest_epoch if epoch < 0 else epoch
        return {
            s for s in self.samples
            if (s.epoch == samples_epoch
                and (not exclude_prompted or s.prompt is None)
                and (not exclude_unprompted or s.prompt is not None)
                and (not exclude_conditioned or not s.conditioning)
                and (not exclude_unconditioned or s.conditioning))}


def slugify(value: tp.Any, allow_unicode: bool = False) -> str:
    """Filename-safe string (`manager.py:305-326`)."""
    value = str(value)
    if allow_unicode:
        value = unicodedata.normalize("NFKC", value)
    else:
        value = (unicodedata.normalize("NFKD", value)
                 .encode("ascii", "ignore").decode("ascii"))
    value = re.sub(r"[^\w\s-]", "", value.lower())
    return re.sub(r"[-\s]+", "-", value).strip("-_")


def _match_stable_samples(samples_per_xp: tp.List[tp.Set[Sample]]
                          ) -> tp.Dict[str, tp.List[Sample]]:
    """`manager.py:328-342`."""
    stable_samples_per_xp = [{
        s.id: s for s in samples
        if s.prompt is not None or s.conditioning}
        for samples in samples_per_xp]
    stable_ids = {id for samples in stable_samples_per_xp for id in samples.keys()}
    stable_samples = {id: [xp.get(id) for xp in stable_samples_per_xp]
                      for id in stable_ids}
    return {id: tp.cast(tp.List[Sample], samples)
            for id, samples in stable_samples.items()
            if all(s is not None for s in samples)}


def _match_unstable_samples(samples_per_xp: tp.List[tp.Set[Sample]]
                            ) -> tp.Dict[str, tp.List[Sample]]:
    """`manager.py:343-357`."""
    unstable_samples_per_xp = [
        sorted([s for s in samples if s.prompt is None and not s.conditioning],
               key=lambda x: x.id)
        for samples in samples_per_xp]
    min_len = min(len(samples) for samples in unstable_samples_per_xp)
    unstable_samples_per_xp = [samples[:min_len]
                               for samples in unstable_samples_per_xp]
    return {f"noinput_{i}": [samples[i] for samples in unstable_samples_per_xp]
            for i in range(min_len)}


def get_samples_for_xps(xps: tp.List, **kwargs) -> tp.Dict[str, tp.List[Sample]]:
    """Cross-XP sample matching for grid result pages (`manager.py:358-366`)."""
    managers = [SampleManager(xp) for xp in xps]
    samples_per_xp = [manager.get_samples(**kwargs) for manager in managers]
    stable_samples = _match_stable_samples(samples_per_xp)
    unstable_samples = _match_unstable_samples(samples_per_xp)
    return dict(stable_samples, **unstable_samples)
