"""AudioDataset tests: determinism, sampling, collation (cf. reference
`tests/data/test_audio_dataset.py`)."""
import json
from pathlib import Path

import numpy as np
import pytest

from audiocraft_tpu.data.audio import audio_write
from audiocraft_tpu.data.audio_dataset import (AudioDataset, AudioMeta,
                                               find_audio_files,
                                               load_audio_meta,
                                               save_audio_meta)


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rs = np.random.RandomState(0)
    for i, dur in enumerate([1.0, 2.0, 0.5]):
        sr = 16000
        wav = (0.2 * rs.randn(1, int(dur * sr))).astype(np.float32).clip(-1, 1)
        audio_write(d / f"sample_{i}", wav, sr, normalize=False, strategy="clip")
    return d


def test_find_and_save_load_meta(wav_dir, tmp_path):
    meta = find_audio_files(wav_dir, [".wav"], resolve=False)
    assert len(meta) == 3
    assert abs(meta[0].duration - 1.0) < 0.01
    manifest = tmp_path / "data.jsonl"
    save_audio_meta(manifest, meta)
    loaded = load_audio_meta(manifest, resolve=False)
    assert [m.path for m in loaded] == [m.path for m in meta]


def test_segment_sampling_deterministic_per_epoch(wav_dir):
    meta = find_audio_files(wav_dir, [".wav"], resolve=False)
    ds = AudioDataset(meta, segment_duration=0.5, num_samples=8,
                      sample_rate=16000, channels=1, return_info=True)
    ds.start_epoch(3)
    w1, i1 = ds[2]
    ds.start_epoch(3)
    w2, i2 = ds[2]
    np.testing.assert_array_equal(w1, w2)
    assert i1.seek_time == i2.seek_time
    ds.start_epoch(4)
    w3, _ = ds[2]
    assert not np.array_equal(w1, w3)  # different epoch -> different sample


def test_segment_shapes_and_padding(wav_dir):
    meta = find_audio_files(wav_dir, [".wav"], resolve=False)
    ds = AudioDataset(meta, segment_duration=1.5, num_samples=4,
                      sample_rate=16000, channels=1, return_info=True,
                      shuffle=False)
    wav, info = ds[0]
    assert wav.shape == (1, 24000)  # padded to segment length
    assert info.total_frames == 24000
    assert info.n_frames <= 24000


def test_collater_stacks(wav_dir):
    meta = find_audio_files(wav_dir, [".wav"], resolve=False)
    ds = AudioDataset(meta, segment_duration=0.5, num_samples=4,
                      sample_rate=16000, channels=1, return_info=True,
                      shuffle=False)
    batch = [ds[i] for i in range(3)]
    wav, infos = ds.collater(batch)
    assert wav.shape == (3, 1, 8000)
    assert len(infos) == 3


def test_full_file_mode(wav_dir):
    meta = find_audio_files(wav_dir, [".wav"], resolve=False)
    ds = AudioDataset(meta, segment_duration=None, sample_rate=16000,
                      channels=1, return_info=True)
    assert len(ds) == 3
    wav, info = ds[1]
    assert info.n_frames == wav.shape[-1]


def test_sampling_probabilities_weighted(wav_dir):
    meta = find_audio_files(wav_dir, [".wav"], resolve=False)
    meta[0].weight = 10.0
    ds = AudioDataset(meta, segment_duration=0.2, num_samples=100,
                      sample_rate=16000, channels=1,
                      sample_on_weight=True, sample_on_duration=False)
    p = ds.sampling_probabilities
    assert p[0] > 0.8  # weight 10 vs 1,1


def test_duration_filtering(wav_dir):
    meta = find_audio_files(wav_dir, [".wav"], resolve=False)
    ds = AudioDataset(meta, segment_duration=0.2, num_samples=4,
                      sample_rate=16000, channels=1, min_audio_duration=0.9)
    assert len(ds.meta) == 2  # 0.5s file filtered out


def test_permutation_on_files(wav_dir):
    meta = find_audio_files(wav_dir, [".wav"], resolve=False)
    ds = AudioDataset(meta, segment_duration=0.2, num_samples=6,
                      sample_rate=16000, channels=1,
                      sample_on_weight=False, sample_on_duration=False,
                      permutation_on_files=True)
    ds.start_epoch(0)
    rng = np.random.RandomState(0)
    picked = [ds.sample_file(i, rng).path for i in range(3)]
    assert sorted(picked) == sorted(m.path for m in ds.meta)
