"""TensorBoard writer wiring (`ref solvers/base.py:51-54`,
`ref config/config.yaml:31-44`)."""
import numpy as np
import pytest

tbx = pytest.importorskip("tensorboardX")


def _event_files(folder):
    return list(folder.rglob("events.out.tfevents.*"))


def test_writers_scalars_and_audio(tmp_path):
    from audiocraft_tpu.utils.writers import ExperimentWriters
    cfg = {"logging": {"log_tensorboard": True},
           "tensorboard": {"with_media_logging": True}}
    w = ExperimentWriters(cfg, tmp_path)
    assert w.active
    w.write_scalars("train", {"ce": 3.2, "ppl": 24.5, "skipme": "str"}, 1)
    w.write_scalars("valid", {"ce": np.float32(2.9)}, 1)
    w.write_audio("gen/sample_0", np.zeros((1, 1600), np.float32), 16000, 1)
    w.close()
    events = _event_files(tmp_path / "tensorboard")
    assert events, "no tensorboard event files written"
    # the scalars are really in the event file
    from tensorboardX.proto import event_pb2
    import struct
    tags = set()
    for ev in events:
        data = ev.read_bytes()
        off = 0
        while off + 12 <= len(data):
            (length,) = struct.unpack_from("<Q", data, off)
            off += 12  # u64 len + u32 crc
            rec = event_pb2.Event()
            rec.ParseFromString(data[off:off + length])
            off += length + 4
            for v in rec.summary.value:
                tags.add(v.tag)
    assert "train/ce" in tags and "valid/ce" in tags, tags
    assert any(t.startswith("gen/sample_0") for t in tags), tags


def test_writers_disabled_noop(tmp_path):
    from audiocraft_tpu.utils.writers import ExperimentWriters
    w = ExperimentWriters({}, tmp_path)
    assert not w.active
    w.write_scalars("train", {"ce": 1.0}, 1)
    w.write_audio("x", np.zeros((1, 10), np.float32), 16000, 1)
    w.close()
    assert not _event_files(tmp_path)


def test_solver_run_writes_tensorboard(tmp_path):
    """A real (tiny) musicgen train epoch writes per-stage scalars."""
    from audiocraft_tpu.data.audio_dataset import AudioMeta
    from audiocraft_tpu.data.info_audio_dataset import AudioInfo
    from audiocraft_tpu.data.music_dataset import MusicInfo
    from audiocraft_tpu.solvers.musicgen import MusicGenSolver

    solver = MusicGenSolver({"seed": 0, "sample_rate": 32000,
                             "compression_model_checkpoint": "debug",
                             "folder": str(tmp_path),
                             "logging": {"log_tensorboard": True},
                             "optim": {"epochs": 1, "updates_per_epoch": 1}})
    rs = np.random.RandomState(0)
    wav = (0.1 * rs.randn(2, 1, 12800)).astype(np.float32)
    infos = [MusicInfo(**AudioInfo(AudioMeta("x.wav", 0.4, 32000), 0.0,
                                   12800, 12800, 32000, 1).to_dict(),
                       description="tb tune") for _ in range(2)]
    solver.dataloaders = {"train": [(wav, infos)]}
    solver.run()
    assert _event_files(tmp_path), "solver run produced no tensorboard events"
