"""Experiment metric writers: TensorBoard (tensorboardX) and W&B.

Parity: the reference initializes flashy's TensorBoard/W&B loggers from
`logging.log_tensorboard` / `logging.log_wandb` (`ref solvers/base.py:51-54`,
`ref config/config.yaml:31-44`). Here a small facade owns the writers so the
solvers stay dependency-free; both backends are optional and degrade to
no-ops with a single warning when the package is missing.
"""
import logging
import typing as tp
from pathlib import Path

logger = logging.getLogger(__name__)


def _wav_bytes(wav, sample_rate: int) -> bytes:
    """[C, T] float32 in [-1, 1] -> 16-bit PCM WAV bytes."""
    import struct

    import numpy as np
    pcm = np.clip(np.asarray(wav, np.float32).T * (2 ** 15), -2 ** 15,
                  2 ** 15 - 1).round().astype("<i2")
    data = pcm.tobytes()
    channels = pcm.shape[1] if pcm.ndim > 1 else 1
    header = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
              + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                            sample_rate * channels * 2, channels * 2, 16)
              + b"data" + struct.pack("<I", len(data)))
    return header + data


class ExperimentWriters:
    """Scalar + audio writers for one experiment folder."""

    def __init__(self, cfg: dict, folder: Path):
        log_cfg = cfg.get("logging", {}) or {}
        self._tb = None
        self._wandb = None
        self.with_media = False
        if log_cfg.get("log_tensorboard"):
            tb_cfg = cfg.get("tensorboard", {}) or {}
            sub_dir = tb_cfg.get("sub_dir") or "tensorboard"
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(
                    logdir=str(Path(folder) / sub_dir),
                    comment=tb_cfg.get("name") or "")
                self.with_media = bool(tb_cfg.get("with_media_logging"))
                logger.info("TensorBoard logging to %s",
                            Path(folder) / sub_dir)
            except ImportError:
                logger.warning("log_tensorboard=true but tensorboardX is "
                               "not installed; disabling")
        if log_cfg.get("log_wandb"):
            wb_cfg = cfg.get("wandb", {}) or {}
            try:
                import wandb
                self._wandb = wandb.init(
                    project=wb_cfg.get("project"), name=wb_cfg.get("name"),
                    dir=str(folder), config=cfg, resume="allow")
                self.with_media = self.with_media or bool(
                    wb_cfg.get("with_media_logging"))
            except ImportError:
                logger.warning("log_wandb=true but wandb is not installed; "
                               "disabling")

    @property
    def active(self) -> bool:
        return self._tb is not None or self._wandb is not None

    def write_scalars(self, stage: str, metrics: tp.Dict[str, tp.Any],
                      step: int) -> None:
        """Flat scalar metrics under `<stage>/<name>` at `step` (epoch)."""
        if not self.active:
            return
        flat = {}
        for k, v in metrics.items():
            try:
                flat[f"{stage}/{k}"] = float(v)
            except (TypeError, ValueError):
                continue
        if self._tb is not None:
            for k, v in flat.items():
                self._tb.add_scalar(k, v, step)
            self._tb.flush()
        if self._wandb is not None:
            self._wandb.log(flat, step=step)

    def write_audio(self, tag: str, wav, sample_rate: int, step: int) -> None:
        """[C, T] float waveform as a media artifact (when enabled).

        tensorboardX's own add_audio requires soundfile (absent in this
        image), so the WAV bytes and Summary proto are built first-party."""
        if not self.with_media:
            return
        import numpy as np
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 1:
            wav = wav[None]
        if self._tb is not None:
            from tensorboardX.proto.summary_pb2 import Summary
            audio = Summary.Audio(
                sample_rate=float(sample_rate),
                num_channels=wav.shape[0],
                length_frames=wav.shape[-1],
                encoded_audio_string=_wav_bytes(wav, sample_rate),
                content_type="audio/wav")
            summary = Summary(value=[Summary.Value(tag=tag, audio=audio)])
            self._tb._get_file_writer().add_summary(summary, step)
            self._tb.flush()
        if self._wandb is not None:
            import wandb
            self._wandb.log(
                {tag: wandb.Audio(wav.T, sample_rate=sample_rate)}, step=step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
