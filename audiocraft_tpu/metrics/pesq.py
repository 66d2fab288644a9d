"""PESQ metric (perceptual evaluation of speech quality).

Parity: `audiocraft/metrics/pesq.py:14-60`. The `pesq` C extension is not in
this image; the metric gates with a clear error unless it is importable.
"""
import logging
import typing as tp

import numpy as np

from ..ops.resample import resample_frac

logger = logging.getLogger(__name__)

try:
    import pesq as pesq_lib  # type: ignore
    _HAS_PESQ = True
except ImportError:
    pesq_lib = None
    _HAS_PESQ = False


class PesqMetric:
    """Average PESQ over batches (`pesq.py:14-60`)."""

    def __init__(self, sample_rate: int):
        self.sr = sample_rate
        self.pesq_sum = 0.0
        self.weight = 0.0
        if not _HAS_PESQ:
            logger.warning("pesq package not installed; PesqMetric disabled.")

    def update(self, preds: np.ndarray, targets: np.ndarray):
        if not _HAS_PESQ:
            raise RuntimeError("pesq package is not available in this image")
        import jax.numpy as jnp
        if self.sr != 16000:
            preds = np.asarray(resample_frac(jnp.asarray(preds), self.sr, 16000))
            targets = np.asarray(resample_frac(jnp.asarray(targets), self.sr, 16000))
        for ii in range(preds.shape[0]):
            try:
                self.pesq_sum += pesq_lib.pesq(
                    16000, np.asarray(targets[ii].reshape(-1)),
                    np.asarray(preds[ii].reshape(-1)))
                self.weight += 1
            except Exception:  # pesq raises on silent signals
                pass

    def compute(self) -> float:
        return self.pesq_sum / max(self.weight, 1.0)
