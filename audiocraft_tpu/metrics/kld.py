"""KL-divergence metric over classifier label distributions.

Parity: `audiocraft/metrics/kld.py:20-180` — `KLDivergenceMetric` base with a
pluggable classifier; `PasstKLDivergenceMetric` requires the PaSST classifier
(gated: its pretrained weights are unavailable in this zero-egress image).
"""
import logging
import typing as tp

import numpy as np

logger = logging.getLogger(__name__)


class KLDivergenceMetric:
    """Base KLD metric (`kld.py:20-114`): accumulate per-sample
    KL(p_target || p_pred) over classifier probabilities."""

    def __init__(self):
        self.kld_pq_sum = 0.0
        self.kld_qp_sum = 0.0
        self.weight = 0.0

    def _get_label_distribution(self, x: np.ndarray, sizes, sample_rates
                                ) -> tp.Optional[np.ndarray]:
        """Return [B, n_classes] probabilities; implemented by subclasses."""
        raise NotImplementedError()

    @staticmethod
    def _kl_divergence(pred_probs: np.ndarray, target_probs: np.ndarray,
                       epsilon: float = 1e-6) -> tp.Tuple[float, float]:
        kl_pq = np.sum(target_probs * (np.log(target_probs + epsilon)
                                       - np.log(pred_probs + epsilon)), axis=-1)
        kl_qp = np.sum(pred_probs * (np.log(pred_probs + epsilon)
                                     - np.log(target_probs + epsilon)), axis=-1)
        return float(kl_pq.sum()), float(kl_qp.sum())

    def update(self, preds: np.ndarray, targets: np.ndarray, sizes,
               sample_rates):
        """`kld.py:75-98`."""
        assert preds.shape == targets.shape
        assert preds.shape[0] > 0, "Cannot update the loss with empty tensors"
        preds_probs = self._get_label_distribution(preds, sizes, sample_rates)
        targets_probs = self._get_label_distribution(targets, sizes, sample_rates)
        if preds_probs is not None and targets_probs is not None:
            kl_pq, kl_qp = self._kl_divergence(preds_probs, targets_probs)
            self.kld_pq_sum += kl_pq
            self.kld_qp_sum += kl_qp
            self.weight += preds.shape[0]

    def compute(self) -> dict:
        """`kld.py:100-114`."""
        weight = self.weight
        assert weight > 0, "Unable to compute with total number of comparisons <= 0"
        kld_pq = self.kld_pq_sum / weight
        kld_qp = self.kld_qp_sum / weight
        return {"kld": kld_pq, "kld_pq": kld_pq, "kld_qp": kld_qp,
                "kld_both": kld_pq + kld_qp}


class PasstKLDivergenceMetric(KLDivergenceMetric):
    """PaSST-classifier KLD (`kld.py:116-180`).

    Uses the native JAX PaSST port (`metrics/passt.py`) when a local
    checkpoint is available ($PASST_CHECKPOINT or the cache dir — the
    weights cannot be downloaded in a zero-egress environment), else accepts
    an explicit `classifier_fn(wav [B, C, T], sr) -> [B, 527]`.
    """

    def __init__(self, pretrained_length: tp.Optional[float] = None,
                 classifier_fn: tp.Optional[tp.Callable] = None):
        super().__init__()
        self.pretrained_length = pretrained_length
        if classifier_fn is None:
            classifier_fn = self._probe_native_classifier(pretrained_length)
        self.classifier_fn = classifier_fn
        if classifier_fn is None:
            logger.warning(
                "No local PaSST checkpoint (set PASST_CHECKPOINT or drop "
                "passt.pt in AUDIOCRAFT_CACHE_DIR); pass classifier_fn to "
                "enable PasstKLDivergenceMetric.")

    @staticmethod
    def _probe_native_classifier(pretrained_length: tp.Optional[float]
                                 ) -> tp.Optional[tp.Callable]:
        """Build the native PaSST classifier from a local checkpoint, if any
        (mirrors `ref kld.py:146-171` model selection by pretrained length)."""
        from .passt import (PasstClassifier, find_passt_checkpoint,
                            load_passt_params)
        ckpt = find_passt_checkpoint()
        if ckpt is None:
            return None
        max_duration = pretrained_length if pretrained_length in (20, 30) \
            else 10.0
        logger.info("KLD using native PaSST classifier from %s", ckpt)
        return PasstClassifier(load_passt_params(ckpt),
                               max_duration=float(max_duration))

    def _get_label_distribution(self, x, sizes, sample_rates):
        if self.classifier_fn is None:
            raise RuntimeError(
                "PasstKLDivergenceMetric requires a local PaSST classifier; "
                "pass classifier_fn=... (no network egress available).")
        sr = int(np.asarray(sample_rates).reshape(-1)[0])
        x = np.asarray(x)
        if sizes is None:
            return np.asarray(self.classifier_fn(x, sr))
        # Crop each item to its valid length before classification
        # (`ref kld.py:139-145`): the zero-padded tail of a short clip would
        # otherwise contribute silence probability mass to both p and q.
        sizes = np.asarray(sizes).reshape(-1).astype(int)
        out = []
        for i in range(x.shape[0]):
            T = int(np.clip(sizes[i], 1, x.shape[-1]))
            out.append(np.asarray(
                self.classifier_fn(x[i:i + 1, :, :T], sr))[0])
        return np.stack(out)
