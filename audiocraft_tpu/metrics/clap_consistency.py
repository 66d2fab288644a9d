"""CLAP text-audio consistency metric.

Parity: `audiocraft/metrics/clap_consistency.py:18-80`. The CLAP checkpoint is
not available in this zero-egress image: provide `embed_audio_fn` /
`embed_text_fn` callables to enable it.
"""
import logging
import typing as tp

import numpy as np

logger = logging.getLogger(__name__)


class TextConsistencyMetric:
    """Base text-consistency metric (`clap_consistency.py:18-33`)."""

    def update(self, audio: np.ndarray, text: tp.List[str], sizes, sample_rates):
        raise NotImplementedError()

    def compute(self) -> float:
        raise NotImplementedError()


class CLAPTextConsistencyMetric(TextConsistencyMetric):
    """Cosine similarity between CLAP audio/text embeddings
    (`clap_consistency.py:36-80`)."""

    def __init__(self, model_path: tp.Optional[str] = None,
                 model_arch: str = "HTSAT-tiny", enable_fusion: bool = False,
                 embed_audio_fn: tp.Optional[tp.Callable] = None,
                 embed_text_fn: tp.Optional[tp.Callable] = None):
        assert not enable_fusion, "fusion CLAP variants are not supported"
        if embed_audio_fn is None:
            embed_audio_fn, embed_text_fn = \
                self._probe_native_embedders(model_path)
        self.embed_audio_fn = embed_audio_fn
        self.embed_text_fn = embed_text_fn
        self.cosine_sum = 0.0
        self.weight = 0.0
        if embed_audio_fn is None:
            logger.warning(
                "No local CLAP checkpoint (set CLAP_CHECKPOINT or drop "
                "clap.pt in AUDIOCRAFT_CACHE_DIR); pass embed_audio_fn/"
                "embed_text_fn to enable the metric.")

    @staticmethod
    def _probe_native_embedders(model_path: tp.Optional[str]
                                ) -> tp.Tuple[tp.Optional[tp.Callable],
                                              tp.Optional[tp.Callable]]:
        """Build the native CLAP embedders from a local checkpoint, if any
        (`modules/clap.py` — the JAX HTSAT + text-tower port)."""
        from pathlib import Path
        from ..modules.clap import CLAPEmbedder, find_clap_checkpoint
        ckpt = Path(model_path) if model_path and Path(model_path).exists() \
            else find_clap_checkpoint()
        if ckpt is None:
            return None, None
        logger.info("CLAP text consistency using checkpoint %s", ckpt)
        emb = CLAPEmbedder.from_checkpoint(ckpt)
        if emb.tokenizer is None:
            # Text consistency needs both towers: without the RoBERTa
            # tokenizer files the first update() would raise mid-evaluate;
            # report unavailable so the solver skips the metric up front.
            logger.warning(
                "CLAP checkpoint %s found but no RoBERTa tokenizer files "
                "(vocab.json + merges.txt) nearby; text consistency "
                "disabled.", ckpt)
            return None, None
        return emb.embed_audio, emb.embed_text

    def update(self, audio: np.ndarray, text: tp.List[str], sizes, sample_rates):
        if self.embed_audio_fn is None or self.embed_text_fn is None:
            raise RuntimeError(
                "CLAPTextConsistencyMetric requires local CLAP embeddings; "
                "pass embed_audio_fn/embed_text_fn.")
        sr = int(np.asarray(sample_rates).reshape(-1)[0])
        a = np.asarray(self.embed_audio_fn(np.asarray(audio), sr))
        t = np.asarray(self.embed_text_fn(list(text)))
        cos = np.sum(a * t, axis=-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(t, axis=-1) + 1e-8)
        self.cosine_sum += float(cos.sum())
        self.weight += len(text)

    def compute(self) -> float:
        assert self.weight > 0
        return self.cosine_sum / self.weight
