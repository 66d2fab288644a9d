"""Chroma cosine similarity between reference and generated audio.

Parity: `audiocraft/metrics/chroma_cosinesim.py:14-72`.
"""
import jax.numpy as jnp
import numpy as np

from ..data.audio_utils import convert_audio
from ..modules.chroma import ChromaExtractor


class ChromaCosineSimilarityMetric:
    """Cosine similarity between chromas of two waveforms
    (`chroma_cosinesim.py:14-72`)."""

    def __init__(self, sample_rate: int, n_chroma: int, radix2_exp: int,
                 argmax: bool, eps: float = 1e-8):
        self.chroma_sample_rate = sample_rate
        self.n_chroma = n_chroma
        self.eps = eps
        self.extractor = ChromaExtractor(sample_rate=self.chroma_sample_rate,
                                         n_chroma=self.n_chroma,
                                         radix2_exp=radix2_exp, argmax=argmax)
        self.cosine_sum = 0.0
        self.weight = 0.0

    def update(self, preds, targets, sizes, sample_rates):
        """Accumulate cosine similarity (`chroma_cosinesim.py:38-60`)."""
        if preds.shape[-1] == 0:
            return
        assert preds.shape == targets.shape
        sr = int(np.asarray(sample_rates).reshape(-1)[0])
        preds = convert_audio(preds, sr, self.chroma_sample_rate, 1)
        targets = convert_audio(targets, sr, self.chroma_sample_rate, 1)
        gt_chroma = self.extractor(jnp.asarray(targets))
        gen_chroma = self.extractor(jnp.asarray(preds))
        chroma_lens = np.ceil(np.asarray(sizes).reshape(-1)
                              * self.chroma_sample_rate
                              / np.asarray(sample_rates).reshape(-1)
                              / self.extractor.winhop)
        for i in range(gt_chroma.shape[0]):
            L = int(chroma_lens[i])
            a, b = np.asarray(gt_chroma[i, :L]), np.asarray(gen_chroma[i, :L])
            cos = np.sum(a * b, axis=1) / (
                np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + self.eps)
            self.cosine_sum += float(cos.sum())
            self.weight += L

    def compute(self) -> float:
        """`chroma_cosinesim.py:62-72`."""
        assert self.weight > 0, "Unable to compute with total number of comparisons <= 0"
        return self.cosine_sum / self.weight
