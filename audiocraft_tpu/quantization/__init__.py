"""Quantization (layer 3): RVQ with EMA k-means codebooks."""
# flake8: noqa
from .base import BaseQuantizer, DummyQuantizer, QuantizedResult
from .core_vq import (CodebookState, RVQState, init_codebook, init_rvq,
                      quantize_codes, dequantize, rvq_encode, rvq_decode,
                      rvq_forward, ema_codebook_update, kmeans)
from .vq import ResidualVectorQuantizer
