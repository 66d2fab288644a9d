"""Evaluation metrics (layer 5)."""
# flake8: noqa
from .chroma_cosinesim import ChromaCosineSimilarityMetric
from .fad import FrechetAudioDistanceMetric, frechet_distance
from .kld import KLDivergenceMetric, PasstKLDivergenceMetric
from .clap_consistency import CLAPTextConsistencyMetric, TextConsistencyMetric
from .rvm import RelativeVolumeMel
from .miou import calculate_miou
from .pesq import PesqMetric
from .visqol import ViSQOL
