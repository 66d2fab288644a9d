"""Models: composition + generation APIs (layer 4)."""
# flake8: noqa
from . import builders
from .encodec import (CompressionModel, EncodecModel,
                      InterleaveStereoCompressionModel)
from .lm import LMModel, LMOutput, GenParams
from .genmodel import BaseGenModel
from .musicgen import MusicGen
from .audiogen import AudioGen
