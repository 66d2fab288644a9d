"""Models: composition + generation APIs (layer 4)."""
# flake8: noqa
from . import builders
from . import loaders
from .dac import DAC, DACModel
from .encodec import (CompressionModel, EncodecModel,
                      InterleaveStereoCompressionModel)
from .lm import LMModel, LMOutput, GenParams
from .genmodel import BaseGenModel
from .musicgen import MusicGen
from .audiogen import AudioGen
from .magnet import MAGNeT
from .jasco import JASCO
from .multibanddiffusion import MultiBandDiffusion
from .watermark import AudioSeal, AudioSealDetector, AudioSealWM, WMModel
from .lm_magnet import MagnetLMModel
from .flow_matching import FlowMatchingModel
from .unet import DiffusionUnet
