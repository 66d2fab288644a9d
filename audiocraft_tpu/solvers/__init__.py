"""Training solvers (layer 6)."""
# flake8: noqa
from . import builders
from .base import StandardSolver
from .builders import get_solver
from .audiogen import AudioGenSolver
from .compression import CompressionSolver
from .diffusion import DiffusionSolver
from .jasco import JascoSolver
from .magnet import AudioMagnetSolver, MagnetSolver
from .musicgen import MusicGenSolver
from .watermark import WatermarkSolver
