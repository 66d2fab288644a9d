"""Training solvers (layer 6)."""
# flake8: noqa
from . import builders
from .base import StandardSolver
