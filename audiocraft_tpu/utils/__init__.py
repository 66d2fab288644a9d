"""Utilities: sampling, caching, checkpointing, export, effects, profiling."""
# flake8: noqa
from . import utils
