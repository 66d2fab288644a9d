"""Checkpoint loading: exported AC checkpoints, HF hub dirs, torch conversion.

Parity: `audiocraft/models/loaders.py:40-268`. In a zero-egress environment
checkpoints must already be on disk: either our native orbax/npz exports or a
local HF snapshot (torch .bin/.safetensors) that gets converted through
`utils/torch_port.py`. `AUDIOCRAFT_CACHE_DIR` controls the default cache
location (`loaders.py:36`).
"""
import logging
import os
import typing as tp
from pathlib import Path

logger = logging.getLogger(__name__)


def get_audiocraft_cache_dir() -> tp.Optional[str]:
    return os.environ.get("AUDIOCRAFT_CACHE_DIR", None)


def _resolve(name: str) -> Path:
    cache = get_audiocraft_cache_dir()
    p = Path(name)
    if p.exists():
        return p
    if cache is not None and (Path(cache) / name).exists():
        return Path(cache) / name
    raise FileNotFoundError(
        f"Checkpoint {name!r} not found locally. This environment has no "
        f"network egress; place an exported checkpoint or HF snapshot under "
        f"AUDIOCRAFT_CACHE_DIR and retry.")


def load_compression_model(name: str):
    """Load a compression model + variables from a local path
    (`loaders.py:78-109`)."""
    path = _resolve(name)
    from ..utils import torch_port
    return torch_port.load_compression_model_from_dir(path)


def load_lm_model(name: str):
    """Load (LMModel, params, cfg) from a local path (`loaders.py:111-127`)."""
    path = _resolve(name)
    from ..utils import torch_port
    return torch_port.load_lm_model_from_dir(path)
