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
    (`loaders.py:78-109`). Accepts audiocraft exports (compression_state_dict
    / *.th) and HF EnCodec snapshot dirs (config.json + safetensors), the
    format MusicGen/AudioGen HF checkpoints ship their codec in."""
    path = _resolve(name)
    from ..utils import torch_port
    if path.is_dir() and (path / "config.json").exists():
        import json
        hf_cfg = json.loads((path / "config.json").read_text())
        if hf_cfg.get("model_type") == "encodec":
            return torch_port.load_hf_encodec_from_dir(path)
    return torch_port.load_compression_model_from_dir(path)


def load_lm_model(name: str):
    """Load (LMModel, params, cfg) from a local path (`loaders.py:111-127`)."""
    path = _resolve(name)
    from ..utils import torch_port
    return torch_port.load_lm_model_from_dir(path)


def load_lm_model_magnet(name: str, compression_model_frame_rate: int = 50):
    """MAGNeT LM loading (`loaders.py:129-156`): same package format with
    MAGNeT-specific cfg fixups (span masking / compression-model frame rate
    are runtime params, not weights)."""
    path = _resolve(name)
    from ..utils import torch_port
    model, params, cfg = torch_port.load_lm_model_from_dir(path)
    cfg.setdefault("masking", {})["span_len"] = cfg.get(
        "masking", {}).get("span_len", 3)
    cfg["compression_model_framerate"] = compression_model_frame_rate
    return model, params, cfg


def load_diffusion_models(name: str):
    """Load the multi-band diffusion bundle (`loaders.py:181-204`): one UNet
    per band + processors. Supports our orbax/npz exports; torch-weight
    conversion of the MBD UNets is not implemented yet."""
    path = _resolve(name)
    if path.suffix == ".npz" or (path / "mbd.npz").exists():
        from ..utils.export import load_exported
        raise NotImplementedError(
            "npz MBD bundles: restore per-band params with "
            "utils.checkpoint.restore_pytree and build via "
            "models.multibanddiffusion.MultiBandDiffusion")
    raise NotImplementedError(
        f"torch MBD checkpoint conversion is not implemented; re-export "
        f"{name} with utils.export or train with solver=diffusion")


def load_audioseal_models(name: str):
    """Load AudioSeal generator+detector (`loaders.py:206-237`). Checkpoints
    trained with solver=watermarking restore through utils.checkpoint; the
    external `audioseal` package's torch weights are not converted yet."""
    path = _resolve(name)
    raise NotImplementedError(
        f"audioseal torch checkpoint conversion is not implemented; restore "
        f"{name} from a watermarking-solver checkpoint via "
        f"utils.checkpoint.restore_pytree")


def load_jasco_model(name: str, chords_mapping_path=None):
    """Load a JASCO flow-matching model (`loaders.py:158-179`)."""
    path = _resolve(name)
    raise NotImplementedError(
        f"JASCO torch checkpoint conversion is not implemented; restore "
        f"{name} from a jasco-solver checkpoint via utils.checkpoint")
