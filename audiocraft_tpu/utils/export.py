"""Export training checkpoints into the standalone inference format.

Parity: `audiocraft/utils/export.py:20-96` — exported packages hold
`{'best_state', 'xp.cfg', 'version', 'exported'}` so inference loads without
the experiment manager.
"""
import json
import logging
import typing as tp
from pathlib import Path

import numpy as np

from .. import __version__
from .checkpoint import _flatten, load_flat

logger = logging.getLogger(__name__)


def _export(state, cfg: dict, out_file: tp.Union[Path, str]) -> Path:
    out_file = Path(out_file)
    out_file.parent.mkdir(exist_ok=True, parents=True)
    flat = _flatten(state)
    meta = json.dumps({"xp.cfg": cfg, "version": __version__, "exported": True})
    with open(out_file, "wb") as f:
        np.savez(f, __meta__=np.frombuffer(meta.encode(), np.uint8), **flat)
    return out_file


def load_exported(path: tp.Union[Path, str]) -> tp.Tuple[tp.Dict[str, np.ndarray], dict]:
    """Return (flat best_state, cfg dict)."""
    flat = load_flat(Path(path))
    meta_arr = flat.pop("__meta__")
    meta = json.loads(bytes(meta_arr.tobytes()).decode())
    assert meta.get("exported"), "not an exported inference checkpoint"
    return flat, meta["xp.cfg"]


def export_lm(params, cfg: dict, out_file: tp.Union[Path, str]) -> Path:
    """Export an LM for inference (`export.py:20-49`)."""
    return _export(params, cfg, out_file)


def export_encodec(variables, cfg: dict, out_file: tp.Union[Path, str]) -> Path:
    """Export a compression model for inference (`export.py:52-76`)."""
    return _export(variables, cfg, out_file)


def export_pretrained_compression_model(pretrained_name: str,
                                        out_file: tp.Union[Path, str]):
    """Re-export an already-loadable pretrained codec (`export.py:79-96`)."""
    from ..models.encodec import CompressionModel
    model, variables = CompressionModel.get_pretrained(pretrained_name)
    raise NotImplementedError("Serialize via export_encodec with the model cfg")
