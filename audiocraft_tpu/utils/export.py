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


def encodec_model_cfg(model) -> dict:
    """Reconstruct the builder cfg from a live EncodecModel so a re-export
    is loadable standalone (inverse of `models/builders.py` assembly)."""
    enc = model.encoder
    q = model.quantizer
    return {
        "compression_model": "encodec",
        "encodec": {
            "autoencoder": "seanet",
            "quantizer": "rvq",
            "sample_rate": model.sample_rate,
            "channels": model.channels,
            "causal": model.causal,
            "renormalize": model.renormalize,
            "seanet": {
                "dimension": enc.dimension,
                "channels": enc.channels,
                "n_filters": enc.n_filters,
                "n_residual_layers": enc.n_residual_layers,
                "ratios": list(enc.ratios),
                "norm": enc.norm,
                "kernel_size": enc.kernel_size,
                "residual_kernel_size": enc.residual_kernel_size,
                "last_kernel_size": enc.last_kernel_size,
                "dilation_base": enc.dilation_base,
                "causal": enc.causal,
                "pad_mode": enc.pad_mode,
                "true_skip": enc.true_skip,
                "compress": enc.compress,
                "lstm": enc.lstm,
            },
            "rvq": {
                "n_q": q.n_q,
                "bins": q.bins,
                "dimension": q.dimension,
                "decay": q.decay,
                "q_dropout": q.q_dropout,
                "kmeans_init": False,  # exported codebooks are trained
            },
        },
    }


def export_pretrained_compression_model(pretrained_name: str,
                                        out_file: tp.Union[Path, str]) -> Path:
    """Re-export an already-loadable pretrained codec into our standalone
    inference format (`export.py:79-96`)."""
    from ..models.encodec import CompressionModel
    model, variables = CompressionModel.get_pretrained(pretrained_name)
    return _export(variables, encodec_model_cfg(model), out_file)
