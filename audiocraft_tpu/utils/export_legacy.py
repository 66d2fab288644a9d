"""Conversion of legacy-format *training* checkpoints into release packages
(`ref utils/export_legacy.py`).

First-release audiocraft training runs stored the model under
`pkg['ema']['state']['model']` (codecs) or `pkg['fsdp_best_state']['model']`
/ `pkg['best_state']['model']` (LMs), with an OmegaConf cfg missing the
`transformer_lm.card`/`n_q` keys and carrying since-removed experimental
params. These functions lift such packages into the standard exported layout
({'best_state', 'xp.cfg', 'exported': True}) that `models/loaders.py` /
`utils/torch_port.py` consume directly.
"""
import typing as tp
from pathlib import Path

from .. import __version__


def _to_plain(cfg) -> dict:
    """OmegaConf / dict -> plain nested dict."""
    if isinstance(cfg, dict):
        return {k: _to_plain(v) for k, v in cfg.items()}
    if hasattr(cfg, "keys"):  # omegaconf.DictConfig without importing it
        try:
            from omegaconf import OmegaConf
            return OmegaConf.to_container(cfg, resolve=True)  # type: ignore
        except Exception:
            return {k: _to_plain(cfg[k]) for k in cfg.keys()}
    if isinstance(cfg, (list, tuple)):
        return [_to_plain(v) for v in cfg]
    return cfg


def _clean_lm_cfg(cfg: dict) -> dict:
    """`ref export_legacy.py:20-39`: first-release LM cfgs lack card/n_q
    (they were set by the solver) and carry removed experimental params."""
    cfg = dict(cfg)
    tl = dict(cfg.get("transformer_lm", {}))
    tl["card"] = 2048
    n_q = 4
    stereo_cfg = dict(cfg.get("interleave_stereo_codebooks", {}) or {})
    if stereo_cfg.get("use"):
        stereo_cfg.pop("downsample", None)
        cfg["interleave_stereo_codebooks"] = stereo_cfg
        n_q = 8
    tl["n_q"] = n_q
    for name in ("spectral_norm_attn_iters", "spectral_norm_ff_iters",
                 "residual_balancer_attn", "residual_balancer_ff",
                 "layer_drop"):
        tl.pop(name, None)
    cfg["transformer_lm"] = tl
    return cfg


def _load_pkg(checkpoint_path: tp.Union[Path, str]) -> dict:
    import torch
    try:
        return torch.load(checkpoint_path, map_location="cpu",
                          weights_only=True)
    except Exception:
        # legacy training pkgs embed OmegaConf objects; only load files the
        # user deliberately pointed at (same trust model as torch_port)
        return torch.load(checkpoint_path, map_location="cpu",
                          weights_only=False)


def _save_pkg(state: dict, cfg: dict, out_file: tp.Union[Path, str]) -> Path:
    import torch
    out_file = Path(out_file)
    out_file.parent.mkdir(exist_ok=True, parents=True)
    torch.save({"best_state": state, "xp.cfg": cfg,
                "version": __version__, "exported": True}, out_file)
    return out_file


def export_encodec(checkpoint_path: tp.Union[Path, str],
                   out_file: tp.Union[Path, str]) -> Path:
    """Legacy codec training pkg -> release package
    (`ref export_legacy.py:41-53`): the model lives under the EMA state."""
    pkg = _load_pkg(checkpoint_path)
    return _save_pkg(pkg["ema"]["state"]["model"],
                     _to_plain(pkg["xp.cfg"]), out_file)


def export_lm(checkpoint_path: tp.Union[Path, str],
              out_file: tp.Union[Path, str]) -> Path:
    """Legacy LM training pkg -> release package
    (`ref export_legacy.py:56-71`): prefer the consolidated FSDP best state,
    then fix up the cfg for current builders."""
    pkg = _load_pkg(checkpoint_path)
    if pkg.get("fsdp_best_state"):
        best_state = pkg["fsdp_best_state"]["model"]
    else:
        best_state = pkg["best_state"]["model"]
    return _save_pkg(best_state, _clean_lm_cfg(_to_plain(pkg["xp.cfg"])),
                     out_file)
