"""Configuration system: YAML group configs + dotted overrides + experiment
signatures.

Replaces the reference's Hydra/OmegaConf/Dora stack (`config/` tree +
`docs/TRAINING.md:206-261`): configs are nested dicts loaded from YAML files
under `configs/`, composed via a `defaults` list, overridden with
`key.subkey=value` strings, and hashed into a stable experiment signature
(Dora's "sig") computed from the delta against the defaults.
"""
import hashlib
import json
import typing as tp
from pathlib import Path

import yaml

CONFIG_ROOT = Path(__file__).parent.parent / "configs"


def _deep_update(base: dict, update: dict) -> dict:
    for k, v in update.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v
    return base


def load_yaml(path: tp.Union[str, Path]) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def load_config(name: str, root: tp.Optional[Path] = None) -> dict:
    """Load `configs/<name>.yaml`, recursively composing its `defaults` list
    (later entries and the file itself override earlier ones). Relative
    defaults resolve against the config's own directory first, then the
    configs root."""
    root = root or CONFIG_ROOT
    path = (root / f"{name}.yaml").resolve()
    raw = load_yaml(path)
    defaults = raw.pop("defaults", [])
    cfg: dict = {}
    for dep in defaults:
        if dep == "_self_":
            _deep_update(cfg, raw)
            raw = {}
            continue
        local = (path.parent / f"{dep}.yaml").resolve()
        if local.exists():
            dep_name = str(local.relative_to(Path(root).resolve()))[:-5]
            _deep_update(cfg, load_config(dep_name, root))
        else:
            _deep_update(cfg, load_config(dep, root))
    _deep_update(cfg, raw)
    return cfg


def parse_value(s: str):
    try:
        return json.loads(s)
    except Exception:
        if s == "null":
            return None
        return s


def apply_overrides(cfg: dict, overrides: tp.Sequence[str]) -> dict:
    """Apply `a.b.c=value` overrides in place; returns the override delta."""
    delta: dict = {}
    for ov in overrides:
        assert "=" in ov, f"override must be key=value, got {ov!r}"
        key, value = ov.split("=", 1)
        value = parse_value(value)
        node = cfg
        dnode = delta
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            dnode = dnode.setdefault(p, {})
        node[parts[-1]] = value
        dnode[parts[-1]] = value
    return delta


# keys that do not affect the experiment identity (`config/config.yaml:61-70`)
EXCLUDE_FROM_SIG = ("device", "wandb", "tensorboard", "logging", "slurm",
                    "dora", "num_workers")


def signature(delta: dict, length: int = 8) -> str:
    """Stable experiment signature from the config delta (Dora-sig
    equivalent, `docs/TRAINING.md:249-261`)."""
    clean = {k: v for k, v in delta.items() if k not in EXCLUDE_FROM_SIG}
    blob = json.dumps(clean, sort_keys=True, separators=(",", ":"))
    return hashlib.sha1(blob.encode()).hexdigest()[:length]


class XP:
    """An experiment: composed config + override delta + signature + folder
    (Dora XP equivalent)."""

    def __init__(self, cfg: dict, delta: dict, root: tp.Optional[Path] = None):
        self.cfg = cfg
        self.delta = delta
        self.sig = signature(delta)
        from .environment import AudioCraftEnvironment
        base = root or AudioCraftEnvironment.get_dora_dir()
        self.folder = Path(base) / "xps" / self.sig

    @classmethod
    def from_solver(cls, solver_name: str, overrides: tp.Sequence[str] = ()):
        cfg = load_config(f"solver/{solver_name}")
        delta = apply_overrides(cfg, overrides)
        delta["solver"] = solver_name
        return cls(cfg, delta)
