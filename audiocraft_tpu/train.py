"""Training entry point.

Parity: `audiocraft/train.py:38-163` — config composition + overrides,
seed/system init, batch-size division across hosts, solver dispatch, and the
solver-from-signature helpers for notebooks.

Usage:
    python -m audiocraft_tpu.train solver=musicgen dataset.batch_size=8 ...
"""
import argparse
import logging
import os
import sys
import typing as tp
from pathlib import Path

import numpy as np

from .config import XP, apply_overrides, load_config
from .environment import AudioCraftEnvironment
from .parallel import distrib

logger = logging.getLogger(__name__)


def get_solver(cfg: dict):
    """Divide global batch size by world size, build the solver
    (`train.py:38-49`)."""
    from .solvers import builders
    if "dataset" in cfg and "batch_size" in cfg.get("dataset", {}):
        assert cfg["dataset"]["batch_size"] % distrib.world_size() == 0, \
            (f"Batch size must be divisible by number of hosts, "
             f"got {cfg['dataset']['batch_size']} and {distrib.world_size()}")
        cfg["dataset"]["batch_size"] //= distrib.world_size()
        for split in ["train", "valid", "evaluate", "generate"]:
            if split in cfg["dataset"] and isinstance(cfg["dataset"][split], dict):
                ns = cfg["dataset"][split].get("num_samples")
                if ns is not None:
                    assert ns % distrib.world_size() == 0
                    cfg["dataset"][split]["num_samples"] = ns // distrib.world_size()
    return builders.get_solver(cfg)


def get_solver_from_xp(xp: XP, override_cfg: tp.Optional[dict] = None,
                       restore: bool = True, load_best: bool = True,
                       ignore_state_keys: tp.List[str] = [],
                       disable_fsdp: bool = True):
    """Solver from a signed experiment for notebooks (`train.py:52-88`)."""
    logger.info(f"Loading solver from XP {xp.sig}. Overrides used: {xp.delta}")
    cfg = dict(xp.cfg)
    if override_cfg is not None:
        from .config import _deep_update
        _deep_update(cfg, override_cfg)
    cfg["folder"] = str(xp.folder)
    solver = get_solver(cfg)
    if restore:
        solver.restore()
    return solver


def get_solver_from_sig(sig: str, *args, **kwargs):
    """Solver from an XP signature (`train.py:91-102`)."""
    base = AudioCraftEnvironment.get_dora_dir() / "xps" / sig
    import json
    cfg = json.loads((base / "config.json").read_text()) \
        if (base / "config.json").exists() else {}
    xp = XP(cfg, {"sig": sig})
    xp.folder = base
    return get_solver_from_xp(xp, *args, **kwargs)


def init_seed_and_system(cfg: dict):
    """Seeds + system init (`train.py:105-127`)."""
    import random
    seed = cfg.get("seed", 2036)
    random.seed(seed)
    np.random.seed(seed)
    logger.info("Setting seed %d", seed)
    # Honor `device=cpu` (the reference's `cfg.device`, `train.py:119`): pin the
    # jax platform before any computation runs. Must use jax_platform_name —
    # some TPU plugins (e.g. tunneled ones) register regardless of
    # JAX_PLATFORMS, and tiny debug runs dispatched over the tunnel stall for
    # minutes. A no-op when devices were already initialized by the caller.
    device = cfg.get("device", "tpu")
    import jax
    if device and device not in ("tpu", "cuda"):
        try:
            jax.config.update("jax_platform_name", device)
        except Exception as e:
            logger.warning("could not pin platform %r: %s", device, e)
    cache_dir = cfg.get("compile_cache_dir") or os.environ.get(
        "AUDIOCRAFT_COMPILE_CACHE", str(Path.home() / ".cache/audiocraft_tpu/xla"))
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        logger.warning("compile cache disabled: %s", e)


def main(argv: tp.Optional[tp.List[str]] = None):
    """`train.py:130-163`."""
    parser = argparse.ArgumentParser(prog="audiocraft_tpu.train")
    parser.add_argument("overrides", nargs="*",
                        help="config overrides like solver=musicgen a.b=c")
    parser.add_argument("--run_stage", default=None,
                        help="run a single stage (train/valid/evaluate/generate)")
    args = parser.parse_args(argv)

    overrides = list(args.overrides)
    solver_name = None
    groups = []  # hydra-style group overrides, e.g. dset=audio/example
    rest = []
    from .config import CONFIG_ROOT, _deep_update
    for ov in overrides:
        if ov.startswith("solver="):
            solver_name = ov.split("=", 1)[1]
            continue
        key, _, value = ov.partition("=")
        if ("." not in key and isinstance(value, str)
                and (CONFIG_ROOT / key / f"{value}.yaml").exists()):
            groups.append((key, value))
        else:
            rest.append(ov)
    assert solver_name is not None, "pass solver=<name>"

    cfg = load_config(f"solver/{solver_name}")
    delta: tp.Dict[str, tp.Any] = {}
    for group, name in groups:  # `dset=audio/example` composes the group yaml
        _deep_update(cfg, load_config(f"{group}/{name}"))
        delta[group] = name
    delta.update(apply_overrides(cfg, rest))
    delta["solver"] = solver_name
    xp = XP(cfg, delta)
    xp.folder.mkdir(parents=True, exist_ok=True)
    cfg["folder"] = str(xp.folder)

    logging.basicConfig(level=cfg.get("logging", {}).get("level", "INFO"),
                        format=f"[%(levelname)s %(name)s] %(message)s")
    logger.info("XP signature: %s folder: %s", xp.sig, xp.folder)
    init_seed_and_system(cfg)
    distrib.init()

    import json
    (xp.folder / "config.json").write_text(json.dumps(cfg, default=str))

    solver = get_solver(cfg)
    if args.run_stage:
        return solver.run_one_stage(args.run_stage)
    return solver.run()


if __name__ == "__main__":
    main()
