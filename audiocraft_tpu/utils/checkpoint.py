"""Checkpoint naming, atomic saves, source resolution, stale flush.

Parity: `audiocraft/utils/checkpoint.py:28-161`. Pytrees are saved as .npz
(flattened path->array) with the reference's atomic write_and_rename
protocol; multi-host sharded saves use per-rank files + a `.tmp.done` token
two-phase commit exactly like the reference's FSDP shards.
"""
import logging
import os
import re
import typing as tp
from enum import Enum
from pathlib import Path

import jax
import numpy as np

from ..environment import AudioCraftEnvironment

logger = logging.getLogger(__name__)


class CheckpointSource(Enum):
    CURRENT_XP = "current_xp"
    PRETRAINED = "pretrained"
    OTHER = "other"


def checkpoint_name(name: tp.Optional[str] = None, rank: tp.Optional[int] = None,
                    use_fsdp: bool = False) -> str:
    """`checkpoint_<name>.th(.rank)` naming (`checkpoint.py:28-48`)."""
    suffix = ""
    if rank is None:
        rank = jax.process_index()
    if rank > 0 or use_fsdp:
        suffix = f".{rank}"
    name_part = ""
    if name is not None:
        name_part = f"_{name}"
    return f"checkpoint{name_part}.th{suffix}"


def is_sharded_checkpoint(path: Path) -> bool:
    return re.search(r"\.th\.\d+$", path.name) is not None


def resolve_checkpoint_path(sig_or_path: tp.Union[Path, str],
                            name: tp.Optional[str] = None,
                            use_fsdp: bool = False) -> tp.Optional[Path]:
    """Resolve `//sig/<xp_sig>` or a path to a checkpoint file
    (`checkpoint.py:56-84`)."""
    path = AudioCraftEnvironment.resolve_reference_path(sig_or_path)
    sig_or_path = str(path)
    if sig_or_path.startswith("//sig/"):
        sig = sig_or_path[len("//sig/"):]
        path = AudioCraftEnvironment.get_dora_dir() / "xps" / sig
    else:
        path = Path(sig_or_path)
    if path.is_dir():
        path = path / checkpoint_name(name, use_fsdp=use_fsdp)
    if path.exists():
        return path
    return None


def _flatten(tree, prefix=""):
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_pytree(path: Path, tree, treedef_holder: tp.Optional[tp.Any] = None):
    """Atomic write_and_rename (`checkpoint.py:98-104`) of a pytree as npz."""
    flat = _flatten(tree)
    tmp_path = str(path) + ".tmp"
    with open(tmp_path, "wb") as f:
        np.savez(f, **flat)
    os.rename(tmp_path, path)


def load_flat(path: Path) -> tp.Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as data:
        return {k: data[k] for k in data.files}


def unflatten_like(template, flat: tp.Dict[str, "np.ndarray"]):
    """Arrange a flat {'a/b/c': array} dict into `template`'s structure
    (shapes must match)."""
    paths_and_leaves = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)
    leaves = []
    for p, leaf in paths_and_leaves:
        key = "/".join(str(getattr(q, "key", getattr(q, "name", q))) for q in p)
        assert key in flat, f"missing key in checkpoint: {key}"
        arr = flat[key]
        assert arr.shape == tuple(getattr(leaf, "shape", ())), (key, arr.shape)
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def restore_pytree(path: Path, template):
    """Load an npz into the structure of `template` (shapes must match)."""
    return unflatten_like(template, load_flat(path))


def save_checkpoint(state, path: tp.Union[Path, str], is_sharded: bool = False):
    """Save with the two-phase `.tmp.done` protocol for sharded saves
    (`checkpoint.py:125-161`): rank 0 removes the stale token, ALL ranks
    synchronize, every rank writes its shard, ALL ranks synchronize again,
    and only then does rank 0 publish the fresh token. A reader that sees
    the token is thus guaranteed a complete, consistent shard set."""
    from ..parallel import distrib
    path = Path(path)
    if is_sharded:
        path_rank0 = path.parent / checkpoint_name(
            re.sub(r"^checkpoint_?|\.th.*$", "", path.name) or None, rank=0,
            use_fsdp=False)
        tmp_done = path_rank0.parent / f"{path_rank0.name}.tmp.done"
        if jax.process_index() == 0 and tmp_done.exists():
            tmp_done.unlink()
        distrib.barrier("ckpt-token-removed")
    save_pytree(path, state)
    if is_sharded:
        distrib.barrier("ckpt-shards-written")
        if jax.process_index() == 0:
            tmp_done = path.parent / f"{path.name}.tmp.done"
            tmp_done.touch()


def flush_stale_checkpoints(checkpoint_path: Path, keep_last: int = 0):
    """Keep only the most recent epoch-suffixed checkpoints
    (`checkpoint.py:104-122`)."""
    if keep_last <= 0:
        return
    checkpoint_dir = checkpoint_path.parent
    suffix = ""
    if jax.process_index() > 0:
        suffix = f".{jax.process_index()}"
    checkpoint_files_with_epoch = []
    for path in Path(checkpoint_dir).glob(f"checkpoint_*.th{suffix}"):
        epoch_part = path.name.split(".", 1)[0].split("_", 1)[1]
        if epoch_part.isdigit():
            checkpoint_files_with_epoch.append((path, int(epoch_part)))
    checkpoint_files = [
        path for path, _ in sorted(checkpoint_files_with_epoch,
                                   key=lambda t: t[1])]
    total = len(checkpoint_files)
    for path in checkpoint_files[:max(0, total - keep_last)]:
        logger.debug("Removing checkpoint: %s", str(path))
        path.unlink(missing_ok=True)
