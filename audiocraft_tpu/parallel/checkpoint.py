"""Multi-host sharded GSPMD checkpointing: each process persists only its
addressable shards (no cross-host gather), committed atomically via the
two-phase `.tmp.done` token protocol of `utils/checkpoint.py`
(ref `utils/checkpoint.py:125-161` — where the reference saves per-rank
torch-FSDP shard files; here the shards are the GSPMD `Array.addressable_
shards` of an arbitrary pytree, so the same code serves dp/fsdp/tp layouts).

Restore is gather-free too: every process reads its own rank file and
reassembles global arrays with `jax.make_array_from_callback`, which asks
only for the shard indices this process can address. Save and restore must
therefore run under the same mesh/sharding layout (elastic reshape is out of
scope, matching the reference).
"""
import logging
import typing as tp
from pathlib import Path

import jax
import numpy as np

from ..utils.checkpoint import checkpoint_name, load_flat, save_checkpoint

logger = logging.getLogger(__name__)


def _flat_with_keys(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = []
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                       for p in path)
        out.append((key, leaf))
    return out


def _norm_index(index: tp.Tuple[slice, ...], shape) -> tp.Tuple:
    return tuple((s.start or 0, s.stop if s.stop is not None else dim)
                 for s, dim in zip(index, shape))


def save_sharded(state, directory: tp.Union[str, Path],
                 name: tp.Optional[str] = None) -> Path:
    """Write this process's shards of `state` to
    `checkpoint[_name].th[.rank]` with the `.tmp.done` two-phase commit."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    flat: tp.Dict[str, np.ndarray] = {}
    for key, leaf in _flat_with_keys(state):
        if isinstance(leaf, jax.Array) and hasattr(leaf, "addressable_shards"):
            seen: tp.Dict[tp.Tuple, np.ndarray] = {}
            for shard in leaf.addressable_shards:
                idx = _norm_index(shard.index, leaf.shape)
                if idx not in seen:  # replicas across local devices dedupe
                    seen[idx] = np.asarray(shard.data)
            for j, (idx, data) in enumerate(sorted(seen.items())):
                flat[f"{key}::s{j}"] = data
                flat[f"{key}::i{j}"] = np.asarray(idx, np.int64)  # [ndim, 2]
        else:
            flat[key] = np.asarray(leaf)
    path = directory / checkpoint_name(name, use_fsdp=False)
    save_checkpoint(flat, path, is_sharded=True)
    return path


def restore_sharded(directory: tp.Union[str, Path], template, shardings,
                    name: tp.Optional[str] = None):
    """Reassemble a pytree saved by `save_sharded` under the same layout.

    `template` provides shapes/dtypes (e.g. the freshly-initialized state);
    `shardings` the target sharding pytree (same structure). Raises if the
    `.tmp.done` token is missing (incomplete shard set) or a needed shard
    index is absent (the mesh layout changed between save and restore)."""
    directory = Path(directory)
    rank0 = directory / checkpoint_name(name, rank=0, use_fsdp=False)
    token = rank0.parent / f"{rank0.name}.tmp.done"
    if not token.exists():
        raise RuntimeError(
            f"sharded checkpoint at {directory} has no {token.name} token: "
            "the shard set is incomplete or was never committed")
    flat = load_flat(directory / checkpoint_name(name, use_fsdp=False))

    leaves_t = _flat_with_keys(template)
    leaves_s = jax.tree_util.tree_leaves(shardings)
    treedef = jax.tree_util.tree_structure(template)
    assert len(leaves_t) == len(leaves_s), "template/shardings mismatch"
    out = []
    for (key, leaf), sharding in zip(leaves_t, leaves_s):
        if key in flat:  # unsharded host leaf
            out.append(flat[key])
            continue
        shards: tp.Dict[tp.Tuple, np.ndarray] = {}
        j = 0
        while f"{key}::i{j}" in flat:
            shards[tuple(map(tuple, flat[f"{key}::i{j}"]))] = flat[f"{key}::s{j}"]
            j += 1
        if not shards:
            raise RuntimeError(f"missing key in sharded checkpoint: {key}")
        shape = tuple(leaf.shape)

        def cb(index, _shards=shards, _shape=shape, _key=key):
            idx = _norm_index(index, _shape)
            if idx not in _shards:
                raise RuntimeError(
                    f"shard {idx} of {_key} not in this rank's file — "
                    "restore must use the save-time mesh layout")
            return _shards[idx]

        out.append(jax.make_array_from_callback(shape, sharding, cb))
    return jax.tree_util.tree_unflatten(treedef, out)
