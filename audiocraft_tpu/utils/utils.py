"""Misc utilities: sampling, hashing, masks, collation.

Parity: `audiocraft/utils/utils.py:25-326`.
"""
import hashlib
import json
import typing as tp
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def model_hash(params) -> str:
    """xxh-like integrity hash over all parameters (`utils.py:25-32`)."""
    hasher = hashlib.sha1()
    for leaf in jax.tree_util.tree_leaves(params):
        hasher.update(np.asarray(leaf).tobytes())
    return hasher.hexdigest()


def dict_from_config(cfg) -> dict:
    """OmegaConf/dataclass-ish -> plain dict (`utils.py:34-44`)."""
    if isinstance(cfg, dict):
        return dict(cfg)
    if hasattr(cfg, "__dict__"):
        return dict(cfg.__dict__)
    raise TypeError(type(cfg))


def hash_trick(word: str, vocab_size: int) -> int:
    """Hash a word into a fixed vocab (`utils.py:190-200`)."""
    hash = int(hashlib.sha256(word.encode("utf-8")).hexdigest(), 16)
    return hash % vocab_size


def length_to_mask(lengths: np.ndarray, max_len: tp.Optional[int] = None) -> np.ndarray:
    """[B] lengths -> [B, max_len] binary mask (`utils.py:173-187`)."""
    lengths = np.asarray(lengths)
    assert lengths.ndim == 1
    final_length = int(lengths.max()) if max_len is None else max_len
    final_length = max(final_length, 1)  # if all seqs are of len zero we don't want a zero-size tensor
    return (np.arange(final_length)[None, :] < lengths[:, None]).astype(np.int32)


def multinomial(rng: jax.Array, probs: jax.Array) -> jax.Array:
    """Sample one index per row from a prob tensor [..., C] (`utils.py:49-65`)."""
    logits = jnp.log(jnp.maximum(probs, 1e-20))
    return jax.random.categorical(rng, logits, axis=-1)[..., None]


def sample_top_k(rng: jax.Array, probs: jax.Array, k: int) -> jax.Array:
    """Top-k sampling on probs [..., C] -> indices [..., 1] (`utils.py:68-82`).

    k is clamped to the vocabulary size: top-250 of a 48-card debug codec is
    exactly "all 48", not an error."""
    top_probs, top_idx = jax.lax.top_k(probs, min(k, probs.shape[-1]))
    inner = multinomial(rng, top_probs)  # [..., 1]
    return jnp.take_along_axis(top_idx, inner, axis=-1)


def sample_top_p(rng: jax.Array, probs: jax.Array, p: float) -> jax.Array:
    """Nucleus sampling on probs [..., C] -> indices [..., 1] (`utils.py:85-101`).

    Matches the reference: sort descending, zero out tokens once the
    cumulative mass *before renormalization* exceeds p (the first token is
    always kept since `cumsum - prob <= p` for it).
    """
    sorted_probs = jnp.sort(probs, axis=-1)[..., ::-1]
    sorted_idx = jnp.argsort(probs, axis=-1)[..., ::-1]
    cum = jnp.cumsum(sorted_probs, axis=-1)
    mask = (cum - sorted_probs) > p
    kept = jnp.where(mask, 0.0, sorted_probs)
    kept = kept / jnp.sum(kept, axis=-1, keepdims=True)
    inner = multinomial(rng, kept)
    return jnp.take_along_axis(sorted_idx, inner, axis=-1)


def sample_tokens(rng: jax.Array, logits: jax.Array, *, use_sampling: bool = True,
                  temp: float = 1.0, top_k: int = 0, top_p: float = 0.0) -> jax.Array:
    """Dispatch greedy / temp / top-k / top-p sampling on logits [..., C]
    (`models/lm.py:406-418`). Returns indices [..., 1]."""
    if use_sampling and temp > 0.0:
        probs = jax.nn.softmax(logits.astype(jnp.float32) / temp, axis=-1)
        if top_p > 0.0:
            return sample_top_p(rng, probs, p=top_p)
        elif top_k > 0:
            return sample_top_k(rng, probs, k=top_k)
        return multinomial(rng, probs)
    return jnp.argmax(logits, axis=-1)[..., None]


def collate(tensors: tp.List[np.ndarray], dim: int = 0) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Pad a list of arrays to the max length on `dim` and stack; return
    (stacked, lengths) (`utils.py:226-250`)."""
    tensors = [np.moveaxis(x, dim, 0) for x in tensors]
    lens = np.array([x.shape[0] for x in tensors], dtype=np.int64)
    max_len = int(lens.max()) if len(tensors) else 0
    out = []
    for x in tensors:
        pad = [(0, max_len - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        out.append(np.pad(x, pad))
    stacked = np.stack(out)
    stacked = np.moveaxis(stacked, 1, dim + 1) if dim != 0 else stacked
    return stacked, lens


def find_local_checkpoint(env_var: str, names: tp.Sequence[str]):
    """Locate a local model checkpoint in a zero-egress environment:
    $<env_var> first, then AUDIOCRAFT_CACHE_DIR/<name> in order. Shared by
    the VGGish / PaSST / CLAP availability probes so the search order stays
    consistent across metrics. Returns a Path or None."""
    import os
    from pathlib import Path
    cand = os.environ.get(env_var)
    if cand and Path(cand).exists():
        return Path(cand)
    cache = os.environ.get("AUDIOCRAFT_CACHE_DIR")
    if cache:
        for name in names:
            p = Path(cache) / name
            if p.exists():
                return p
    return None


@lru_cache(None)
def warn_once(logger, msg):
    logger.warning(msg)


def jsonable(x):
    """Best-effort conversion of metrics/config pytrees to JSON-safe types."""
    if isinstance(x, (str, int, float, bool)) or x is None:
        return x
    if isinstance(x, dict):
        return {k: jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [jsonable(v) for v in x]
    arr = np.asarray(x)
    if arr.ndim == 0:
        return arr.item()
    return arr.tolist()


def swap_state(params, new_params):
    """Return (new_params, old_params) — functional analogue of the
    reference's `swap_state` context manager (`utils.py:204-223`)."""
    return new_params, params


def construct_frame_chords(min_timestamp: int,
                           chord_changes: tp.List[tp.Tuple[float, str]],
                           mapping_dict: tp.Dict, prev_chord: str,
                           frame_rate: float, segment_duration: float
                           ) -> tp.List[int]:
    """Symbolic chords [(start_time, chord), ...] -> frame-level int sequence
    (`utils.py:300-326`)."""
    frames = [frame / frame_rate
              for frame in range(min_timestamp,
                                 int(min_timestamp + segment_duration * frame_rate))]
    frame_chords = []
    current_chord = prev_chord
    chord_changes = list(chord_changes)
    for frame in frames:
        while chord_changes and frame >= chord_changes[0][0]:
            current_chord = chord_changes.pop(0)[1]
        current_chord = "N" if current_chord in {None, ""} else current_chord
        frame_chords.append(mapping_dict[current_chord])
    return frame_chords
