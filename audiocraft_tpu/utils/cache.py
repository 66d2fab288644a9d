"""Disk caches: conditioner embeddings and precomputed token batches.

Parity: `audiocraft/utils/cache.py:24-324` — `EmbeddingCache` (disk+memory
cache keyed by sha1(path) with thread-pool prefetch) and
`CachedBatchWriter`/`CachedBatchLoader` (epoch-sharded zipped batches of
precomputed EnCodec tokens used by `solvers/musicgen.py:50-63`).
"""
import hashlib
import logging
import pickle
import sys
import threading
import typing as tp
import zipfile
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)


def get_full_embed(full_embed: np.ndarray, x: tp.Any, idx: int) -> np.ndarray:
    """Default extract: return the whole cached embedding
    (`cache.py:24-36`)."""
    return full_embed


class EmbeddingCache:
    """Disk + memory cache of per-file embeddings (`cache.py:39-160`)."""

    def __init__(self, cache_path: tp.Union[str, Path],
                 compute_embed_fn: tp.Callable[[Path, tp.Any, int], np.ndarray],
                 extract_embed_fn: tp.Optional[tp.Callable] = None):
        self.cache_path = Path(cache_path)
        self._compute_embed_fn = compute_embed_fn
        self._extract_embed_fn = extract_embed_fn or partial(get_full_embed, idx=0)
        if self.cache_path is not None:
            self.cache_path.mkdir(exist_ok=True, parents=True)
            logger.info(f"Cache instantiated at: {self.cache_path}")
            self.pool = ThreadPoolExecutor(8)
            self.pool.__enter__()
        self._current_batch_cache: dict = {}
        self._memory_cache: dict = {}

    def _get_cache_path(self, path: tp.Union[Path, str]) -> Path:
        """sha1 of the file path -> cache file (`cache.py:79-83`)."""
        sig = hashlib.sha1(str(path).encode()).hexdigest()
        return self.cache_path / sig

    @staticmethod
    def _get_full_embed_from_cache(cache: Path) -> np.ndarray:
        """`cache.py:85-92`."""
        with open(cache, "rb") as f:
            return pickle.load(f)

    def get_embed_from_cache(self, paths: tp.List[Path], x: tp.Any) -> np.ndarray:
        """Compute (and persist) missing embeddings, return the stacked batch
        (`cache.py:94-123`)."""
        embeds = []
        for idx, path in enumerate(paths):
            cache = self._get_cache_path(path)
            if cache in self._current_batch_cache:
                embed = self._current_batch_cache[cache]
            else:
                full_embed = self._compute_embed_fn(path, x, idx)
                try:
                    with open(cache, "wb") as f:
                        pickle.dump(np.asarray(full_embed), f)
                except Exception as exc:
                    logger.error("Error saving embed %s (%s): %r",
                                 cache, full_embed.shape, exc)
                else:
                    logger.info("New embed cache saved: %s (%s)", cache,
                                full_embed.shape)
                embed = self._extract_embed_fn(full_embed, x, idx)
            embeds.append(np.asarray(embed))
        return np.stack(embeds)

    def populate_embed_cache(self, paths: tp.List[Path], x: tp.Any) -> None:
        """Prefetch this batch's embeddings with the thread pool
        (`cache.py:124-160`)."""
        self._current_batch_cache.clear()
        if self.cache_path is not None:
            futures = []
            for path in paths:
                assert path is not None, "Path is required for computation from cache"
                cache = self._get_cache_path(path)
                if cache in self._memory_cache or not cache.exists():
                    futures.append(None)
                else:
                    futures.append(self.pool.submit(
                        EmbeddingCache._get_full_embed_from_cache, cache))
            for idx, (path, future) in enumerate(zip(paths, futures)):
                if future is None:
                    continue
                cache = self._get_cache_path(path)
                try:
                    full_embed = future.result()
                except Exception as exc:
                    logger.error("Error loading %s: %r", cache, exc)
                else:
                    embed = self._extract_embed_fn(full_embed, x, idx)
                    self._current_batch_cache[cache] = embed


class CachedBatchWriter:
    """Epoch-sharded zipped batches of precomputed data
    (`cache.py:161-223`)."""

    def __init__(self, cache_folder: Path):
        self.cache_folder = Path(cache_folder)
        self._current_epoch: tp.Optional[int] = None
        self._current_index = 0

    def start_epoch(self, epoch: int):
        self._current_epoch = epoch
        self._current_index = 0
        self._zip_path.parent.mkdir(exist_ok=True, parents=True)

    @staticmethod
    def _get_zip_path(cache_folder: Path, epoch: int, index: int) -> Path:
        return cache_folder / f"{epoch:05d}" / f"{index:06d}.zip"

    @property
    def _zip_path(self) -> Path:
        assert self._current_epoch is not None
        return CachedBatchWriter._get_zip_path(self.cache_folder,
                                               self._current_epoch,
                                               self._current_index)

    def save(self, *content):
        """Save one batch shard (`cache.py:201-223`); multi-writer sharding
        by process index."""
        import jax
        all_contents = [content]
        if jax.process_index() == 0:
            idx = self._current_index
            for content in all_contents:
                zip_path = CachedBatchWriter._get_zip_path(
                    self.cache_folder, self._current_epoch, idx)  # type: ignore
                zip_path.parent.mkdir(exist_ok=True, parents=True)
                with zipfile.ZipFile(zip_path, "w") as zf:
                    with zf.open("content", "w") as f:
                        pickle.dump(content, f)
                idx += 1
        self._current_index += 1


class CachedBatchLoader:
    """Iterate cached batches with thread prefetch (`cache.py:224-324`)."""

    def __init__(self, cache_folder: Path, batch_size: int,
                 num_workers: int = 10, min_length: int = 1):
        self.cache_folder = Path(cache_folder)
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.min_length = min_length
        self._current_epoch: tp.Optional[int] = None
        self.sampler = None

    def __len__(self) -> int:
        path = CachedBatchWriter._get_zip_path(self.cache_folder,
                                               self._current_epoch or 0, 0).parent
        return len([p for p in path.iterdir() if p.suffix == ".zip"])

    def start_epoch(self, epoch: int):
        self._current_epoch = epoch

    # DataLoader-compatible alias so solvers can epoch any train loader
    set_epoch = start_epoch

    def _zip_path(self, index: int) -> Path:
        assert self._current_epoch is not None
        return CachedBatchWriter._get_zip_path(self.cache_folder,
                                               self._current_epoch, index)

    def _load_one(self, index: int):
        zip_path = self._zip_path(index)
        if not zip_path.exists():
            if index < self.min_length:
                raise RuntimeError(
                    f"Cache should have at least {self.min_length} batches, "
                    f"but {index} doesn't exist")
            return None
        try:
            with zipfile.ZipFile(zip_path, "r") as zf:
                with zf.open("content", "r") as f:
                    return pickle.load(f)
        except Exception:
            logger.error("Error when reading zip path %s", zip_path)
            raise

    def __iter__(self):
        """Prefetch with a thread pool (`cache.py:297-324`)."""
        pool = ThreadPoolExecutor(self.num_workers)
        next_index = 0
        queue: deque = deque()

        def _get_next():
            nonlocal next_index
            r = queue.popleft().result()
            if r is None:
                return None
            queue.append(pool.submit(self._load_one, next_index))
            next_index += 1
            return r

        with pool:
            for _ in range(2 * self.num_workers):
                queue.append(pool.submit(self._load_one, next_index))
                next_index += 1
            while True:
                batch = _get_next()
                if batch is None:
                    return
                yield batch
