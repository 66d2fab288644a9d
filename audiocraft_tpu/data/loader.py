"""Lightweight data loader: batching + collation + background prefetch.

Replaces torch.utils.data.DataLoader for the host-side data plane. Workers are
threads (decode releases the GIL in numpy/IO); batches are numpy, converted to
device arrays at the training-step boundary so H2D transfer overlaps compute.
"""
import queue
import threading
import typing as tp

import numpy as np


class DataLoader:
    """Iterate a dataset in batches with optional thread prefetch.

    The dataset must expose `__len__`, `__getitem__` and optionally
    `collater(samples)` and `start_epoch(epoch)`.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 2, drop_last: bool = True,
                 collate_fn: tp.Optional[tp.Callable] = None,
                 prefetch: int = 2, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.collate_fn = collate_fn or getattr(dataset, "collater", None) \
            or (lambda samples: np.stack(samples))
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "start_epoch"):
            self.dataset.start_epoch(epoch)

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _index_order(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        return idx

    def __iter__(self):
        order = self._index_order()
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.num_workers <= 0:
            for b in batches:
                yield self.collate_fn([self.dataset[int(i)] for i in b])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    q.put(self.collate_fn([self.dataset[int(i)] for i in b]))
            except Exception as e:  # surface in the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
