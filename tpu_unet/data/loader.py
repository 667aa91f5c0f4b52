"""Prefetching batch loader: host threads decode while the device computes.

Replaces the reference's torch DataLoader worker processes
(/root/reference/src/dataset.py:184-198) with a thread pool (PIL decode releases the
GIL) plus a bounded in-flight window of pre-assembled batches. Numeric arrays are
stacked into contiguous uint8/int32 batches ready for a single device_put; string
fields (paths, anomaly types) stay host-side lists.

Fixed-shape guarantee: every dataset resizes to a static target size, and the final
partial batch is either dropped (training) or zero-padded to the full batch size with
a ``valid`` mask (evaluation) — so XLA compiles each step exactly once.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Callable, Dict, Iterator, Optional

import numpy as np


def _collate(samples, pad_to: Optional[int] = None) -> Dict:
    batch: Dict = {}
    n = len(samples)
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], str):
            batch[key] = list(vals)
        else:
            arr = np.stack(vals)
            if pad_to is not None and n < pad_to:
                pad_width = [(0, pad_to - n)] + [(0, 0)] * (arr.ndim - 1)
                arr = np.pad(arr, pad_width)
            batch[key] = arr
    if pad_to is not None:
        batch["valid"] = np.arange(pad_to) < n
    return batch


class DataLoader:
    """Iterable over batches with background prefetch.

    Args:
      dataset: object with ``__len__`` and ``load(idx) -> dict``.
      batch_size: fixed batch size.
      shuffle: reshuffle each epoch (epoch counter advances per full iteration).
      seed: base PRNG seed for shuffling.
      drop_last: drop the final partial batch (training).
      pad_last: zero-pad the final batch and add a 'valid' mask (evaluation).
      num_workers: decode threads.
      prefetch: batches kept in flight ahead of the consumer.
      transform: optional host fn applied to each assembled batch (e.g. device_put
        with a NamedSharding).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False, seed: int = 0,
                 drop_last: bool = False, pad_last: bool = False,
                 num_workers: int = 8, prefetch: int = 2,
                 transform: Optional[Callable[[Dict], Dict]] = None):
        if drop_last and pad_last:
            raise ValueError("drop_last and pad_last are mutually exclusive")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.transform = transform
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        batches = []
        for start in range(0, n, self.batch_size):
            idxs = order[start:start + self.batch_size]
            if len(idxs) < self.batch_size and self.drop_last:
                continue
            batches.append(idxs)
        return batches

    def __iter__(self) -> Iterator[Dict]:
        batches = self._index_batches()
        pad_to = self.batch_size if self.pad_last else None

        def assemble(idxs):
            samples = [self.dataset.load(int(i)) for i in idxs]
            return _collate(samples, pad_to=pad_to)

        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            window: list = []
            it = iter(batches)
            try:
                for _ in range(self.prefetch):
                    window.append(pool.submit(assemble, next(it)))
            except StopIteration:
                pass
            while window:
                fut = window.pop(0)
                try:
                    window.append(pool.submit(assemble, next(it)))
                except StopIteration:
                    pass
                batch = fut.result()
                yield self.transform(batch) if self.transform else batch
        self.epoch += 1
