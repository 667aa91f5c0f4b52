"""Prefetching batch loader: host threads decode while the device computes.

Replaces the reference's torch DataLoader worker processes
(/root/reference/src/dataset.py:184-198) with a thread pool (PIL decode releases the
GIL) plus a bounded in-flight window of pre-assembled batches. Numeric arrays are
stacked into contiguous uint8/int32 batches ready for a single device_put; string
fields (paths, anomaly types) stay host-side lists.

Fixed-shape guarantee: every dataset resizes to a static target size, and the final
partial batch is either dropped (training) or zero-padded to the full batch size with
a ``valid`` mask (evaluation) — so XLA compiles each step exactly once.

Multi-process (multi-host) data sharding (SURVEY §2.14): ``batch_size`` is the
GLOBAL batch. Every process computes the identical seeded index order, but each
assembles (decodes) only its own contiguous 1/process_count block of every global
batch — no host loads a sample it doesn't own. ``parallel.shard_batch`` then forms
the global jax.Array from the per-process block via
``jax.make_array_from_process_local_data``. Single-process runs are unchanged.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Callable, Dict, Iterator, Optional

import numpy as np


def _collate(samples, valid: Optional[np.ndarray] = None) -> Dict:
    """Stack sample dicts; ``valid`` (bool rows) marks zero-padded entries."""
    batch: Dict = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], str):
            batch[key] = list(vals)
        else:
            batch[key] = np.stack(vals)
    if valid is not None:
        batch["valid"] = valid
    return batch


def _zero_like_sample(template: Dict) -> Dict:
    return {k: ("" if isinstance(v, str) else np.zeros_like(v))
            for k, v in template.items()}


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
                 transform: Optional[Callable[[Dict], Dict]] = None,
                 process_count: Optional[int] = None,
                 process_index: Optional[int] = None):
        if drop_last and pad_last:
            raise ValueError("drop_last and pad_last are mutually exclusive")
        if process_count is None:
            # Auto-detect multi-host runs (jax.distributed must be initialized
            # before the first loader is built, as in the CLIs). Read the
            # distributed state directly — jax.process_count() would initialize
            # the device backend, which host-only tools (e.g. the input-pipeline
            # benchmark) must not do.
            try:
                from jax._src.distributed import global_state
                process_count = int(global_state.num_processes or 1)
                process_index = int(global_state.process_id or 0)
            except Exception:
                process_count, process_index = 1, 0
        if batch_size % process_count != 0:
            raise ValueError(f"global batch_size {batch_size} not divisible by "
                             f"process_count {process_count}")
        self.process_count = process_count
        self.process_index = process_index or 0
        self.local_batch_size = batch_size // process_count
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
        """Global index batches; padded rows are -1 (identical on all processes)."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        batches = []
        for start in range(0, n, self.batch_size):
            idxs = order[start:start + self.batch_size]
            if len(idxs) < self.batch_size:
                if self.drop_last:
                    continue
                if self.pad_last:
                    idxs = np.concatenate(
                        [idxs, np.full(self.batch_size - len(idxs), -1, idxs.dtype)])
                elif self.process_count > 1:
                    raise ValueError(
                        "multi-process loading needs drop_last or pad_last to keep "
                        "the global batch divisible across processes")
                elif not getattr(self, "_warned_ragged", False):
                    # A second shape means a second full XLA compile of the step
                    # (minutes on TPU). The CLIs always set one of the flags;
                    # warn library users once instead of silently paying it.
                    self._warned_ragged = True
                    import warnings
                    warnings.warn(
                        f"final batch has {len(idxs)} rows (< batch_size "
                        f"{self.batch_size}); jitted steps will recompile for "
                        "the ragged shape — pass drop_last=True (training) or "
                        "pad_last=True (eval) to keep one compiled shape",
                        stacklevel=3)
            batches.append(idxs)
        return batches

    def __iter__(self) -> Iterator[Dict]:
        batches = self._index_batches()
        lo = self.process_index * self.local_batch_size

        def assemble(idxs):
            # This process decodes only its contiguous block of the global batch.
            local = idxs[lo:lo + self.local_batch_size] if self.process_count > 1 else idxs
            samples = [self.dataset.load(int(i)) if i >= 0 else None for i in local]
            template = next((s for s in samples if s is not None), None)
            if template is None:  # a block that is entirely padding
                template = self.dataset.load(0)
            zero = _zero_like_sample(template)
            samples = [s if s is not None else zero for s in samples]
            valid = (local >= 0) if self.pad_last else None
            return _collate(samples, valid=valid)

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
