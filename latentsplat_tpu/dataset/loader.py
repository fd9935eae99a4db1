"""Host-side batching + background prefetch.

Replaces torch DataLoader (reference src/dataset/data_module.py:58-122):
a thread prefetches and collates numpy examples while the device runs the
previous step, overlapping input pipeline and TPU compute. The device
transfer itself happens in the training loop (jax.device_put with the mesh
sharding), mirroring per-host feeding of the batch shard.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, Optional

import numpy as np


def collate(examples: list) -> Dict:
    """Stack a list of example dicts into a batched dict (leading axis b)."""

    def stack(items):
        first = items[0]
        if isinstance(first, dict):
            return {k: stack([it[k] for it in items]) for k in first}
        if isinstance(first, str):
            return list(items)
        return np.stack([np.asarray(it) for it in items])

    return stack(examples)


def batch_iterator(
    dataset: Iterable,
    batch_size: int,
    drop_last: bool = True,
    repeat: bool = False,
) -> Iterator[Dict]:
    """Collated batches; optionally loops the dataset forever (training)."""
    while True:
        buf = []
        for example in dataset:
            buf.append(example)
            if len(buf) == batch_size:
                yield collate(buf)
                buf = []
        if buf and not drop_last:
            yield collate(buf)
        if not repeat:
            return


class PrefetchIterator:
    """Wrap an iterator with a daemon-thread prefetch queue."""

    _DONE = object()

    def __init__(self, iterator: Iterator, depth: int = 2):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._error: Optional[BaseException] = None

        def worker():
            try:
                for item in iterator:
                    self._queue.put(item)
            except BaseException as e:  # propagate into the consumer
                self._error = e
            finally:
                self._queue.put(self._DONE)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._DONE:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


def make_loader(
    dataset: Iterable,
    batch_size: int,
    *,
    repeat: bool = False,
    drop_last: bool = True,
    prefetch: int = 2,
) -> Iterator[Dict]:
    it = batch_iterator(dataset, batch_size, drop_last=drop_last, repeat=repeat)
    if prefetch > 0:
        return PrefetchIterator(it, depth=prefetch)
    return it
