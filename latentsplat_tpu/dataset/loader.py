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
    num_workers: int = 0,
    seed: int = 0,
    stage: str = "train",
) -> Iterator[Dict]:
    """num_workers > 0 forks that many loader processes (the torch
    DataLoader analog); 0 keeps the in-process thread-prefetch path."""
    if num_workers > 0:
        return MultiprocessLoader(
            dataset, batch_size, num_workers=num_workers, repeat=repeat,
            drop_last=drop_last, seed=seed, stage=stage,
        )
    it = batch_iterator(dataset, batch_size, drop_last=drop_last, repeat=repeat)
    if prefetch > 0:
        return PrefetchIterator(it, depth=prefetch)
    return it


# ---------------------------------------------------------------------------
# Multi-process loading (the torch-DataLoader-workers analog)
# ---------------------------------------------------------------------------


def _compose_shard(dataset, worker_id: int, num_workers: int) -> None:
    """Compose worker sharding with any existing (e.g. per-host) sharding:
    worker w of host h reads chunks where i % (H*W) == h*W + w
    (ref dataset_re10k.py:80-86 shards test chunks by worker)."""
    if hasattr(dataset, "num_shards"):
        base_idx = getattr(dataset, "shard_index", 0)
        base_n = getattr(dataset, "num_shards", 1)
        dataset.shard_index = base_idx * num_workers + worker_id
        dataset.num_shards = base_n * num_workers


def _worker_loop(
    dataset, batch_size, drop_last, repeat, seed, worker_id, num_workers,
    out_queue, stage,
):
    """Child-process body: seed (ref data_module.py:53-55), shard, iterate,
    collate, push. Runs under forkserver, so `dataset` (incl. a
    multiprocessing StepTracker for the view-sampler curriculum) arrives by
    pickling and must stay numpy/IO-only — no JAX in workers."""
    import random as _random

    _random.seed(seed + worker_id)
    np.random.seed((seed + worker_id) % (2**32))
    if hasattr(dataset, "rng"):
        dataset.rng = np.random.default_rng(seed + worker_id)
    if stage == "test":
        _compose_shard(dataset, worker_id, num_workers)

    try:
        while True:
            buf = []
            for example in dataset:
                buf.append(example)
                if len(buf) == batch_size:
                    out_queue.put(collate(buf))
                    buf = []
            if buf and not drop_last:
                out_queue.put(collate(buf))
            if not repeat:
                break
    finally:
        out_queue.put(None)


class MultiprocessLoader:
    """N worker processes each produce collated batches into a shared queue
    (the reference's torch DataLoader with num_workers, seeding, and
    per-worker test-chunk sharding, data_module.py:35-122). Batch order
    across workers is nondeterministic, matching torch's multi-worker
    semantics; within a worker, order follows its seeded shuffle.

    Workers start via the forkserver context: the server process is a fresh
    interpreter, so workers never inherit the parent's JAX/XLA threads and
    locks (a plain fork after JAX initialization can deadlock on them).
    This requires the dataset to be picklable; all shipped datasets are, and
    the shared-memory StepTracker pickles through Process construction so
    the curriculum stays live in workers."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        num_workers: int,
        repeat: bool = False,
        drop_last: bool = True,
        seed: int = 0,
        stage: str = "train",
        prefetch_per_worker: int = 2,
        mp_context: str = "forkserver",
    ):
        import multiprocessing as mp

        ctx = mp.get_context(mp_context)
        self._queue = ctx.Queue(maxsize=max(2, prefetch_per_worker * num_workers))
        self._procs = [
            ctx.Process(
                target=_worker_loop,
                args=(dataset, batch_size, drop_last, repeat, seed, w,
                      num_workers, self._queue, stage),
                daemon=True,
            )
            for w in range(num_workers)
        ]
        for p in self._procs:
            p.start()
        self._live = num_workers

    def __iter__(self):
        return self

    def __next__(self):
        while self._live > 0:
            try:
                item = self._queue.get(timeout=5.0)
            except queue.Empty:
                # A worker that died without its None sentinel (segfault,
                # OOM kill) must not hang the consumer forever. A worker
                # that is no longer alive can add nothing beyond what is
                # already queued, so after one extra drain attempt any
                # outstanding sentinels above the alive count are lost.
                n_alive = sum(1 for p in self._procs if p.is_alive())
                if self._live <= n_alive:
                    continue
                try:
                    item = self._queue.get(timeout=1.0)
                except queue.Empty:
                    lost = self._live - n_alive
                    self._live = n_alive
                    import warnings

                    warnings.warn(
                        f"{lost} loader worker(s) died without a sentinel; "
                        "continuing with the survivors"
                    )
                    continue
            if item is None:
                self._live -= 1
                continue
            return item
        raise StopIteration

    def close(self) -> None:
        for p in self._procs:
            if p.is_alive():
                p.terminate()
        for p in self._procs:
            p.join(timeout=5)
