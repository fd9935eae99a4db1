"""Loader tests: collation, thread prefetch, and the multiprocess path
(the torch-DataLoader-workers analog: forkserver workers, per-worker
seeding, composed test-chunk sharding, dead-worker recovery)."""

import os
import time

import numpy as np

from latentsplat_tpu.dataset.loader import (
    MultiprocessLoader,
    batch_iterator,
    collate,
    make_loader,
)
from latentsplat_tpu.training.step_tracker import StepTracker


class RangeDataset:
    """Picklable/forkable iterable yielding dict examples; mimics the
    chunked datasets' shard attributes."""

    def __init__(self, n=16):
        self.n = n
        self.shard_index = 0
        self.num_shards = 1
        self.rng = np.random.default_rng(0)

    def __iter__(self):
        for i in range(self.n):
            if i % self.num_shards != self.shard_index:
                continue
            yield {"value": np.asarray([i], np.float32),
                   "shard": np.asarray([self.shard_index], np.int32)}


def test_collate_nested():
    batch = collate([
        {"a": np.zeros(3), "nested": {"b": np.ones(2)}, "name": "x"},
        {"a": np.ones(3), "nested": {"b": np.zeros(2)}, "name": "y"},
    ])
    assert batch["a"].shape == (2, 3)
    assert batch["nested"]["b"].shape == (2, 2)
    assert batch["name"] == ["x", "y"]


def test_batch_iterator_drop_last():
    batches = list(batch_iterator(RangeDataset(10), 4, drop_last=True))
    assert len(batches) == 2
    batches = list(batch_iterator(RangeDataset(10), 4, drop_last=False))
    assert len(batches) == 3 and batches[-1]["value"].shape[0] == 2


def test_multiprocess_loader_yields_everything():
    loader = MultiprocessLoader(
        RangeDataset(16), batch_size=2, num_workers=2, repeat=False,
        drop_last=True, seed=0, stage="train",
    )
    values = sorted(
        int(v) for b in loader for v in np.asarray(b["value"]).ravel()
    )
    # Train stage: every worker iterates the full dataset (reference
    # semantics — distinct random streams, no sharding), so each value
    # appears once per worker.
    assert values == sorted(list(range(16)) * 2)
    loader.close()


def test_multiprocess_loader_test_stage_shards():
    loader = MultiprocessLoader(
        RangeDataset(16), batch_size=2, num_workers=2, repeat=False,
        drop_last=False, seed=0, stage="test",
    )
    batches = list(loader)
    values = sorted(
        int(v) for b in batches for v in np.asarray(b["value"]).ravel()
    )
    shards = {int(s) for b in batches for s in np.asarray(b["shard"]).ravel()}
    # Test stage: workers shard the examples — union is exactly the
    # dataset, with both worker shards contributing
    # (ref dataset_re10k.py:80-86).
    assert values == list(range(16))
    assert shards == {0, 1}
    loader.close()


class DyingDataset:
    """Yields two examples then hard-exits, simulating an OOM-killed worker
    that never puts its None sentinel."""

    def __iter__(self):
        yield {"value": np.asarray([1], np.float32)}
        yield {"value": np.asarray([2], np.float32)}
        time.sleep(0.5)  # let the queue feeder thread flush the batch
        os._exit(13)


def test_dead_worker_does_not_hang():
    loader = MultiprocessLoader(
        DyingDataset(), batch_size=2, num_workers=1, repeat=False,
        drop_last=True, seed=0, stage="train",
    )
    import warnings

    start = time.monotonic()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        batches = list(loader)
    assert len(batches) == 1
    assert time.monotonic() - start < 60.0
    assert any("died without a sentinel" in str(w.message) for w in caught)
    loader.close()


class CurriculumDataset:
    """Polls a shared StepTracker until the parent advances it, then emits
    the observed step — proving the shared segment survives forkserver
    pickling and stays live across processes."""

    def __init__(self, tracker):
        self.tracker = tracker

    def __iter__(self):
        deadline = time.monotonic() + 30.0
        while self.tracker.get_step() == 0 and time.monotonic() < deadline:
            time.sleep(0.01)
        yield {"step": np.asarray([self.tracker.get_step()], np.int64)}


def test_step_tracker_live_in_workers():
    tracker = StepTracker(step_offset=0)
    loader = MultiprocessLoader(
        CurriculumDataset(tracker), batch_size=1, num_workers=1,
        repeat=False, drop_last=True, seed=0, stage="train",
    )
    tracker.set_step(42)
    batch = next(loader)
    assert int(np.asarray(batch["step"]).ravel()[0]) == 42
    loader.close()


def test_make_loader_dispatches_to_workers():
    it = make_loader(
        RangeDataset(8), 2, repeat=False, drop_last=True,
        num_workers=2, seed=0, stage="test",
    )
    assert isinstance(it, MultiprocessLoader)
    total = sum(np.asarray(b["value"]).size for b in it)
    assert total == 8
