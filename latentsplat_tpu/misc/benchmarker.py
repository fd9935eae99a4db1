"""Wall-clock benchmark harness + device memory stats.

Parity with reference src/misc/benchmarker.py:35-61: tagged timers collected
into {tag: [seconds...]}, dumped as benchmark.json, plus peak device memory
as peak_memory.json — so generate_benchmark_table-style tooling ports over.
TPU translation: timers bracket `jax.block_until_ready`; memory comes from
device.memory_stats() (peak_bytes_in_use) instead of torch.cuda.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path
from typing import Dict, List

import jax


class Benchmarker:
    def __init__(self):
        self.execution_times: Dict[str, List[float]] = defaultdict(list)

    @contextmanager
    def time(self, tag: str, num_calls: int = 1):
        try:
            start_time = time.perf_counter()
            yield
        finally:
            end_time = time.perf_counter()
            for _ in range(num_calls):
                self.execution_times[tag].append(
                    (end_time - start_time) / num_calls
                )

    def time_fn(self, tag: str, fn, *args, num_calls: int = 1, **kwargs):
        """Run fn and block on its outputs so device time is included."""
        with self.time(tag, num_calls=num_calls):
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
        return out

    def dump(self, path: Path) -> None:
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        with path.open("w") as f:
            json.dump(dict(self.execution_times), f)

    def dump_memory(self, path: Path) -> None:
        path = Path(path)
        path.parent.mkdir(exist_ok=True, parents=True)
        stats = {}
        for device in jax.local_devices():
            mem = device.memory_stats() or {}
            stats[str(device)] = mem.get("peak_bytes_in_use", 0)
        with path.open("w") as f:
            json.dump(stats, f)

    def summarize(self) -> Dict[str, float]:
        return {
            tag: sum(times) / len(times)
            for tag, times in self.execution_times.items()
            if times
        }

    def clear_history(self) -> None:
        self.execution_times = defaultdict(list)
