"""Global-step sharing with data-loader workers.

Parity with reference src/misc/step_tracker.py:9-24 (shared-memory int64 +
RLock). Always backed by a multiprocessing.Value so the view-sampler
curriculum sees live step updates from any loader worker start method
(thread, fork, forkserver, spawn): the shared segment plus its lock are
picklable through Process construction, and in-process access costs only a
lock acquire.
"""

from __future__ import annotations

import multiprocessing


class StepTracker:
    def __init__(self, step_offset: int = 0):
        self.step_offset = step_offset
        # Must match the loader's start method: a SemLock from the default
        # (fork) context cannot be pickled into a forkserver/spawn child.
        self._value = multiprocessing.get_context("forkserver").Value("q", 0)

    def set_step(self, step: int) -> None:
        with self._value.get_lock():
            self._value.value = self.step_offset + step

    def get_step(self) -> int:
        with self._value.get_lock():
            return self._value.value
