"""Global-step sharing with data-loader workers.

Parity with reference src/misc/step_tracker.py:9-24 (shared-memory int64 +
RLock). Our loader workers are threads or same-process generators by
default, so a plain lock-guarded integer suffices; when multiprocessing
loaders are used, the multiprocessing.Value path provides the same
cross-process visibility.
"""

from __future__ import annotations

import multiprocessing
import threading


class StepTracker:
    def __init__(self, step_offset: int = 0, use_multiprocessing: bool = False):
        self.step_offset = step_offset
        if use_multiprocessing:
            self._value = multiprocessing.Value("q", 0)
            self._lock = self._value.get_lock()

            def get():
                return self._value.value

            def set_(v):
                self._value.value = v

        else:
            self._raw = 0
            self._lock = threading.Lock()

            def get():
                return self._raw

            def set_(v):
                self._raw = v

        self._get = get
        self._set = set_

    def set_step(self, step: int) -> None:
        with self._lock:
            self._set(self.step_offset + step)

    def get_step(self) -> int:
        with self._lock:
            return self._get()
