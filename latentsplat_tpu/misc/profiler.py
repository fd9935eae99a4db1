"""Device-level tracing (the TPU equivalent of SURVEY.md §5's tracing row).

The reference's only profiling is the Benchmarker wall-clock timer
(src/misc/benchmarker.py:35-61). On TPU, wall clock alone hides what the
chip is doing; `jax.profiler` captures XLA op-level traces viewable in
TensorBoard / Perfetto. This wraps it with the same tag ergonomics as the
Benchmarker so both can bracket the same code:

    with trace(Path("outputs/trace")):
        with annotate("encoder"):
            gaussians = encoder(...)
        jax.block_until_ready(gaussians)
"""

from __future__ import annotations

from contextlib import contextmanager
from pathlib import Path

import jax


@contextmanager
def trace(log_dir: Path):
    """Capture a device trace into `log_dir` (TensorBoard `profile` plugin
    or Perfetto read the output)."""
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Name a region inside an active trace (shows as a span around the
    ops dispatched within)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_profile(path: Path) -> None:
    """Dump the current device memory profile (pprof format)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(jax.profiler.device_memory_profile())
