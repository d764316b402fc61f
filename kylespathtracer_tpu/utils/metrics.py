"""Structured metrics and profiling.

The reference's observability is four startup printfs (main.cpp:301-323);
here every step emits a JSONL record (rays/s, loss, grad-norm, wall time)
and hot sections can be wrapped in `jax.profiler` traces.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from pathlib import Path


class MetricsLogger:
    """Append-only JSONL metrics sink (stdout and/or a file)."""

    def __init__(self, path=None, echo: bool = False):
        self._file = open(path, "a") if path else None
        self._echo = echo or path is None
        self._t0 = time.perf_counter()

    def log(self, **record) -> None:
        record.setdefault("t", round(time.perf_counter() - self._t0, 6))
        line = json.dumps(record)
        if self._file:
            self._file.write(line + "\n")
            self._file.flush()
        if self._echo:
            print(line, file=sys.stderr)

    def close(self) -> None:
        if self._file:
            self._file.close()


@contextlib.contextmanager
def profiler_trace(logdir):
    """Capture a `jax.profiler` trace of the enclosed block (viewable in
    TensorBoard / Perfetto); the reference has no profiling at all."""
    import jax

    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer with device sync for honest kernel timings."""

    def __init__(self):
        self.t0 = None
        self.elapsed = 0.0

    def __enter__(self):
        import jax

        jax.effects_barrier()
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


def time_fn(fn, *args, iters: int = 10, warmup: int = 1):
    """Time a jitted fn: `warmup` compile calls, then `iters` timed calls
    ended with a block_until_ready. Returns seconds per call."""
    import jax

    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
