"""Wall-clock timing helpers (reference analog: legacy `utils/timer.py:9-41`).

`Timer` is tic/toc; `device_time` blocks on device completion so TPU timings
measure execution rather than dispatch (the reference's CUDA timings rely on
implicit sync at `.item()`)."""

from __future__ import annotations

import time

import jax


class Timer:
    def __init__(self):
        self._t0 = None
        self.laps = []

    def tic(self):
        self._t0 = time.perf_counter()
        return self

    def toc(self):
        dt = time.perf_counter() - self._t0
        self.laps.append(dt)
        return dt

    @property
    def total(self):
        return sum(self.laps)


def device_time(fn, *args, iters=1, warmup=1, **kw):
    """Median wall time of `fn` with blocking on all output buffers."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
