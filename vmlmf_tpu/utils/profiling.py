"""Profiling + numerical-sanitizer hooks.

Reference analogs (SURVEY.md §5): wall-clock epoch timers and CUDA memory
logging (`train.py:52-77`, `lm_test.py:210-218`) and cuDNN determinism knobs /
`set_detect_anomaly` (`main.py:92-103`).  TPU-native equivalents:

  * `trace(dir)` — context manager around `jax.profiler` producing a
    TensorBoard-loadable trace of device execution (the real replacement for
    per-step host timers: shows per-op device time, HBM traffic, fusion),
  * `enable_nan_checks()` — `jax_debug_nans`: every jit'd computation re-runs
    op-by-op on NaN and raises at the producing op (the functional-purity
    analog of `autograd.set_detect_anomaly`),
  * `live_buffer_bytes()` — device-memory accounting (the
    `torch.cuda.max_memory_allocated` analog).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir="/tmp/vmlmf_trace"):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def enable_nan_checks(on=True):
    """NaN sanitizer: raise (with op location) when any jit output is NaN."""
    jax.config.update("jax_debug_nans", on)


def live_buffer_bytes(device=None):
    """Total bytes of live device buffers (per device or all)."""
    bufs = jax.live_arrays()
    total = 0
    for a in bufs:
        if device is not None and device not in getattr(a, "devices", lambda: set())():
            continue
        total += a.size * a.dtype.itemsize
    return total
