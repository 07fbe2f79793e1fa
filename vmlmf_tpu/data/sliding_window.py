"""Strided sliding windows over NumPy arrays.

Capability parity with
`/root/reference/rnn_compression_factorization_vmlmf/src/utils/sliding_window.py:34-110`
(an n-dim stride-trick windowing utility): here only the 1-d-over-time case the
pipelines actually use, implemented with `sliding_window_view` (zero-copy) and
an explicit step.
"""

from __future__ import annotations

import numpy as np


def sliding_window(a: np.ndarray, window: int, step: int) -> np.ndarray:
    """Windows of length `window` every `step` rows along axis 0.

    [N, ...] -> [num_windows, window, ...]; trailing remainder is dropped
    (matching the reference's truncating behavior).
    """
    if len(a) < window:
        return np.empty((0, window) + a.shape[1:], a.dtype)
    if a.ndim == 2 and a.dtype == np.float32 and a.flags.c_contiguous:
        from vmlmf_tpu.data import _native

        if _native.get_lib() is not None:  # native memcpy path
            return _native.sliding_window_f32(a, window, step)
    view = np.lib.stride_tricks.sliding_window_view(a, window, axis=0)
    # sliding_window_view puts the window axis last; move next to batch
    view = np.moveaxis(view, -1, 1)
    return np.ascontiguousarray(view[::step])


def window_series(x: np.ndarray, y: np.ndarray, window: int, step: int):
    """Segment a labelled sensor stream: features get full windows, the label
    of a window is its last row's label (`preprocess_opp.py:357-368`)."""
    xw = sliding_window(x, window, step)
    yw = sliding_window(y, window, step)[:, -1]
    return xw.astype(np.float32), yw.astype(np.int32)
