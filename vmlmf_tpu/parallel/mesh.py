"""Device-mesh construction.

The reference has no distributed execution of any kind (SURVEY.md §2.3); this
layer is designed from scratch for TPU pods: a named 2-D mesh with a ``data``
axis (batch parallelism — gradients psum over ICI) and a ``model`` axis
(vocab-sharded embedding/softmax for the LM head).  On a real slice the mesh
axes should be laid out so ``model`` rides the faster ICI ring; XLA lowers all
collectives from sharding annotations — no hand-written transport.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data=None, model=1, *, devices=None):
    """Mesh over (data, model). ``data=None`` -> all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model <= n, f"need {data}x{model} devices, have {n}"
    grid = devices[: data * model].reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))
