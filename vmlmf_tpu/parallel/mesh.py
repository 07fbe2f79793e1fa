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


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Multi-host (multi-slice / DCN) process initialization.

    On Cloud TPU pods the arguments are auto-detected from the environment;
    pass them explicitly elsewhere.  Safe to call when already initialized
    (no-op).  After this, `jax.devices()` is global and `make_mesh` spans all
    hosts — lay `data` across hosts (gradient psum rides DCN once per step)
    and keep `model` intra-slice (ICI).

    Failure semantics: when any argument is given explicitly, initialization
    errors RAISE — a misconfigured multi-host launch must not degrade silently
    into N independent single-process runs.  Only the fully-auto-detected call
    (all arguments None) treats "no cluster environment detected" as a benign
    single-process fallback.
    """
    if jax.process_count() > 1:
        return  # already initialized
    explicit = not (coordinator_address is None and num_processes is None
                    and process_id is None)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        if explicit:
            raise
        # auto-detection found no cluster environment: single-process run


def local_batch_slice(global_batch):
    """Rows of the global batch owned by this process (per-host input
    pipelines feed `jax.make_array_from_process_local_data`)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def _data_axis_index(spec):
    """Index of the dimension partitioned over the 'data' mesh axis."""
    for i, s in enumerate(spec):
        names = s if isinstance(s, tuple) else (s,)
        if "data" in names:
            return i
    raise ValueError(f"no 'data' axis in {spec}")


def _check_process_contiguous(sharding, shape, axis, sl):
    """`local_batch_slice` hands process p the contiguous global rows
    [p·per, (p+1)·per); that pairing with
    `jax.make_array_from_process_local_data` is only correct when this
    process's addressable shards cover exactly those rows (true for meshes
    built by `make_mesh` over `jax.devices()`, where device order is
    process-major).  For arbitrary meshes/shardings the rows would silently
    land on the wrong processes — check exactly and fail loudly instead."""
    covered = set()
    n = shape[axis]
    for idx in sharding.addressable_devices_indices_map(tuple(shape)).values():
        s = idx[axis]
        covered.update(range(s.start or 0, n if s.stop is None else s.stop))
    if covered != set(range(sl.start, sl.stop)):
        raise ValueError(
            f"process {jax.process_index()}'s addressable shards cover rows "
            f"{sorted(covered)[:4]}..{sorted(covered)[-1]} but local_batch_slice "
            f"assigns [{sl.start}, {sl.stop}); the mesh's 'data' axis is not "
            f"process-contiguous. Build the mesh with make_mesh(...) over "
            f"jax.devices(), or pass local=True with a true per-host loader.")


def make_global_batch(mesh_or_sharding, x, spec=None, *, local=False):
    """Commit a host-produced batch to the mesh (the per-host input pipeline,
    SURVEY.md §2.3 item 2).

    Single-process: a plain `device_put` onto the sharding.  Multi-process:
    each process contributes only its own rows and the result is ONE global
    `jax.Array` assembled via `jax.make_array_from_process_local_data` — no
    host ever materializes other hosts' shards on device.

    x: host (numpy) batch.  With `local=False` (the default for this
    framework's host-replicated data loaders), x is the full GLOBAL batch and
    this process's rows are cut out with `local_batch_slice` along the
    'data'-sharded dimension; pass `local=True` when x already holds only this
    process's rows (a true per-host loader).
    """
    from jax.sharding import NamedSharding

    sharding = (mesh_or_sharding if isinstance(mesh_or_sharding, NamedSharding)
                else NamedSharding(mesh_or_sharding, spec))
    x = np.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if not local:
        axis = _data_axis_index(sharding.spec)
        n = x.shape[axis]
        if n % jax.process_count() != 0:
            raise ValueError(
                f"global batch dim {n} is not divisible by process_count="
                f"{jax.process_count()}; rows would be silently dropped — "
                f"pad or resize the batch")
        sl = local_batch_slice(n)
        _check_process_contiguous(sharding, x.shape, axis, sl)
        idx = [slice(None)] * x.ndim
        idx[axis] = sl
        x = x[tuple(idx)]
    return jax.make_array_from_process_local_data(sharding, x)
