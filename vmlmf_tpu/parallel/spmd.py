"""SPMD composition of the fused Pallas kernels with a device mesh.

Why this exists: a compiled `pallas_call` is a Mosaic custom call — XLA's SPMD
partitioner has no partitioning rule for it, so inside a `jit` with a
batch-sharded operand it is resolved by all-gathering the batch and running
the full-size kernel on every device (or rejected outright).  That silently
destroys the data-parallel scaling the sharding layer promises.  The fix is
explicit: run the kernel under `shard_map` over the mesh's ``data`` axis so
each device executes the kernel on its local batch shard, with the recurrent
weights replicated.  `shard_map` is differentiable — the transpose of the
replicated-in weights inserts the gradient `psum` over ICI automatically, so
DP training through the kernel needs no hand-written collectives.

Mechanism: trainers activate `kernel_spmd(mesh)` around their (traced) step
bodies; `nn.recurrence.scan_layer` consults `current_kernel_spmd()` at trace
time and routes fused-kernel calls through `shard_batch_kernel`.  The XLA
scan backend needs none of this — GSPMD partitions `lax.scan` natively.

The wrapper only engages when the global batch divides the data-axis size;
otherwise it warns once and runs unwrapped (correct everywhere JAX can
partition the op; on a real pod prefer divisible batches).
"""

from __future__ import annotations

import contextlib
import contextvars
import warnings

from jax.sharding import PartitionSpec as P

from vmlmf_tpu.parallel.compat import shard_map

_KERNEL_SPMD: contextvars.ContextVar = contextvars.ContextVar(
    "vmlmf_kernel_spmd", default=None)


@contextlib.contextmanager
def kernel_spmd(mesh, axis="data"):
    """Activate fused-kernel SPMD over ``mesh``'s ``axis`` for the dynamic
    extent (trace time) of the body.  ``mesh=None`` or a mesh without the
    axis is a no-op, so callers can wrap unconditionally."""
    if mesh is None or axis not in getattr(mesh, "axis_names", ()):
        yield
        return
    token = _KERNEL_SPMD.set((mesh, axis))
    try:
        yield
    finally:
        _KERNEL_SPMD.reset(token)


def current_kernel_spmd():
    """-> (mesh, axis) under an active `kernel_spmd`, else None."""
    return _KERNEL_SPMD.get()


_warned_indivisible: set = set()


def _warn_indivisible(b, n, axis):
    key = (b, n, axis)
    if key not in _warned_indivisible:
        _warned_indivisible.add(key)
        warnings.warn(
            f"kernel SPMD: global batch {b} does not divide the {n}-way "
            f"'{axis}' mesh axis; running the fused kernel unwrapped (XLA "
            "may all-gather the batch on a real pod — prefer divisible "
            "batches)", stacklevel=3)


def local_batch(b, spmd=None):
    """Per-device batch under the active (or given) kernel SPMD context."""
    spmd = spmd or current_kernel_spmd()
    if spmd is None:
        return b
    mesh, axis = spmd
    n = mesh.shape[axis]
    return b // n if (n > 1 and b % n == 0) else b


def shard_batch_kernel(fn, stream, weights, states, n_state_out):
    """Run fused-scan ``fn(stream, *weights, *states)`` data-parallel.

    stream: [T, B, ...] (batch dim 1, sharded); states: [B, h] each (dim 0,
    sharded); weights: replicated (grads psum'd by the shard_map transpose).
    Outputs: ys [T, B, h] followed by ``n_state_out`` state outputs [B, h].
    Falls through to a direct call with no active context, a 1-device data
    axis, or an indivisible batch.
    """
    spmd = current_kernel_spmd()
    if spmd is not None:
        mesh, axis = spmd
        n = mesh.shape[axis]
        b = stream.shape[1]
        if n > 1 and b % n == 0:
            in_specs = ((P(None, axis),) + tuple(P() for _ in weights)
                        + tuple(P(axis) for _ in states))
            if n_state_out:
                out_specs = (P(None, axis),) + (P(axis),) * n_state_out
            else:
                out_specs = P(None, axis)
            return shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs)(stream, *weights, *states)
        if n > 1:
            _warn_indivisible(b, n, axis)
    return fn(stream, *weights, *states)
