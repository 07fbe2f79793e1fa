"""Recurrence execution: stacked cells under `lax.scan`.

Replaces the reference's doubly nested Python loops (layers × timesteps,
`/root/reference/rnn_compression_factorization_vmlmf/src/models/vmlmf.py:300-310`)
with, per layer:

  1. one time-parallel input projection over the whole ``[T, B, n]`` block
     (``cell.inp`` — a single MXU matmul; invisible in the reference's
     structure but the single biggest TPU win, since only the h-path of the
     recurrence is inherently serial),
  2. one ``lax.scan`` over time whose body is ``cell.step`` (h-path matmul +
     gate elementwise), compiled once by XLA regardless of sequence length.

Sequences are time-major ``[T, B, n]`` internally; `RNN.__call__` accepts
batch-major input (the HAR layout) via ``time_major=False``.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp


def _pallas_available(cell, state0):
    return hasattr(cell, "fused_rec_inputs") and isinstance(state0, tuple)


_BACKENDS = ("xla", "pallas")
_RETIRED_BACKENDS = ("pipelined", "pallas_pipelined")


def _check_backend(backend):
    """Production surface: xla | pallas.  The wavefront schedules are
    retired experiment knobs — measured slower than per-layer 'pallas' at
    every depth (docs/wavefront.md) — and must be opted into explicitly."""
    if backend in _RETIRED_BACKENDS:
        if os.environ.get("VMLMF_EXPERIMENTAL_WAVEFRONT") == "1":
            return
        raise ValueError(
            f"backend={backend!r} is retired from the production surface "
            "(the wavefront schedules measured slower than the per-layer "
            "'pallas' kernel at every depth — docs/wavefront.md has the "
            "measurements and the dominance argument). Set "
            "VMLMF_EXPERIMENTAL_WAVEFRONT=1 to use it as an experiment knob.")
    if backend not in _BACKENDS:
        raise ValueError(
            f"unknown backend {backend!r}; choose from {_BACKENDS} "
            f"(retired experiment knobs: {_RETIRED_BACKENDS})")


_warned_unfit: set = set()


def _warn_unfit(cell, t, b):
    """One-time warning when the fused kernels cannot tile a config under the
    chip's VMEM budget and `scan_layer` routes to the XLA scan instead."""
    import warnings

    key = (type(cell).__name__, cell.hidden_size, t, b)
    if key not in _warned_unfit:
        _warned_unfit.add(key)
        warnings.warn(
            f"fused Pallas scan cannot tile {key[0]}(h={cell.hidden_size}) "
            f"at T={t}, B={b} under the VMEM budget; falling back to the "
            "XLA scan (identical math, re-streams factors per step)",
            stacklevel=4)


def _use_interpret():
    """Pallas kernels run compiled on TPU, interpreted elsewhere (CPU tests)."""
    if os.environ.get("VMLMF_PALLAS_INTERPRET"):
        return os.environ["VMLMF_PALLAS_INTERPRET"] == "1"
    return jax.default_backend() != "tpu"


def _use_xin(cell):
    """Whether the pallas backend should fuse the input projection INTO the
    scan kernel (stream x, x-side weights VMEM-resident) instead of hoisting
    it (stream the precomputed gi [T, B, 4h]).

    The x-fused kernel removes ~5 HBM passes of [T, B, 4h] per train step
    (gi write + 2 reads, dgi write + read) in exchange for 2 passes of
    [T, B, F] and per-time-block projection matmuls inside the kernel; it
    wins whenever the scan is HBM-bound and F < 4h (always true for these
    cells).  Measured on v5e: HAR demo (F=77, 4h=720) 2.0x; PTB flagship
    (F=650, 4h=2600) +6%.  Env override: VMLMF_PALLAS_XIN=0|1.
    """
    env = os.environ.get("VMLMF_PALLAS_XIN")
    if env is not None:
        return env == "1"
    return True


def scan_layer(cell, prep, xs, state0, *, reverse=False, unroll=1, backend="xla",
               precision=None):
    """Run one cell over time-major ``xs [T, B, n]`` -> (ys [T, B, h], state).

    backend="pallas" routes LSTM-family cells through the fused whole-scan
    kernel (`vmlmf_tpu.ops.pallas_scan`), with the input projection fused
    into the kernel when the cell provides `fused_x_inputs` (see `_use_xin`);
    cells without a fused mapping (and non-LSTM states) fall back to the XLA
    scan transparently.
    precision="bf16" runs the fused kernel's recurrent matmuls in single-pass
    bf16 with f32 accumulation (fastest MXU path); default "f32" matches the
    XLA scan bit-for-bit.  Env override: VMLMF_PALLAS_PRECISION.

    Under an active `parallel.spmd.kernel_spmd(mesh)` context the fused
    kernels run shard_map-wrapped over the mesh's data axis (each device
    scans its local batch shard; weight grads psum automatically) — a bare
    `pallas_call` has no SPMD partitioning rule and would otherwise be
    resolved by replicating the batch on a real pod.  The VMEM fit check is
    evaluated at the per-device batch.
    """
    if backend == "pallas" and _pallas_available(cell, state0):
        from vmlmf_tpu.ops.pallas_scan import (
            _round_up,
            fused_scan_fits,
            lstm_scan_fused,
            lstm_scan_fused_xin,
        )
        from vmlmf_tpu.parallel.spmd import local_batch, shard_batch_kernel

        fri = cell.fused_rec_inputs(prep)
        if fri is not None:
            u, v, dvec = fri
            h0, c0 = state0
            prec = precision or os.environ.get("VMLMF_PALLAS_PRECISION", "f32")
            fxi = None
            if _use_xin(cell):
                fxi = getattr(cell, "fused_x_inputs", lambda p: None)(prep)
            if not fused_scan_fits(
                    xs.shape[0], local_batch(xs.shape[1]),
                    4 * _round_up(cell.hidden_size, 128),
                    (u, v, dvec) + (fxi or ()), xin=fxi is not None):
                _warn_unfit(cell, xs.shape[0], xs.shape[1])
                fri = None  # fall through to the XLA scan below
        if fri is not None:
            from vmlmf_tpu.ops.pallas_scan import TileOverflowError

            interp = _use_interpret()
            try:
                if fxi is not None:
                    src = jnp.flip(xs, axis=0) if reverse else xs

                    def xin_fn(stream, *rest):
                        return lstm_scan_fused_xin(stream, *rest,
                                                   interpret=interp,
                                                   precision=prec)

                    ys, c_last = shard_batch_kernel(
                        xin_fn, src, fxi + (u, v, dvec), (h0, c0), 1)
                else:
                    gi = cell.inp(prep, xs)  # hoisted, time-parallel
                    if reverse:
                        gi = jnp.flip(gi, axis=0)

                    def gi_fn(stream, *rest):
                        return lstm_scan_fused(stream, *rest,
                                               interpret=interp,
                                               precision=prec)

                    ys, c_last = shard_batch_kernel(
                        gi_fn, gi, (u, v, dvec), (h0, c0), 1)
            except TileOverflowError:
                # fused_scan_fits approximates padded bytes; at the VMEM
                # boundary the kernel's exact picker can still refuse —
                # honor the documented automatic XLA-scan fallback
                _warn_unfit(cell, xs.shape[0], xs.shape[1])
            else:
                h_last = ys[-1]
                if reverse:
                    ys = jnp.flip(ys, axis=0)
                return ys, (h_last, c_last)

    if (backend == "pallas" and hasattr(cell, "fused_rec_inputs_gru")
            and not isinstance(state0, tuple)):
        from vmlmf_tpu.ops.pallas_gru import gru_scan_fused, gru_scan_fused_xin

        from vmlmf_tpu.ops.pallas_scan import _round_up, fused_scan_fits
        from vmlmf_tpu.parallel.spmd import local_batch, shard_batch_kernel

        uf, prz, pn, mode = cell.fused_rec_inputs_gru(prep)
        fxi = None
        if _use_xin(cell):
            fxi = getattr(cell, "fused_x_inputs_gru", lambda p: None)(prep)
        if not fused_scan_fits(
                xs.shape[0], local_batch(xs.shape[1]),
                3 * _round_up(cell.hidden_size, 128),
                (uf, prz, pn) + (fxi or ()), xin=fxi is not None):
            _warn_unfit(cell, xs.shape[0], xs.shape[1])
        else:
            from vmlmf_tpu.ops.pallas_scan import TileOverflowError

            interp = _use_interpret()
            try:
                if fxi is not None:
                    src = jnp.flip(xs, axis=0) if reverse else xs

                    def gxin_fn(stream, *rest):
                        return gru_scan_fused_xin(stream, *rest, mode=mode,
                                                  interpret=interp)

                    ys = shard_batch_kernel(
                        gxin_fn, src, fxi + (uf, prz, pn), (state0,), 0)
                else:
                    gi = cell.inp(prep, xs)
                    if reverse:
                        gi = jnp.flip(gi, axis=0)

                    def ggi_fn(stream, *rest):
                        return gru_scan_fused(stream, *rest, mode=mode,
                                              interpret=interp)

                    ys = shard_batch_kernel(
                        ggi_fn, gi, (uf, prz, pn), (state0,), 0)
            except TileOverflowError:
                _warn_unfit(cell, xs.shape[0], xs.shape[1])
            else:
                h_last = ys[-1]
                if reverse:
                    ys = jnp.flip(ys, axis=0)
                return ys, h_last

    gi = cell.inp(prep, xs)  # [T, B, G*h] — hoisted, time-parallel

    def body(state, gi_t):
        state, out = cell.step(prep, gi_t, state)
        return state, out

    state, ys = jax.lax.scan(body, state0, gi, reverse=reverse, unroll=unroll)
    return ys, state


@dataclasses.dataclass(frozen=True)
class RNN:
    """A stack of cells (one per layer), mirroring `MyLSTM` (`vmlmf.py:241-316`).

    ``cells`` is a tuple of Cell instances; layer i consumes layer i-1's
    hidden sequence.  Dropout between layers is the caller's concern (the
    reference HAR wrapper declares-but-never-applies dropout, `vmlmf.py:268`;
    the LM model applies it between layers at the model level).
    """

    cells: tuple
    unroll: int = 1
    # Production backends: "xla" | "pallas" (fused whole-scan kernel — the
    # fastest measured path at every depth).  RETIRED experiment knobs
    # (require VMLMF_EXPERIMENTAL_WAVEFRONT=1; measured slower than
    # per-layer "pallas" everywhere — see docs/wavefront.md): "pipelined"
    # (XLA wavefront, `ops.pipeline`) | "pallas_pipelined" (VMEM-resident
    # wavefront kernel, `ops.pallas_pipeline`).
    backend: str = "xla"
    precision: str | None = None  # fused-kernel matmul precision: f32 | bf16

    def __post_init__(self):
        _check_backend(self.backend)

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, len(self.cells))
        return [c.init(k, dtype) for c, k in zip(self.cells, keys)]

    def state0(self, batch, dtype=jnp.float32):
        return [c.state0(batch, dtype) for c in self.cells]

    def __call__(self, params, xs, states=None, *, time_major=False, reverse=False):
        """-> (ys, final_states).  ys in the same layout as xs."""
        if not time_major:
            xs = jnp.swapaxes(xs, 0, 1)
        batch = xs.shape[1]
        if states is None:
            states = self.state0(batch, xs.dtype)
        if self.backend == "pallas_pipelined" and not reverse:
            from vmlmf_tpu.ops.pallas_pipeline import run_stack_grouped

            preps = [c.prepare(p) for c, p in zip(self.cells, params)]
            prec = self.precision or os.environ.get(
                "VMLMF_PALLAS_PRECISION", "f32")
            # VMEM-resident wavefront over maximal fitting groups; per-layer
            # fused fallback for singletons / non-uniform stacks
            ys, finals = run_stack_grouped(
                self.cells, preps, xs, states,
                interpret=_use_interpret(), precision=prec)
            if not time_major:
                ys = jnp.swapaxes(ys, 0, 1)
            return ys, finals
        if self.backend == "pipelined" and not reverse:
            from vmlmf_tpu.ops.pipeline import (
                pipelined_available,
                pipelined_lstm_scan,
                warn_fallback,
            )

            preps = [c.prepare(p) for c, p in zip(self.cells, params)]
            if pipelined_available(self.cells, preps):
                ys, finals = pipelined_lstm_scan(
                    self.cells, preps, xs, states, unroll=self.unroll)
                if not time_major:
                    ys = jnp.swapaxes(ys, 0, 1)
                return ys, finals
            warn_fallback(self.cells)
        finals = []
        for cell, p, s0 in zip(self.cells, params, states):
            prep = cell.prepare(p)
            xs, sf = scan_layer(cell, prep, xs, s0, reverse=reverse,
                                unroll=self.unroll, backend=self.backend,
                                precision=self.precision)
            finals.append(sf)
        if not time_major:
            xs = jnp.swapaxes(xs, 0, 1)
        return xs, finals

    def last_hidden_concat(self, finals):
        """Concat of last hidden states across layers (`vmlmf.py:316`)."""
        return jnp.concatenate([c.out_of(s) for c, s in zip(self.cells, finals)], -1)
