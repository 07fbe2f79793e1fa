"""Pipeline parallelism: one recurrent layer per device, wavefront over ICI.

The reference is strictly single-device (SURVEY.md §2.3); this is a
from-scratch TPU scaling strategy for deep uniform stacks.  The single-chip
wavefront schedule (`ops/pipeline.py`) cannot beat the sequential schedule on
one core — every matmul serializes on the one MXU — but across a mesh axis it
becomes true pipeline parallelism: device ``l`` owns layer ``l``'s factors and
processes timestep ``s - l`` at wavefront step ``s``, so L MXUs run
concurrently, with a single [B, h] `ppermute` hop per step riding the ICI
ring.  Serial latency drops from ``L·T`` cell-steps on one chip to
``T + L - 1`` pipeline beats.

Expressed as `shard_map` over the mesh's ``model`` axis (composable with a
``data`` axis batch-sharding on the same mesh: each stage then runs its local
batch rows).  XLA lowers the `ppermute` to ICI sends; there is no hand-rolled
transport.  Gradients flow through `ppermute`'s transpose (the reverse
permutation), so the whole thing sits under `jax.grad` for training.

Requirements are the same as the single-chip wavefront: uniform LSTM-family
cells exposing `pipeline_units(prep)` (equal hidden sizes and factor ranks),
and the number of layers must equal the mesh axis size.

Known inefficiency (deliberate, documented): the hoisted layer-0 input
projection gi0 [S, B, 4h] enters the shard_map replicated across the pipe
axis although only stage 0 reads it — layer 0's input width n0 generally
differs from h, so its x-path factors cannot join the uniform stacked
params.  Costs (L-1) redundant copies of gi0; acceptable next to the
recurrent state traffic, revisit if profiling says otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vmlmf_tpu.cells.base import lstm_update
from vmlmf_tpu.parallel.compat import shard_map


def stack_pipeline_params(cells, preps):
    """Stack per-layer pipeline units into leading-L arrays (shard on the
    pipe axis).  Layer 0's x-path factors are placeholders (its input path is
    the hoisted `inp` projection); they keep the stacked shapes uniform."""
    from vmlmf_tpu.ops.pipeline import _units

    units = _units(cells, preps)
    assert units is not None, "stack not pipelineable (see pipelined_available)"
    u0 = units[1]  # shape template for layer 0's unused x-unit
    first = {
        "u_x": jnp.zeros_like(u0["u_x"]), "v_x": jnp.zeros_like(u0["v_x"]),
        "d_x": jnp.zeros_like(u0["d_x"]), "bias": jnp.zeros_like(u0["bias"]),
        "u_h": units[0]["u_h"], "v_h": units[0]["v_h"], "d_h": units[0]["d_h"],
    }
    rows = [first] + units[1:]
    return {k: jnp.stack([r[k] for r in rows]) for k in rows[0]}


def _stage_scan(stacked, gi0, h0, c0, *, t_len, n_stage, axis, hidden,
                dropout_rate, keys):
    """Per-device program under shard_map.  Local shapes: stacked[k]: [1, ...],
    gi0: [S, B, 4h] (only read on stage 0), h0/c0: [1, B, h], keys: [S, 2]."""
    l = jax.lax.axis_index(axis)
    ux, vx = stacked["u_x"][0], stacked["v_x"][0]
    dx, bias = stacked["d_x"][0], stacked["bias"][0]
    uh, vh, dh = stacked["u_h"][0], stacked["v_h"][0], stacked["d_h"][0]
    batch = h0.shape[1]
    perm = [(i, i + 1) for i in range(n_stage - 1)]
    use_drop = dropout_rate > 0.0
    keep = 1.0 - dropout_rate

    def gate_input(xin, gi_t):
        def from_prev(_):
            y = (xin @ ux) @ vx
            y = (y.reshape(batch, 4, hidden) + xin[:, None, :] * dx)
            return y.reshape(batch, 4 * hidden) + bias

        return jax.lax.cond(l == 0, lambda _: gi_t, from_prev, None)

    def body(carry, inp):
        h, c, xin = carry
        gi_t, s, key = inp
        pre = gate_input(xin, gi_t)
        gr = (h @ uh) @ vh
        gr = (gr.reshape(batch, 4, hidden) + h[:, None, :] * dh)
        pre = pre + gr.reshape(batch, 4 * hidden)
        h_new, c_new = lstm_update(pre, c)
        valid = jnp.logical_and(s >= l, s < t_len + l)
        h = jnp.where(valid, h_new, h)
        c = jnp.where(valid, c_new, c)
        send = h
        if use_drop:
            mask = jax.random.bernoulli(
                jax.random.fold_in(key, l), keep, send.shape)
            send = send * mask.astype(send.dtype) / keep
        xin = jax.lax.ppermute(send, axis, perm)
        return (h, c, xin), h

    xin0 = jnp.zeros((batch, hidden), h0.dtype)
    (h, c, _), ys = jax.lax.scan(
        body, (h0[0], c0[0], xin0),
        (gi0, jnp.arange(gi0.shape[0]), keys))
    return ys[None], h[None], c[None]


def pipeline_parallel_scan(cells, preps, xs, states0, mesh, *, axis="model",
                           dropout_rate=0.0, rng=None):
    """Run a uniform stack with layer l on device l of `mesh[axis]`.

    xs: time-major [T, B, n0] (B may be sharded on the mesh's data axis).
    states0: list of per-layer (h, c).  -> (ys [T, B, h], finals).
    """
    n_stage = mesh.shape[axis]
    L = len(cells)
    assert L == n_stage, (
        f"pipeline needs layers == mesh '{axis}' size; got {L} layers on "
        f"{n_stage} devices")
    T, B = xs.shape[0], xs.shape[1]
    hidden = cells[0].hidden_size
    S = T + L - 1

    stacked = stack_pipeline_params(cells, preps)
    gi0 = cells[0].inp(preps[0], xs)  # hoisted: one time-parallel MXU matmul
    gi0 = jnp.concatenate(
        [gi0, jnp.zeros((L - 1, B, 4 * hidden), gi0.dtype)], axis=0)
    hs0 = jnp.stack([s[0] for s in states0])
    cs0 = jnp.stack([s[1] for s in states0])
    if rng is not None and dropout_rate > 0.0:
        keys = jax.random.split(rng, S)
    else:
        keys = jnp.zeros((S, 2), jnp.uint32)
        dropout_rate = 0.0

    pspec = P(axis)

    def wrapped(stacked, gi0, hs0, cs0, keys):
        return _stage_scan(stacked, gi0, hs0, cs0, t_len=T, n_stage=n_stage,
                           axis=axis, hidden=hidden,
                           dropout_rate=dropout_rate, keys=keys)

    batch_axis = "data" if "data" in mesh.axis_names else None
    bspec = P(None, batch_axis, None)
    ys, h_end, c_end = shard_map(
        wrapped, mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: pspec, stacked),
                  bspec, P(axis, batch_axis, None), P(axis, batch_axis, None),
                  P()),
        out_specs=(P(axis, None, batch_axis, None),
                   P(axis, batch_axis, None), P(axis, batch_axis, None)),
    )(stacked, gi0, hs0, cs0, keys)
    ys_last = ys[L - 1, L - 1:]
    finals = [(h_end[l], c_end[l]) for l in range(L)]
    return ys_last, finals
