"""Multi-layer pipelined (wavefront/staircase) recurrence.

The stacked-RNN execution in `nn.recurrence.RNN` runs layer scans
sequentially: layer l's scan cannot start until layer l-1's finishes, so the
serial dependency chain is ``L * T * 2`` MXU launches (two chained rank-r
matmuls per step).  At the reference PTB shapes (batch 20, rank 300) each
launch is latency-bound, not throughput-bound (BASELINE.md "roofline honesty
note"), so that chain IS the wall clock.

This module reschedules the stack as a wavefront: one `lax.scan` of
``T + L - 1`` steps where, at step ``s``, layer ``l`` processes its timestep
``s - l``.  Within a step the L layers' computations are mutually independent,
so their input-path and recurrent-path low-rank products batch into ONE
stacked contraction (leading "unit" dimension) — the serial chain drops to
``(T + L - 1) * 2`` matmul launches, an ~L× latency cut, while the MXU sees
(2L-1)× larger batches per launch (free when latency-bound).

The reference has no analog: its execution is a doubly nested Python loop
(`/root/reference/rnn_compression_factorization_vmlmf/src/models/vmlmf.py:300-310`).
This is a TPU-native capability addition, numerically equivalent to the
sequential schedule (same adds in the same per-gate association, modulo f32
reassociation in the fused elementwise epilogue).

Requirements: every cell is LSTM-family (tuple (h, c) state, 4 gates), all
hidden sizes equal, every cell exposes `pipeline_units(prep)` with equal
factor ranks across layers.  `pipelined_available` checks this; callers fall
back to the sequential schedule otherwise.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp

from vmlmf_tpu.cells.base import lstm_update


def warn_fallback(cells):
    """One-time warning when backend='pipelined' can't apply to a stack."""
    key = tuple(type(c).__name__ for c in cells)
    if key not in _warned:
        _warned.add(key)
        warnings.warn(
            "backend='pipelined' requires a uniform LSTM-family stack "
            "(>=2 layers, equal hidden sizes, equal factor ranks across "
            "layers); falling back to the sequential XLA schedule for "
            f"{key}", stacklevel=3)


_warned: set = set()


def _units(cells, preps):
    """Collect per-layer unit factor stacks; None if any cell can't pipeline."""
    if len(cells) < 2:
        return None
    h = cells[0].hidden_size
    for c in cells[1:]:
        if c.hidden_size != h or c.input_size != h:
            return None  # layer l >= 1 consumes the previous layer's hidden
    units = []
    for cell, prep in zip(cells, preps):
        if getattr(cell, "num_gates", None) != 4:
            return None
        fn = getattr(cell, "pipeline_units", None)
        if fn is None:
            return None
        u = fn(prep)
        if u is None:
            return None
        units.append(u)
    # uniform factor shapes (rank equality) so units stack into one bmm
    rx = {u["u_x"].shape[-1] for u in units[1:]}
    rh = {u["u_h"].shape[-1] for u in units}
    if len(rx | rh) != 1:
        return None
    return units


def pipelined_available(cells, preps):
    return _units(cells, preps) is not None


def pipelined_lstm_scan(cells, preps, xs, states0, *, dropout_rate=0.0,
                        rng=None, unroll=1):
    """Wavefront scan over a uniform LSTM-family stack.

    xs: time-major [T, B, n0].  states0: list of (h, c) per layer.
    dropout_rate/rng: inter-layer dropout (applied to layer outputs feeding
    the next layer, fresh mask per timestep — the LM `Model.forward`
    semantics, `vmlmf_lm.py:433-441`); rng None => deterministic.

    -> (ys_last [T, B, h], finals list[(h, c)])
    """
    units = _units(cells, preps)
    assert units is not None, "stack not pipelineable (see pipelined_available)"
    L = len(cells)
    T, B = xs.shape[0], xs.shape[1]
    h = cells[0].hidden_size
    dtype = xs.dtype

    # --- stacked unit factors -------------------------------------------
    # x-units: input path of layers 1..L-1 (input = previous layer's hidden);
    # h-units: recurrent path of layers 0..L-1.  One [2L-1]-unit bmm pair.
    u_all = jnp.stack([u["u_x"] for u in units[1:]]
                      + [u["u_h"] for u in units])        # [2L-1, h, r]
    v_all = jnp.stack([u["v_x"] for u in units[1:]]
                      + [u["v_h"] for u in units])        # [2L-1, r, 4h]
    d_all = jnp.stack([u["d_x"] for u in units[1:]]
                      + [u["d_h"] for u in units])        # [2L-1, 4, h]
    bias_x = jnp.stack([u["bias"] for u in units[1:]])    # [L-1, 4h]

    # layer 0's input path stays hoisted: one time-parallel MXU matmul
    gi0 = cells[0].inp(preps[0], xs)                      # [T, B, 4h]
    S = T + L - 1
    gi0 = jnp.concatenate(
        [gi0, jnp.zeros((L - 1, B, 4 * h), gi0.dtype)], axis=0)

    keep = 1.0 - dropout_rate
    use_drop = rng is not None and dropout_rate > 0.0
    step_keys = (jax.random.split(rng, S) if use_drop
                 else jnp.zeros((S, 2), jnp.uint32))

    hs0 = jnp.stack([s[0] for s in states0])              # [L, B, h]
    cs0 = jnp.stack([s[1] for s in states0])
    xin0 = jnp.zeros((L - 1, B, h), dtype)
    l_idx = jnp.arange(L)

    def body(carry, inp):
        hs, cs, xin = carry
        gi_t, s, key = inp
        ins = jnp.concatenate([xin, hs], axis=0)          # [2L-1, B, h]
        proj = jnp.einsum("ubh,uhr->ubr", ins, u_all)
        proj = jnp.einsum("ubr,urk->ubk", proj, v_all)    # [2L-1, B, 4h]
        proj = (proj.reshape(2 * L - 1, B, 4, h)
                + ins[:, :, None, :] * d_all[:, None]).reshape(2 * L - 1, B, 4 * h)
        xpre = proj[: L - 1] + bias_x[:, None, :]
        pre = jnp.concatenate([gi_t[None], xpre], axis=0) + proj[L - 1 :]
        h_new, c_new = lstm_update(pre, cs)
        # staircase edges: layer l is live for s in [l, T + l)
        valid = ((s >= l_idx) & (s < T + l_idx))[:, None, None]
        hs = jnp.where(valid, h_new, hs)
        cs = jnp.where(valid, c_new, cs)
        nxt = hs[: L - 1]
        if use_drop:
            mask = jax.random.bernoulli(key, keep, nxt.shape)
            nxt = nxt * mask.astype(nxt.dtype) / keep
        return (hs, cs, nxt), hs[L - 1]

    (hs, cs, _), outs = jax.lax.scan(
        body, (hs0, cs0, xin0), (gi0, jnp.arange(S), step_keys), unroll=unroll)
    ys = outs[L - 1 :]
    finals = [(hs[l], cs[l]) for l in range(L)]
    return ys, finals
