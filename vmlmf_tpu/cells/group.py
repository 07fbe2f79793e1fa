"""Group/block-structured compressed cells.

Capability parity with:
  * `MyVMLMFCellg2` — group VMLMF LSTM
    (`/root/reference/rnn_compression_factorization_vmlmf/src/models/vmlmf_group.py:37-155`)
    and its LM twin `MyVMLSTMGroup` (`vmlmf_lm.py:53-174`),
  * `MyVMLMFgCellg2` — the same minus vm/corrections, the ablation cell
    (`vmlmf_group.py:158-251`)  -> ``use_vm=False``,
  * legacy `myLSTMGroupCell`
    (`/root/reference/rnn_compression_factorization/src/module/compressed_lstm.py:287-422`)
    -> `LSTMGroupCell` below (dense-or-shared-low-rank input side, group
    recurrent side, no vm terms).

Structure: the hidden state is split into ``g`` groups of ``h/g``.  Rotation
tier ``i`` (i = 0..g-1) holds factors ``u_i [g, h/g, r_i]``, ``v_i [g, r_i,
G*(h/g)]``; output group ``p`` attends to input group ``(p+i) % g`` with rank
``r_i``.  The reference realizes each tier as an index-rotation plus two bmms
per Python-loop iteration (`vmlmf_group.py:121-132`); here each tier is one
batched einsum contraction over a rolled view, and the rotation-0 diagonal
correction is a weight-only rowsum hoisted into ``prepare()``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vmlmf_tpu.cells.base import Cell, lstm_update, normal_init, pad_features
from vmlmf_tpu.ops.lowrank import (
    gate_diag_rowsum,
    group_diag_rowsum,
    group_lowrank_proj,
    lowrank_proj,
)


def _group_rec(h, u_tiers, v_tiers, g, num_gates):
    """Sum of all rotation tiers -> [..., G*h] in gate-major layout."""
    k = h.shape[-1] // g
    h_g = h.reshape(*h.shape[:-1], g, k)
    acc = None
    for i in range(g):
        rolled = jnp.roll(h_g, -i, axis=-2) if i else h_g  # pos p reads group (p+i)%g
        t = group_lowrank_proj(rolled, u_tiers[i], v_tiers[i])  # [..., g, G*k]
        acc = t if acc is None else acc + t
    # [..., g, G, k] -> [..., G, g, k] -> [..., G*h] (gate-major, groups concat)
    acc = acc.reshape(*acc.shape[:-1], num_gates, k)
    acc = jnp.swapaxes(acc, -3, -2)
    return acc.reshape(*acc.shape[:-3], num_gates * g * k)


@dataclasses.dataclass(frozen=True)
class VMLMFGroupCell(Cell):
    """Group VMLMF LSTM; ``use_vm=False`` gives the no-vm ablation cell."""

    w_rank: int = 8
    u_ranks: tuple = (2, 4)
    groups: int = 2
    use_vm: bool = True

    def __post_init__(self):
        assert len(self.u_ranks) == self.groups, "one rank per rotation tier"
        assert self.hidden_size % self.groups == 0

    def init(self, key, dtype=jnp.float32):
        n, h, g = self.input_size, self.hidden_size, self.groups
        k = h // g
        ks = jax.random.split(key, 6 + 2 * g)
        p = {
            "u_x": normal_init(ks[0], (n, self.w_rank), dtype=dtype),
            "v_x": normal_init(ks[1], (4 * h, self.w_rank), dtype=dtype),
            # biases are ones in the group cell (`vmlmf_group.py:78-79`)
            "b_x": jnp.ones((4 * h,), dtype),
            "b_h": jnp.ones((4 * h,), dtype),
        }
        if self.use_vm:
            p["d_x"] = normal_init(ks[2], (n,), dtype=dtype)
            p["d_h"] = normal_init(ks[3], (h,), dtype=dtype)
        for i, r in enumerate(self.u_ranks):
            p[f"u_h_{i}"] = normal_init(ks[4 + 2 * i], (g, k, r), dtype=dtype)
            p[f"v_h_{i}"] = normal_init(ks[5 + 2 * i], (g, r, 4 * k), dtype=dtype)
        return p

    def _tiers(self, prep):
        return (
            [prep[f"u_h_{i}"] for i in range(self.groups)],
            [prep[f"v_h_{i}"] for i in range(self.groups)],
        )

    def prepare(self, params):
        prep = dict(params)
        if self.use_vm:
            h = self.hidden_size
            prep["dcorr_x"] = pad_features(
                gate_diag_rowsum(params["u_x"], params["v_x"], 4, h), h
            )
            # diagonal of the rotation-0 block matrix (`vmlmf_group.py:101-110`)
            prep["dcorr_h"] = group_diag_rowsum(params["u_h_0"], params["v_h_0"], 4)
        return prep

    def inp(self, prep, xs):
        h = self.hidden_size
        y = lowrank_proj(xs, prep["u_x"], prep["v_x"]).reshape(*xs.shape[:-1], 4, h)
        if self.use_vm:
            xp = pad_features(xs, h)
            y = y - xp[..., None, :] * prep["dcorr_x"]
            y = y + pad_features(prep["d_x"] * xs, h)[..., None, :]
        y = y + (prep["b_x"] + prep["b_h"]).reshape(4, h)
        return y.reshape(*xs.shape[:-1], 4 * h)

    def step(self, prep, gi_t, state):
        h_prev, c = state
        hdim = self.hidden_size
        u_t, v_t = self._tiers(prep)
        gr = _group_rec(h_prev, u_t, v_t, self.groups, 4)
        if self.use_vm:
            gr = gr.reshape(*gr.shape[:-1], 4, hdim)
            gr = gr + h_prev[..., None, :] * (prep["d_h"] - prep["dcorr_h"])
            gr = gr.reshape(*gr.shape[:-2], 4 * hdim)
        h_next, c_next = lstm_update(gi_t + gr, c)
        return (h_next, c_next), h_next

    def fused_rec_inputs(self, prep):
        """(u, v, dvec) for the fused Pallas scan, via the dense-materialized
        recurrent matrix.

        TPU trade-off: the block/group factorization saves *parameters*, not
        recurrent bandwidth, at HAR/LM sizes — so the fused path materializes
        the [h, 4h] dense equivalent once per training step (weight-only,
        outside the scan) and keeps it VMEM-resident across all timesteps,
        instead of running g rolled contractions per step.
        """
        from vmlmf_tpu.ops.lowrank import dense_from_group

        u_t, v_t = self._tiers(prep)
        w = dense_from_group(u_t, v_t, 4, self.hidden_size).T  # [h, 4h]
        if self.use_vm:
            dvec = (prep["d_h"][None, :] - prep["dcorr_h"]).reshape(-1)
        else:
            dvec = jnp.zeros((4 * self.hidden_size,), w.dtype)
        return w, None, dvec

    def fused_x_inputs(self, prep):
        """(ux, vx, xdvec, bias) for the x-fused Pallas scan — the group
        cell's input side is the shared low-rank VMLMF path."""
        h = self.hidden_size
        if self.use_vm:
            xdvec = pad_features(prep["d_x"], h)[None, :] - prep["dcorr_x"]
        else:
            xdvec = jnp.zeros((4, h), jnp.float32)
        return prep["u_x"], prep["v_x"].T, xdvec, prep["b_x"] + prep["b_h"]


@dataclasses.dataclass(frozen=True)
class LSTMGroupCell(Cell):
    """Legacy group-low-rank LSTM (`compressed_lstm.py:287-422`): dense or
    shared-low-rank input side, group-rotated recurrent side, no vm terms.

    ``shuffle=True`` covers the reference's ``isShuffle`` option
    (`compressed_lstm.py:404-420`) — mixing state channels across groups
    between steps.  The reference draws a *fresh unseeded* ``randperm`` per
    timestep, and a different one for ``h`` than for ``c``, which makes the
    two state tensors channel-inconsistent and the mixing untrainable noise;
    here the intent is realized as the deterministic ShuffleNet-style group
    interleave (reshape ``[g, h/g]`` → transpose → flatten), applied
    identically to ``h`` and ``c`` — compile-time free and seed-stable."""

    w_rank: int | None = None
    u_ranks: tuple = (2, 4)
    groups: int = 2
    shuffle: bool = False

    def __post_init__(self):
        assert len(self.u_ranks) == self.groups
        assert self.hidden_size % self.groups == 0

    def init(self, key, dtype=jnp.float32):
        n, h, g = self.input_size, self.hidden_size, self.groups
        k = h // g
        ks = jax.random.split(key, 3 + 2 * g)
        p = {"b": jnp.ones((4 * h,), dtype)}
        if self.w_rank is None:
            p["w"] = normal_init(ks[0], (n, 4 * h), dtype=dtype)
        else:
            p["w_fac"] = normal_init(ks[0], (n, self.w_rank), dtype=dtype)
            p["w_proj"] = normal_init(ks[1], (self.w_rank, 4 * h), dtype=dtype)
        for i, r in enumerate(self.u_ranks):
            p[f"u_h_{i}"] = normal_init(ks[2 + 2 * i], (g, k, r), dtype=dtype)
            p[f"v_h_{i}"] = normal_init(ks[3 + 2 * i], (g, r, 4 * k), dtype=dtype)
        return p

    def inp(self, prep, xs):
        if self.w_rank is None:
            y = xs @ prep["w"]
        else:
            y = (xs @ prep["w_fac"]) @ prep["w_proj"]
        return y + prep["b"]

    def _interleave(self, x):
        g, k = self.groups, self.hidden_size // self.groups
        x = x.reshape(*x.shape[:-1], g, k)
        return jnp.swapaxes(x, -2, -1).reshape(*x.shape[:-2], g * k)

    def step(self, prep, gi_t, state):
        h_prev, c = state
        u_t = [prep[f"u_h_{i}"] for i in range(self.groups)]
        v_t = [prep[f"v_h_{i}"] for i in range(self.groups)]
        gr = _group_rec(h_prev, u_t, v_t, self.groups, 4)
        h_next, c_next = lstm_update(gi_t + gr, c)
        if self.shuffle:
            h_next = self._interleave(h_next)
            c_next = self._interleave(c_next)
        return (h_next, c_next), h_next

    def fused_rec_inputs(self, prep):
        """Dense-materialized recurrent matrix for the fused Pallas scan
        (see `VMLMFGroupCell.fused_rec_inputs` for the trade-off).  The
        shuffle variant has per-step state permutations the kernel doesn't
        model — it falls back to the XLA scan."""
        if self.shuffle:
            return None
        from vmlmf_tpu.ops.lowrank import dense_from_group

        u_t = [prep[f"u_h_{i}"] for i in range(self.groups)]
        v_t = [prep[f"v_h_{i}"] for i in range(self.groups)]
        w = dense_from_group(u_t, v_t, 4, self.hidden_size).T
        return w, None, jnp.zeros((4 * self.hidden_size,), w.dtype)

    def fused_x_inputs(self, prep):
        """(ux, vx, xdvec, bias) for the x-fused Pallas scan (no vm terms)."""
        zeros = jnp.zeros((4, self.hidden_size), jnp.float32)
        if self.w_rank is None:
            return prep["w"], None, zeros, prep["b"]
        return prep["w_fac"], prep["w_proj"], zeros, prep["b"]
