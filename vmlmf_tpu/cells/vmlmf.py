"""The VMLMF cell: low-rank factorization + learned diagonal, diag-corrected.

Capability parity with `MyVMLMFCell`
(`/root/reference/rnn_compression_factorization_vmlmf/src/models/vmlmf.py:38-125`)
and the LM variant `MyVMLSTM` (`vmlmf_lm.py:178-280`).  The two reference
variants are algebraically the same cell — the LM file tiles the vm vector
x4 via concat (`vmlmf_lm.py:241-244`) where the HAR file broadcast-adds it to
each gate (`vmlmf.py:117-120`); both add the identical per-gate term.  One
cell covers both here.

Math per gate g (stacked over G=4 gates):

    pre_g = (x U_x) V_x[g]^T - x ⊙ rowdiag_g(U_x, V_x) + b_x[g]     (input side)
          + (h U_h) V_h[g]^T - h ⊙ rowdiag_g(U_h, V_h) + b_h[g]     (recurrent)
          + pad(d_x ⊙ x) + d_h ⊙ h                                  ("vm" terms)

TPU redesign vs the reference implementation:
  * the per-gate "vm_refined" correction loop (`vmlmf.py:102-106`) re-reduces
    `U * V[gate]` every timestep; `rowdiag` is weight-only, so `prepare()`
    computes it once per training step,
  * the full input side (first line) is time-parallel and computed for all
    timesteps as one batched MXU matmul in `inp()`,
  * only the second+third lines run inside `lax.scan` (`step()`).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

from vmlmf_tpu.cells.base import Cell, lstm_update, normal_init, pad_features
from vmlmf_tpu.ops.lowrank import gate_diag_rowsum, lowrank_proj


def _dense_rec(hidden_size):
    """Whether the fused kernel should run the recurrence through a
    materialized dense [h, 4h] matrix (one MXU op per step) instead of the
    factored h@U, (hU)@V pair (two dependent ops).

    The dense product is weight-only (built once per train step, gradients
    flow through the materialization); it halves the serial MXU chain and
    drops the [T, B, r] rank-activation residual, at the cost of more MACs
    per step.  Measured on v5e: NO win anywhere — HAR demo h=180 on the
    x-fused kernel: 669k dense vs 679k factored seq/s (the two dependent
    rank-r matmuls pipeline well enough that the chain is not the
    bottleneck); PTB h=650 w300: 324k vs 366k wps (throughput-bound, the
    factored chain's ~1.7x fewer MACs dominate).  Kept as an experiment
    knob: VMLMF_PALLAS_DENSE_REC=1; default factored.
    """
    env = os.environ.get("VMLMF_PALLAS_DENSE_REC")
    if env is not None:
        return env == "1"
    return False


@dataclasses.dataclass(frozen=True)
class VMLMFCell(Cell):
    w_rank: int = 8
    u_rank: int = 8

    def init(self, key, dtype=jnp.float32):
        n, h = self.input_size, self.hidden_size
        ks = jax.random.split(key, 8)
        # layout mirrors `vmlmf.py:56-69` (U: [n,r]; V: [4h,r]; biases 0.1*randn;
        # learned diagonal vectors d_x, d_h)
        return {
            "u_x": normal_init(ks[0], (n, self.w_rank), dtype=dtype),
            "u_h": normal_init(ks[1], (h, self.u_rank), dtype=dtype),
            "v_x": normal_init(ks[2], (4 * h, self.w_rank), dtype=dtype),
            "v_h": normal_init(ks[3], (4 * h, self.u_rank), dtype=dtype),
            "b_x": normal_init(ks[4], (4 * h,), dtype=dtype),
            "b_h": normal_init(ks[5], (4 * h,), dtype=dtype),
            "d_x": normal_init(ks[6], (n,), dtype=dtype),
            "d_h": normal_init(ks[7], (h,), dtype=dtype),
        }

    def prepare(self, params):
        h = self.hidden_size
        prep = dict(params)
        # weight-only per-gate diagonals, padded to [4, h] so step/inp are
        # single fused multiply-adds with no dynamic slicing
        dcx = gate_diag_rowsum(params["u_x"], params["v_x"], 4, h)  # [4, m]
        prep["dcorr_x"] = pad_features(dcx, h)
        prep["dcorr_h"] = gate_diag_rowsum(params["u_h"], params["v_h"], 4, h)
        return prep

    def inp(self, prep, xs):
        h = self.hidden_size
        y = lowrank_proj(xs, prep["u_x"], prep["v_x"])  # [..., 4h]
        y = y.reshape(*y.shape[:-1], 4, h)
        xp = pad_features(xs, h)  # x over min(n,h) features, zero-padded
        y = y - xp[..., None, :] * prep["dcorr_x"]  # remove double-counted diag
        y = y + pad_features(prep["d_x"] * xs, h)[..., None, :]  # vm term, all gates
        y = y + (prep["b_x"] + prep["b_h"]).reshape(4, h)  # b_h is also time-invariant
        return y.reshape(*y.shape[:-2], 4 * h)

    def step(self, prep, gi_t, state):
        h_prev, c = state
        hdim = self.hidden_size
        gr = lowrank_proj(h_prev, prep["u_h"], prep["v_h"])
        gr = gr.reshape(*gr.shape[:-1], 4, hdim)
        gr = gr + h_prev[..., None, :] * (prep["d_h"] - prep["dcorr_h"])
        pre = gi_t + gr.reshape(*gr.shape[:-2], 4 * hdim)
        h_next, c_next = lstm_update(pre, c)
        return (h_next, c_next), h_next

    def fused_rec_inputs(self, prep):
        """(u, v, dvec) for the fused Pallas scan: recurrence is
        h @ (u_h v_hᵀ) + h ⊙ (d_h - dcorr_h) per gate — factored, or
        materialized dense for small cells (see `_dense_rec`)."""
        dvec = (prep["d_h"][None, :] - prep["dcorr_h"]).reshape(-1)
        if _dense_rec(self.hidden_size):
            return prep["u_h"] @ prep["v_h"].T, None, dvec
        return prep["u_h"], prep["v_h"].T, dvec

    def fused_x_inputs(self, prep):
        """(ux, vx, xdvec, bias) for the x-fused Pallas scan (the in-kernel
        equivalent of `inp`): gi = (x@u_x)@v_xᵀ + tile4(pad(x)) ⊙ (pad(d_x)
        − dcorr_x) + (b_x + b_h)."""
        h = self.hidden_size
        xdvec = pad_features(prep["d_x"], h)[None, :] - prep["dcorr_x"]
        return prep["u_x"], prep["v_x"].T, xdvec, prep["b_x"] + prep["b_h"]

    def pipeline_units(self, prep):
        """Factor/epilogue spec for the wavefront stack scan (ops.pipeline).

        Both paths are ``in @ U @ V + in ⊙ D`` per gate; the x-path also
        carries the (time-invariant) bias sum.  The x-unit is only consumed
        when this cell sits above another layer (input_size == hidden_size).
        """
        h = self.hidden_size
        d_x = pad_features(prep["d_x"], h)[None, :] - prep["dcorr_x"]  # [4, h]
        d_h = prep["d_h"][None, :] - prep["dcorr_h"]
        return {
            "u_x": prep["u_x"], "v_x": prep["v_x"].T, "d_x": d_x,
            "bias": prep["b_x"] + prep["b_h"],
            "u_h": prep["u_h"], "v_h": prep["v_h"].T, "d_h": d_h,
        }
