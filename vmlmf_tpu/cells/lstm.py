"""Vanilla and plain-low-rank (LMF) LSTM cells.

Capability parity with `MyLSTMCell`
(`/root/reference/rnn_compression_factorization_vmlmf/src/models/vmlmf.py:127-238`)
and the LM dense layer (`vmlmf_lm.py:283-339`): an uncompressed LSTM, or one
whose stacked gate matrices are factored as ``W = U_f V_f`` (shared factor
across the four gates, separate per-gate projections — stored here as one
``[r, 4h]`` projection, which is the same parameterization with the gate
blocks concatenated).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vmlmf_tpu.cells.base import Cell, lstm_update, normal_init


@dataclasses.dataclass(frozen=True)
class LSTMCell(Cell):
    """LSTM with optionally low-rank input/recurrent stacked gate matrices.

    w_rank / u_rank None => dense (the "mylstm" baseline model).
    """

    w_rank: int | None = None
    u_rank: int | None = None

    def init(self, key, dtype=jnp.float32):
        n, h = self.input_size, self.hidden_size
        ks = jax.random.split(key, 5)
        p = {}
        if self.w_rank is None:
            p["w"] = normal_init(ks[0], (n, 4 * h), dtype=dtype)
        else:
            p["w_fac"] = normal_init(ks[0], (n, self.w_rank), dtype=dtype)
            p["w_proj"] = normal_init(ks[1], (self.w_rank, 4 * h), dtype=dtype)
        if self.u_rank is None:
            p["u"] = normal_init(ks[2], (h, 4 * h), dtype=dtype)
        else:
            p["u_fac"] = normal_init(ks[2], (h, self.u_rank), dtype=dtype)
            p["u_proj"] = normal_init(ks[3], (self.u_rank, 4 * h), dtype=dtype)
        # per-gate biases initialized to ones (`vmlmf.py:183-186`)
        p["b"] = jnp.ones((4 * h,), dtype)
        return p

    def inp(self, prep, xs):
        if self.w_rank is None:
            y = xs @ prep["w"]
        else:
            y = (xs @ prep["w_fac"]) @ prep["w_proj"]
        return y + prep["b"]

    def step(self, prep, gi_t, state):
        h, c = state
        if self.u_rank is None:
            gr = h @ prep["u"]
        else:
            gr = (h @ prep["u_fac"]) @ prep["u_proj"]
        h_next, c_next = lstm_update(gi_t + gr, c)
        return (h_next, c_next), h_next

    def fused_rec_inputs(self, prep):
        """(u, v, dvec) for the fused Pallas scan (dvec unused -> zeros)."""
        zeros = jnp.zeros((4 * self.hidden_size,), jnp.float32)
        if self.u_rank is None:
            return prep["u"], None, zeros
        return prep["u_fac"], prep["u_proj"], zeros

    def fused_x_inputs(self, prep):
        """(ux, vx, xdvec, bias) for the x-fused Pallas scan (xdvec unused
        -> zeros; the LSTM input path has no elementwise diagonal term)."""
        zeros = jnp.zeros((4, self.hidden_size), jnp.float32)
        if self.w_rank is None:
            return prep["w"], None, zeros, prep["b"]
        return prep["w_fac"], prep["w_proj"], zeros, prep["b"]

    def pipeline_units(self, prep):
        """Factor spec for the wavefront stack scan (ops.pipeline).

        Only the fully factored (LMF) parameterization batches with the
        other layers' low-rank units; dense cells fall back to the
        sequential schedule.
        """
        if self.w_rank is None or self.u_rank is None:
            return None
        zeros = jnp.zeros((4, self.hidden_size), prep["b"].dtype)
        return {
            "u_x": prep["w_fac"], "v_x": prep["w_proj"], "d_x": zeros,
            "bias": prep["b"],
            "u_h": prep["u_fac"], "v_h": prep["u_proj"], "d_h": zeros,
        }

    def dense_w(self, params):
        """[4h, n] stacked input matrix (oracle for parity tests)."""
        if self.w_rank is None:
            return params["w"].T
        return (params["w_fac"] @ params["w_proj"]).T

    def dense_u(self, params):
        if self.u_rank is None:
            return params["u"].T
        return (params["u_fac"] @ params["u_proj"]).T
