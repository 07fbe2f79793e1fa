"""Legacy ablation cells: dual-diagonal (proto-VMLMF) and diagonal-only.

Capability parity with
`/root/reference/rnn_compression_factorization/src/module/compressed_lstm.py`:
  * `myDualDiagonalLSTMCell` (:22-81) — the 2020 predecessor of VMLMF: gates
    are ``x W_g + pad(diag(W_g) ⊙ x) + h U_g + diag(U_g) ⊙ h + b`` where
    ``W_g = W W_g'`` may be low-rank.  The diagonal is *added on top of* the
    full product (not subtracted out as in the 2021 cell) — historically this
    is the design the diag-correction of VMLMF later fixed.  The diagonals of
    the factored matrices are computed with the weight-only rowsum identity,
    never materializing the dense product.
  * `myDiagonalLSTMCell` (:85-152) — diagonal-weights-only ablation.  The
    reference's forward multiplies the *input* by the recurrent diagonal
    (`compressed_lstm.py:129-132` uses ``x`` where ``h`` is intended); this
    implementation realizes the intended recurrence (divergence documented).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vmlmf_tpu.cells.base import Cell, lstm_update, normal_init, pad_features
from vmlmf_tpu.ops.lowrank import gate_diag_rowsum


@dataclasses.dataclass(frozen=True)
class DualDiagonalLSTMCell(Cell):
    w_rank: int | None = None
    u_rank: int | None = None

    def init(self, key, dtype=jnp.float32):
        n, h = self.input_size, self.hidden_size
        ks = jax.random.split(key, 4)
        p = {"b": jnp.ones((4 * h,), dtype)}
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
        return p

    def _diag_w(self, params):
        """Per-gate diagonal of the (possibly factored) input matrix: [4, m]."""
        h = self.hidden_size
        if self.w_rank is None:
            w = params["w"]  # [n, 4h]
            m = min(self.input_size, h)
            return jnp.stack([jnp.diagonal(w[:, g * h : (g + 1) * h]) for g in range(4)])
        # rowsum identity on factors (w_fac [n,r] @ w_proj [r,4h])
        return gate_diag_rowsum(params["w_fac"], params["w_proj"].T, 4, h)

    def _diag_u(self, params):
        h = self.hidden_size
        if self.u_rank is None:
            u = params["u"]
            return jnp.stack([jnp.diagonal(u[:, g * h : (g + 1) * h]) for g in range(4)])
        return gate_diag_rowsum(params["u_fac"], params["u_proj"].T, 4, h)

    def prepare(self, params):
        prep = dict(params)
        prep["diag_w"] = pad_features(self._diag_w(params), self.hidden_size)  # [4, h]
        prep["diag_u"] = self._diag_u(params)  # [4, h]
        return prep

    def inp(self, prep, xs):
        h = self.hidden_size
        if self.w_rank is None:
            y = xs @ prep["w"]
        else:
            y = (xs @ prep["w_fac"]) @ prep["w_proj"]
        y = y.reshape(*xs.shape[:-1], 4, h)
        xp = pad_features(xs, h)
        y = y + xp[..., None, :] * prep["diag_w"]  # diagonal ADDED (proto-VMLMF)
        y = y + prep["b"].reshape(4, h)
        return y.reshape(*xs.shape[:-1], 4 * h)

    def step(self, prep, gi_t, state):
        h_prev, c = state
        hdim = self.hidden_size
        if self.u_rank is None:
            gr = h_prev @ prep["u"]
        else:
            gr = (h_prev @ prep["u_fac"]) @ prep["u_proj"]
        gr = gr.reshape(*gr.shape[:-1], 4, hdim)
        gr = gr + h_prev[..., None, :] * prep["diag_u"]
        h_next, c_next = lstm_update(gi_t + gr.reshape(*gr.shape[:-2], 4 * hdim), c)
        return (h_next, c_next), h_next

    def fused_rec_inputs(self, prep):
        """(u, v, dvec): recurrence is h @ U + h ⊙ diag_u (diag ADDED)."""
        dvec = prep["diag_u"].reshape(-1)
        if self.u_rank is None:
            return prep["u"], None, dvec
        return prep["u_fac"], prep["u_proj"], dvec

    def fused_x_inputs(self, prep):
        """(ux, vx, xdvec, bias) for the x-fused Pallas scan: the input-side
        diagonal is ADDED on top of the product (proto-VMLMF)."""
        if self.w_rank is None:
            return prep["w"], None, prep["diag_w"], prep["b"]
        return prep["w_fac"], prep["w_proj"], prep["diag_w"], prep["b"]


@dataclasses.dataclass(frozen=True)
class DiagonalLSTMCell(Cell):
    """Diagonal-weights-only LSTM (extreme-compression ablation).

    Gate pre-activations are elementwise: ``pre_g = pad(dw_g ⊙ x) + du_g ⊙ h + b_g``.
    Init constants mirror the reference fills (0.1321 input / 0.1231 recurrent,
    `compressed_lstm.py:100-103`).

    Documented divergences from `myDiagonalLSTMCell` (`compressed_lstm.py:85-152`),
    whose forward is broken two ways: (a) it multiplies **x** by the recurrent
    diagonal (`uVal = x.squeeze()*diagonal(U)`, :130-133 — h never enters the
    recurrence), and (b) its `isdiagonal=False` "block-diagonal" option only
    changes the *init* of full matrices whose off-diagonals the forward never
    reads (`torch.diagonal`, :124-133).  This cell implements the intended
    math (diagonal recurrence over h); the block-structured capability lives
    in the group cells (`cells/group.py`), where off-diagonal blocks actually
    participate.
    """

    def init(self, key, dtype=jnp.float32):
        n, h = self.input_size, self.hidden_size
        m = min(n, h)
        del key  # constant init in the reference
        return {
            "dw": jnp.full((4, m), 0.1321, dtype),
            "du": jnp.full((4, h), 0.1231, dtype),
            "b": jnp.ones((4 * h,), dtype),
        }

    def inp(self, prep, xs):
        h = self.hidden_size
        xm = pad_features(xs, h)
        dw = pad_features(prep["dw"], h)
        y = xm[..., None, :] * dw + prep["b"].reshape(4, h)
        return y.reshape(*xs.shape[:-1], 4 * h)

    def step(self, prep, gi_t, state):
        h_prev, c = state
        hdim = self.hidden_size
        gr = h_prev[..., None, :] * prep["du"]
        pre = gi_t + gr.reshape(*gr.shape[:-2], 4 * hdim)
        h_next, c_next = lstm_update(pre, c)
        return (h_next, c_next), h_next
