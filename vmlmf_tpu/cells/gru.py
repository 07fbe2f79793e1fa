"""GRU cells: vanilla, shared-factor low-rank, and group-rotated variants.

Capability parity with the legacy GRU zoo
(`/root/reference/rnn_compression_factorization/src/module/compressed_gru.py`):
  * `myGRUCell` (:22-117) — dense or shared-low-rank GRU where the candidate
    recurrent term applies the reset gate *before* the matmul,
  * `myGRUCell_group{2..6}` (:119-1079) — group-rotated recurrent factors,
    generalized here to a single parametric ``groups`` instead of five
    copy-pasted classes (the reference g5/g6 classes contain copy-paste bugs
    reusing the wrong rotation buffer, `compressed_gru.py:795-797,1020-1022`;
    this implementation realizes the intended math).  In the group variant the
    reset gate multiplies the *output* of the candidate matmul
    (`compressed_gru.py:245`), which is a genuinely different (and
    scan-friendlier) formulation than the vanilla cell — both are kept.

Gate order standardized to (r, z, n).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from vmlmf_tpu.cells.base import Cell, normal_init
from vmlmf_tpu.cells.group import _group_rec


def _gru_combine(r_pre, z_pre, n_pre, h):
    r = jax.nn.sigmoid(r_pre)
    z = jax.nn.sigmoid(z_pre)
    n = jnp.tanh(n_pre)
    return r, z, z * h + (1.0 - z) * n


@dataclasses.dataclass(frozen=True)
class GRUCell(Cell):
    """GRU; candidate term is ``(r*h) @ U3`` (reset before matmul)."""

    w_rank: int | None = None
    u_rank: int | None = None

    num_gates = 3

    def init(self, key, dtype=jnp.float32):
        n, h = self.input_size, self.hidden_size
        ks = jax.random.split(key, 6)
        p = {"b": jnp.ones((3 * h,), dtype)}  # biases ones (`compressed_gru.py:76-78`)
        if self.w_rank is None:
            p["w"] = normal_init(ks[0], (n, 3 * h), dtype=dtype)
        else:
            p["w_fac"] = normal_init(ks[0], (n, self.w_rank), dtype=dtype)
            p["w_proj"] = normal_init(ks[1], (self.w_rank, 3 * h), dtype=dtype)
        if self.u_rank is None:
            p["u_rz"] = normal_init(ks[2], (h, 2 * h), dtype=dtype)
            p["u_n"] = normal_init(ks[3], (h, h), dtype=dtype)
        else:
            # shared factor across r/z/n (`compressed_gru.py:71-74`)
            p["u_fac"] = normal_init(ks[2], (h, self.u_rank), dtype=dtype)
            p["u_proj_rz"] = normal_init(ks[3], (self.u_rank, 2 * h), dtype=dtype)
            p["u_proj_n"] = normal_init(ks[4], (self.u_rank, h), dtype=dtype)
        return p

    def state0(self, batch, dtype=jnp.float32):
        return jnp.zeros((batch, self.hidden_size), dtype)

    def out_of(self, state):
        return state

    def inp(self, prep, xs):
        if self.w_rank is None:
            y = xs @ prep["w"]
        else:
            y = (xs @ prep["w_fac"]) @ prep["w_proj"]
        return y + prep["b"]

    def fused_rec_inputs_gru(self, prep):
        """(u_f, p_rz, p_n, mode) for the fused Pallas GRU scan (ops/pallas_gru)."""
        if self.u_rank is None:
            return None, prep["u_rz"], prep["u_n"], "pre"
        return prep["u_fac"], prep["u_proj_rz"], prep["u_proj_n"], "pre"

    def fused_x_inputs_gru(self, prep):
        """(ux, vx, bias) for the x-fused GRU scan."""
        if self.w_rank is None:
            return prep["w"], None, prep["b"]
        return prep["w_fac"], prep["w_proj"], prep["b"]

    def step(self, prep, gi_t, state):
        h = state
        hdim = self.hidden_size
        if self.u_rank is None:
            rz_rec = h @ prep["u_rz"]
        else:
            rz_rec = (h @ prep["u_fac"]) @ prep["u_proj_rz"]
        r_pre = gi_t[..., :hdim] + rz_rec[..., :hdim]
        z_pre = gi_t[..., hdim : 2 * hdim] + rz_rec[..., hdim:]
        r = jax.nn.sigmoid(r_pre)
        rh = r * h
        if self.u_rank is None:
            n_rec = rh @ prep["u_n"]
        else:
            n_rec = (rh @ prep["u_fac"]) @ prep["u_proj_n"]
        z = jax.nn.sigmoid(z_pre)
        n = jnp.tanh(gi_t[..., 2 * hdim :] + n_rec)
        h_next = z * h + (1.0 - z) * n
        return h_next, h_next


@dataclasses.dataclass(frozen=True)
class GRUGroupCell(Cell):
    """Group-rotated GRU; reset gate applied to the candidate matmul output
    (`matVal_c = wVal3 + r*(sum_i uVal3_i)`, `compressed_gru.py:245`)."""

    w_rank: int | None = None
    u_ranks: tuple = (2, 4)
    groups: int = 2

    num_gates = 3

    def __post_init__(self):
        assert len(self.u_ranks) == self.groups
        assert self.hidden_size % self.groups == 0

    def init(self, key, dtype=jnp.float32):
        n, h, g = self.input_size, self.hidden_size, self.groups
        k = h // g
        ks = jax.random.split(key, 2 + 2 * g)
        p = {"b": jnp.ones((3 * h,), dtype)}
        if self.w_rank is None:
            p["w"] = normal_init(ks[0], (n, 3 * h), dtype=dtype)
        else:
            p["w_fac"] = normal_init(ks[0], (n, self.w_rank), dtype=dtype)
            p["w_proj"] = normal_init(ks[1], (self.w_rank, 3 * h), dtype=dtype)
        for i, r in enumerate(self.u_ranks):
            p[f"u_h_{i}"] = normal_init(ks[2 + 2 * i], (g, k, r), dtype=dtype)
            p[f"v_h_{i}"] = normal_init(ks[3 + 2 * i], (g, r, 3 * k), dtype=dtype)
        return p

    def state0(self, batch, dtype=jnp.float32):
        return jnp.zeros((batch, self.hidden_size), dtype)

    def out_of(self, state):
        return state

    def inp(self, prep, xs):
        if self.w_rank is None:
            y = xs @ prep["w"]
        else:
            y = (xs @ prep["w_fac"]) @ prep["w_proj"]
        return y + prep["b"]

    def step(self, prep, gi_t, state):
        h = state
        hdim = self.hidden_size
        u_t = [prep[f"u_h_{i}"] for i in range(self.groups)]
        v_t = [prep[f"v_h_{i}"] for i in range(self.groups)]
        rec = _group_rec(h, u_t, v_t, self.groups, 3)  # [..., 3h]
        r = jax.nn.sigmoid(gi_t[..., :hdim] + rec[..., :hdim])
        z = jax.nn.sigmoid(gi_t[..., hdim : 2 * hdim] + rec[..., hdim : 2 * hdim])
        n = jnp.tanh(gi_t[..., 2 * hdim :] + r * rec[..., 2 * hdim :])
        h_next = z * h + (1.0 - z) * n
        return h_next, h_next

    def fused_rec_inputs_gru(self, prep):
        """Dense-materialized recurrent matrix for the fused Pallas GRU scan
        (mode='post': reset scales the candidate matmul output).  Same
        trade-off as `VMLMFGroupCell.fused_rec_inputs`: the group structure
        saves parameters, not recurrent bandwidth, at these sizes — the
        [h, 3h] dense equivalent is built once per step-function call
        (weight-only, hoisted out of the scan) and stays VMEM-resident."""
        from vmlmf_tpu.ops.lowrank import dense_from_group

        u_t = [prep[f"u_h_{i}"] for i in range(self.groups)]
        v_t = [prep[f"v_h_{i}"] for i in range(self.groups)]
        h = self.hidden_size
        w = dense_from_group(u_t, v_t, 3, h).T  # [h, 3h], (r, z, n) gate-major
        return None, w[:, : 2 * h], w[:, 2 * h :], "post"

    def fused_x_inputs_gru(self, prep):
        """(ux, vx, bias) for the x-fused GRU scan."""
        if self.w_rank is None:
            return prep["w"], None, prep["b"]
        return prep["w_fac"], prep["w_proj"], prep["b"]
