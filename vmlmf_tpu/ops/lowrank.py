"""Low-rank / diagonal-correction primitives of the VMLMF math.

The VMLMF parameterization represents each stacked gate weight matrix
``W_eff in [G*h, n]`` (G gates of size ``h`` over an ``n``-dim input) as

    W_eff[g*h + j, i] = (V U^T)[g*h + j, i]  -  delta_{ij} * (V U^T)[g*h + j, j]
                        (+ delta_{ij} * d[j]  via the separate "vm" vector)

i.e. a rank-r factorization whose *diagonal* (per gate block) is explicitly
removed and replaced by a learned vector ``d``.  The reference re-slices
``U * V[gate]`` per gate per timestep inside its Python time loop
(`/root/reference/rnn_compression_factorization_vmlmf/src/models/vmlmf.py:102-106`).
Everything in this module is *weight-only*: it is computed once per training
step (outside the `lax.scan` over time) and closed over by the recurrence.

All projections here keep the batched input on the left so XLA tiles them
onto the MXU as plain `[M, K] @ [K, N]` matmuls with M = batch (x time).
"""

from __future__ import annotations

import jax.numpy as jnp


def lowrank_proj(x, u, v):
    """``x @ (V U^T)^T = (x @ U) @ V^T`` without materializing the dense matrix.

    x: [..., n]; u: [n, r]; v: [G*h, r]  ->  [..., G*h]

    Mirrors the two chained matmuls of the reference cell
    (`vmlmf.py:98-99`), batched over arbitrary leading dims so the caller can
    fold time into the batch dimension (the input path of the recurrence is
    time-parallel).
    """
    return (x @ u) @ v.T


def gate_diag_rowsum(u, v, num_gates, hidden_size):
    """Per-gate diagonal of the low-rank product, via the rowsum identity.

    diag_g[j] = sum_r u[j, r] * v[g*h + j, r]   for j < min(n, h)

    u: [n, r]; v: [G*h, r]  ->  [G, m] with m = min(n, h).

    This is the weight-only reduction behind the reference's per-timestep
    "vm_refined" correction loop (`vmlmf.py:102-106`): the correction applied
    to a batch vector x is simply ``x[:, :m] * diag_g`` broadcast per gate.
    """
    m = min(u.shape[0], hidden_size)
    v_g = v.reshape(num_gates, hidden_size, v.shape[-1])  # [G, h, r]
    return jnp.einsum("jr,gjr->gj", u[:m], v_g[:, :m, :])  # [G, m]


def group_lowrank_proj(h_bgk, u, v):
    """One rotation tier of the block/group low-rank recurrent product.

    h_bgk: [B, g, h/g] (already rotated); u: [g, h/g, r]; v: [g, r, M]
    -> [B, g, M]

    One batched contraction per tier replaces the reference's
    transpose + bmm + bmm + transpose chain (`vmlmf_group.py:121-132`).
    """
    return jnp.einsum("bgk,gkr,grm->bgm", h_bgk, u, v)


def group_diag_rowsum(u0, v0, num_gates):
    """Diagonal of the rotation-0 group recurrent matrix, per gate.

    u0: [g, h/g, r]; v0: [g, r, G*(h/g)]  ->  [G, h]

    At rotation 0, group ``p`` of the hidden state feeds output group ``p``,
    so the diagonal of gate ``k``'s weight lives in rows ``k*(h/g):(k+1)*(h/g)``
    of each group's output block.  Weight-only analog of
    `vmlmf_group.py:101-110`.
    """
    g, k, r = u0.shape
    v0_g = v0.reshape(g, r, num_gates, k)  # [g, r, G, h/g]
    d = jnp.einsum("pjr,prkj->kpj", u0, v0_g)  # [G, g, h/g]
    return d.reshape(num_gates, g * k)


def dense_from_lowrank(u, v, num_gates, hidden_size, d=None, subtract_diag=True):
    """Materialize the dense stacked gate matrix (test oracle only).

    Returns W_eff with shape [G*h, n]: ``V U^T`` with its per-gate diagonal
    removed (if ``subtract_diag``) and the learned vector ``d`` scattered onto
    the diagonal (if given).  This is the matrix the compressed cell is
    algebraically equivalent to; production code never builds it.
    """
    n = u.shape[0]
    w = v @ u.T  # [G*h, n]
    m = min(n, hidden_size)
    w = w.reshape(num_gates, hidden_size, n)
    eye = jnp.zeros((hidden_size, n)).at[jnp.arange(m), jnp.arange(m)].set(1.0)
    if subtract_diag:
        diag = jnp.einsum("ghn,hn->gh", w, eye)  # per-gate diagonal entries
        w = w - diag[:, :, None] * eye[None]
    if d is not None:
        dvec = jnp.zeros((hidden_size,)).at[jnp.arange(m)].set(d.reshape(-1)[:m])
        w = w + dvec[None, :, None] * eye[None]
    return w.reshape(num_gates * hidden_size, n)


def dense_from_group(u_tiers, v_tiers, num_gates, hidden_size):
    """Dense recurrent matrix of the group/block cell (test oracle only).

    u_tiers[i]: [g, h/g, r_i]; v_tiers[i]: [g, r_i, G*(h/g)].
    Rotation tier ``i`` places the factor of output-group ``p`` against
    input-group ``(p + i) % g``.  Returns [G*h, h] in gate-major layout where
    gate k rows are the concatenation over groups of each group's k-th output
    block.
    """
    g = u_tiers[0].shape[0]
    k = hidden_size // g
    w = jnp.zeros((num_gates, g, k, hidden_size))  # [G, out-group, h/g, h_in]
    for i, (u, v) in enumerate(zip(u_tiers, v_tiers)):
        for p in range(g):
            q = (p + i) % g  # input group index feeding output group p
            blk = (u[p] @ v[p]).T  # [G*h/g, h/g] : out rows, in cols
            blk = blk.reshape(num_gates, k, k)
            w = w.at[:, p, :, q * k : (q + 1) * k].add(blk)
    return w.reshape(num_gates, g * k, hidden_size).reshape(num_gates * hidden_size, hidden_size)
