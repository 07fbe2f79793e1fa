"""Numerical-correctness oracles for every cell in the zoo.

The reference's tests only assert shapes (`unit_test.py:63-93`).  Here every
compressed cell is additionally checked against an explicit *dense
reconstruction* of the weight matrix it factorizes — the oracle the reference
implicitly depends on but never tests:

    W_eff = V U^T - scatter(per-gate diag)  (+ diag(d) on the vm path)

computed in fp32 with `vmlmf_tpu.ops.lowrank.dense_from_*`, and the cell step
must match a plain dense-LSTM/GRU step through W_eff to ~1e-5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmlmf_tpu.cells import (
    DiagonalLSTMCell,
    DualDiagonalLSTMCell,
    GRUCell,
    GRUGroupCell,
    LSTMCell,
    LSTMGroupCell,
    VMLMFCell,
    VMLMFGroupCell,
)
from vmlmf_tpu.cells.base import lstm_update, pad_features
from vmlmf_tpu.ops.lowrank import dense_from_group, dense_from_lowrank

KEY = jax.random.PRNGKey(0)
B = 7


def _rand_state(cell, key):
    k1, k2 = jax.random.split(key)
    h = jax.random.normal(k1, (B, cell.hidden_size))
    c = jax.random.normal(k2, (B, cell.hidden_size))
    return h, c


def _rand_x(cell, key):
    return jax.random.normal(key, (B, cell.input_size))


def _dense_lstm_step(w_eff, u_eff, bias, x, h, c, extra=0.0):
    """Plain dense LSTM step: pre = x W^T + h U^T + b (+ extra)."""
    pre = x @ w_eff.T + h @ u_eff.T + bias + extra
    return lstm_update(pre, c)


class TestVMLMFCell:
    @pytest.mark.parametrize("n,h", [(77, 180), (9, 180), (64, 64), (180, 80)])
    def test_matches_dense_reconstruction(self, n, h):
        cell = VMLMFCell(n, h, w_rank=8, u_rank=6)
        params = cell.init(KEY)
        x = _rand_x(cell, jax.random.PRNGKey(1))
        h0, c0 = _rand_state(cell, jax.random.PRNGKey(2))

        (h1, c1), out = cell.apply_step(params, x, (h0, c0))

        # dense oracle: W_eff has diag removed, learned d scattered on diag
        w_eff = dense_from_lowrank(params["u_x"], params["v_x"], 4, h, d=params["d_x"])
        u_eff = dense_from_lowrank(params["u_h"], params["v_h"], 4, h, d=params["d_h"])
        bias = params["b_x"] + params["b_h"]
        h1d, c1d = _dense_lstm_step(w_eff, u_eff, bias, x, h0, c0)

        np.testing.assert_allclose(h1, h1d, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(c1, c1d, atol=2e-5, rtol=2e-5)

    def test_inp_step_decomposition_matches_unhoisted(self):
        """Hoisted input path + scan step == computing everything per-step."""
        cell = VMLMFCell(77, 180, w_rank=8, u_rank=6)
        params = cell.init(KEY)
        xs = jax.random.normal(jax.random.PRNGKey(3), (5, B, 77))  # [T,B,n]
        prep = cell.prepare(params)
        gi = cell.inp(prep, xs)
        state = cell.state0(B)
        outs = []
        for t in range(5):
            state, o = cell.step(prep, gi[t], state)
            outs.append(o)
        state2 = cell.state0(B)
        for t in range(5):
            state2, o2 = cell.apply_step(params, xs[t], state2)
            np.testing.assert_allclose(outs[t], o2, atol=1e-6)


class TestLSTMCell:
    @pytest.mark.parametrize("wr,ur", [(None, None), (8, 6)])
    def test_matches_dense(self, wr, ur):
        cell = LSTMCell(77, 180, w_rank=wr, u_rank=ur)
        params = cell.init(KEY)
        x = _rand_x(cell, jax.random.PRNGKey(1))
        h0, c0 = _rand_state(cell, jax.random.PRNGKey(2))
        (h1, c1), _ = cell.apply_step(params, x, (h0, c0))
        h1d, c1d = _dense_lstm_step(
            cell.dense_w(params), cell.dense_u(params), params["b"], x, h0, c0
        )
        np.testing.assert_allclose(h1, h1d, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(c1, c1d, atol=2e-5, rtol=2e-5)


class TestVMLMFGroupCell:
    @pytest.mark.parametrize("n,h,g,ranks", [(77, 180, 2, (2, 4)), (9, 64, 4, (3, 2, 2, 1))])
    def test_matches_dense(self, n, h, g, ranks):
        cell = VMLMFGroupCell(n, h, w_rank=8, u_ranks=ranks, groups=g)
        params = cell.init(KEY)
        x = _rand_x(cell, jax.random.PRNGKey(1))
        h0, c0 = _rand_state(cell, jax.random.PRNGKey(2))
        (h1, c1), _ = cell.apply_step(params, x, (h0, c0))

        w_eff = dense_from_lowrank(params["u_x"], params["v_x"], 4, h, d=params["d_x"])
        u_dense = dense_from_group(
            [params[f"u_h_{i}"] for i in range(g)],
            [params[f"v_h_{i}"] for i in range(g)],
            4, h,
        )
        # group cell subtracts only the rotation-0 diagonal and adds d_h
        m = jnp.arange(h)
        u_dense = u_dense.reshape(4, h, h)
        # tiers i>0 contribute to the diagonal only if they map a group onto
        # itself, which never happens for i in 1..g-1; so the dense diagonal
        # equals the tier-0 diagonal the cell subtracts.  Replace it with d_h.
        u_eff = u_dense.at[:, m, m].set(params["d_h"][None, :]).reshape(4 * h, h)
        bias = params["b_x"] + params["b_h"]
        h1d, c1d = _dense_lstm_step(w_eff, u_eff, bias, x, h0, c0)
        np.testing.assert_allclose(h1, h1d, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(c1, c1d, atol=2e-5, rtol=2e-5)

    def test_ablation_no_vm(self):
        """use_vm=False: plain group LMF, no diag terms at all."""
        g, h = 2, 64
        cell = VMLMFGroupCell(32, h, w_rank=8, u_ranks=(2, 4), groups=g, use_vm=False)
        params = cell.init(KEY)
        x = _rand_x(cell, jax.random.PRNGKey(1))
        h0, c0 = _rand_state(cell, jax.random.PRNGKey(2))
        (h1, c1), _ = cell.apply_step(params, x, (h0, c0))
        w_eff = dense_from_lowrank(params["u_x"], params["v_x"], 4, h, subtract_diag=False)
        u_eff = dense_from_group(
            [params["u_h_0"], params["u_h_1"]], [params["v_h_0"], params["v_h_1"]], 4, h
        )
        bias = params["b_x"] + params["b_h"]
        h1d, c1d = _dense_lstm_step(w_eff, u_eff, bias, x, h0, c0)
        np.testing.assert_allclose(h1, h1d, atol=2e-5, rtol=2e-5)


class TestLSTMGroupCell:
    def test_matches_dense(self):
        g, h = 2, 64
        cell = LSTMGroupCell(32, h, w_rank=9, u_ranks=(12, 6), groups=g)
        params = cell.init(KEY)
        x = _rand_x(cell, jax.random.PRNGKey(1))
        h0, c0 = _rand_state(cell, jax.random.PRNGKey(2))
        (h1, c1), _ = cell.apply_step(params, x, (h0, c0))
        w_eff = (params["w_fac"] @ params["w_proj"]).T
        u_eff = dense_from_group(
            [params["u_h_0"], params["u_h_1"]], [params["v_h_0"], params["v_h_1"]], 4, h
        )
        h1d, c1d = _dense_lstm_step(w_eff, u_eff, params["b"], x, h0, c0)
        np.testing.assert_allclose(h1, h1d, atol=2e-5, rtol=2e-5)

    def test_shuffle_is_group_interleave(self):
        """shuffle=True permutes (h, c) identically by the deterministic
        ShuffleNet-style group interleave (reference `isShuffle`,
        `compressed_lstm.py:404-420`, realized seed-stably here)."""
        g, h = 2, 64
        base = LSTMGroupCell(32, h, u_ranks=(12, 6), groups=g)
        shuf = LSTMGroupCell(32, h, u_ranks=(12, 6), groups=g, shuffle=True)
        params = base.init(KEY)
        x = _rand_x(base, jax.random.PRNGKey(1))
        h0, c0 = _rand_state(base, jax.random.PRNGKey(2))
        (h1, c1), _ = base.apply_step(params, x, (h0, c0))
        (h1s, c1s), out = shuf.apply_step(params, x, (h0, c0))
        perm = np.arange(h).reshape(g, h // g).T.reshape(-1)
        np.testing.assert_allclose(h1s, np.asarray(h1)[:, perm], atol=1e-6)
        np.testing.assert_allclose(c1s, np.asarray(c1)[:, perm], atol=1e-6)
        np.testing.assert_allclose(out, h1s, atol=0)  # output is the shuffled h

    def test_shuffle_falls_back_from_fused(self):
        from vmlmf_tpu.nn.recurrence import scan_layer

        cell = LSTMGroupCell(9, 32, u_ranks=(2, 2), groups=2, shuffle=True)
        params = cell.init(KEY)
        prep = cell.prepare(params)
        assert cell.fused_rec_inputs(prep) is None
        xs = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 9))
        s0 = cell.state0(3)
        ys_x, _ = scan_layer(cell, prep, xs, s0, backend="xla")
        ys_p, _ = scan_layer(cell, prep, xs, s0, backend="pallas")
        np.testing.assert_allclose(ys_p, ys_x, atol=1e-6)


class TestGRU:
    @pytest.mark.parametrize("wr,ur", [(None, None), (9, 9)])
    def test_gru_matches_dense(self, wr, ur):
        cell = GRUCell(32, 64, w_rank=wr, u_rank=ur)
        params = cell.init(KEY)
        x = _rand_x(cell, jax.random.PRNGKey(1))
        h0 = jax.random.normal(jax.random.PRNGKey(2), (B, 64))
        h1, _ = cell.apply_step(params, x, h0)

        hdim = 64
        if wr is None:
            w = params["w"]
        else:
            w = params["w_fac"] @ params["w_proj"]
        if ur is None:
            u_rz, u_n = params["u_rz"], params["u_n"]
        else:
            u_rz = params["u_fac"] @ params["u_proj_rz"]
            u_n = params["u_fac"] @ params["u_proj_n"]
        gi = x @ w + params["b"]
        rz = h0 @ u_rz
        r = jax.nn.sigmoid(gi[:, :hdim] + rz[:, :hdim])
        z = jax.nn.sigmoid(gi[:, hdim : 2 * hdim] + rz[:, hdim:])
        n = jnp.tanh(gi[:, 2 * hdim :] + (r * h0) @ u_n)
        h1d = z * h0 + (1 - z) * n
        np.testing.assert_allclose(h1, h1d, atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize(
        "g,u_ranks",
        [(2, (12, 6)), (3, (6, 4, 2)), (4, (4, 3, 2, 1)), (5, (3, 3, 2, 2, 1)),
         (6, (4, 3, 3, 2, 2, 1))],
    )
    def test_group_gru_matches_dense(self, g, u_ranks):
        # groups 2..6 cover the legacy myGRUCell_group{2..6} zoo
        # (`compressed_gru.py:119-1079`) with the intended (bug-free) math.
        h = 60 if g in (3, 5, 6) else 64
        cell = GRUGroupCell(32, h, w_rank=9, u_ranks=u_ranks, groups=g)
        params = cell.init(KEY)
        x = _rand_x(cell, jax.random.PRNGKey(1))
        h0 = jax.random.normal(jax.random.PRNGKey(2), (B, h))
        h1, _ = cell.apply_step(params, x, h0)

        w = params["w_fac"] @ params["w_proj"]
        u_eff = dense_from_group(
            [params[f"u_h_{i}"] for i in range(g)],
            [params[f"v_h_{i}"] for i in range(g)], 3, h
        )  # [3h, h]
        gi = x @ w + params["b"]
        rec = h0 @ u_eff.T
        r = jax.nn.sigmoid(gi[:, :h] + rec[:, :h])
        z = jax.nn.sigmoid(gi[:, h : 2 * h] + rec[:, h : 2 * h])
        n = jnp.tanh(gi[:, 2 * h :] + r * rec[:, 2 * h :])  # reset after matmul
        h1d = z * h0 + (1 - z) * n
        np.testing.assert_allclose(h1, h1d, atol=2e-5, rtol=2e-5)


class TestLegacyCells:
    def test_dual_diagonal_matches_dense(self):
        cell = DualDiagonalLSTMCell(32, 64, w_rank=9, u_rank=9)
        params = cell.init(KEY)
        x = _rand_x(cell, jax.random.PRNGKey(1))
        h0, c0 = _rand_state(cell, jax.random.PRNGKey(2))
        (h1, c1), _ = cell.apply_step(params, x, (h0, c0))

        h = 64
        w = (params["w_fac"] @ params["w_proj"]).T.reshape(4, h, 32)
        u = (params["u_fac"] @ params["u_proj"]).T.reshape(4, h, h)
        m = jnp.arange(32)
        diag_w = w[:, m, m]  # [4, 32]
        mh = jnp.arange(h)
        diag_u = u[:, mh, mh]
        pre = jnp.concatenate([x @ w[g].T for g in range(4)], -1)
        pre = pre + jnp.concatenate([h0 @ u[g].T for g in range(4)], -1)
        extra_x = jnp.concatenate(
            [pad_features(x * diag_w[g], h) for g in range(4)], -1
        )
        extra_h = jnp.concatenate([h0 * diag_u[g] for g in range(4)], -1)
        pre = pre + extra_x + extra_h + params["b"]
        h1d, c1d = lstm_update(pre, c0)
        np.testing.assert_allclose(h1, h1d, atol=2e-5, rtol=2e-5)

    def test_diagonal_cell_runs(self):
        cell = DiagonalLSTMCell(32, 64)
        params = cell.init(KEY)
        x = _rand_x(cell, jax.random.PRNGKey(1))
        state = cell.state0(B)
        (h1, c1), out = cell.apply_step(params, x, state)
        assert h1.shape == (B, 64)
        assert jnp.isfinite(h1).all()


class TestParamCounts:
    """Param counts must match the reference layouts exactly (the compression
    claim depends on them; formulas per `compression_cal.py` / cell defs)."""

    def test_vmlmf_param_count(self):
        n, h, wr, ur = 77, 180, 8, 6
        cell = VMLMFCell(n, h, w_rank=wr, u_rank=ur)
        params = cell.init(KEY)
        expect = n * wr + h * ur + 4 * h * wr + 4 * h * ur + 4 * h + 4 * h + n + h
        assert cell.param_count(params) == expect

    def test_group_param_count(self):
        n, h, wr, g = 77, 180, 8, 2
        ranks = (2, 4)
        cell = VMLMFGroupCell(n, h, w_rank=wr, u_ranks=ranks, groups=g)
        params = cell.init(KEY)
        k = h // g
        expect = (
            n * wr + 4 * h * wr + 2 * 4 * h + n + h
            + sum(g * k * r + g * r * 4 * k for r in ranks)
        )
        assert cell.param_count(params) == expect

    def test_lstm_dense_equals_4_gate_layout(self):
        n, h = 77, 180
        cell = LSTMCell(n, h)
        params = cell.init(KEY)
        # reference: 4×[n,h] + 4×[h,h] + 4×[1,h] (`vmlmf.py:151-186`)
        assert cell.param_count(params) == 4 * n * h + 4 * h * h + 4 * h
