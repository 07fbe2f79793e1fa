"""Wavefront (pipelined) multi-layer scan: parity with the sequential schedule.

The pipelined schedule (`ops/pipeline.py`) must be numerically equivalent to
running each layer's scan to completion before the next (`nn/recurrence.py`),
including final TBPTT states and gradients — the only difference is op
scheduling.  Tolerances are f32-reassociation-level, not exact: the fused
per-gate epilogue computes ``x * (d - dcorr)`` where the sequential path
computes ``x*d - x*dcorr``.

The backend is a RETIRED experiment knob (docs/wavefront.md); parity tests
opt in explicitly.
"""

import os

os.environ.setdefault("VMLMF_EXPERIMENTAL_WAVEFRONT", "1")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmlmf_tpu.cells import LSTMCell, VMLMFCell
from vmlmf_tpu.nn.models import LMModel
from vmlmf_tpu.nn.recurrence import RNN
from vmlmf_tpu.ops.pipeline import pipelined_available


def _stack(cell_cls, sizes, **kw):
    # layer i: input = sizes[i], hidden = sizes[i+1]
    return tuple(
        cell_cls(sizes[i], sizes[i + 1], **kw) for i in range(len(sizes) - 1)
    )


class TestRetirementGate:
    def test_wavefront_backends_require_opt_in(self, monkeypatch):
        """Without VMLMF_EXPERIMENTAL_WAVEFRONT=1 the retired wavefront
        backends must refuse construction with a pointer to the negative-
        result doc; unknown backends get a distinct error."""
        monkeypatch.delenv("VMLMF_EXPERIMENTAL_WAVEFRONT", raising=False)
        cells = _stack(LSTMCell, (4, 8, 8))
        for retired in ("pipelined", "pallas_pipelined"):
            with pytest.raises(ValueError, match="docs/wavefront.md"):
                RNN(cells, backend=retired)
        with pytest.raises(ValueError, match="unknown backend"):
            RNN(cells, backend="tpu_magic")
        monkeypatch.setenv("VMLMF_EXPERIMENTAL_WAVEFRONT", "1")
        RNN(cells, backend="pipelined")  # opt-in constructs fine


def _run_both(cells, t=7, batch=3, seed=0, require_pipelined=True):
    rnn_seq = RNN(cells, backend="xla")
    rnn_pipe = RNN(cells, backend="pipelined")
    params = rnn_seq.init(jax.random.PRNGKey(seed))
    if require_pipelined:
        # guard against this test silently comparing xla against xla
        preps = [c.prepare(p) for c, p in zip(cells, params)]
        assert pipelined_available(cells, preps)
    xs = jax.random.normal(jax.random.PRNGKey(seed + 1), (t, batch, cells[0].input_size))
    ys_a, fin_a = rnn_seq(params, xs, time_major=True)
    ys_b, fin_b = rnn_pipe(params, xs, time_major=True)
    return (ys_a, fin_a), (ys_b, fin_b)


class TestPipelinedParity:
    @pytest.mark.parametrize("layers", [2, 3])
    def test_vmlmf_matches_sequential(self, layers):
        sizes = (5,) + (12,) * layers  # layer 0 input 5 != hidden (pad path)
        cells = _stack(VMLMFCell, sizes, w_rank=4, u_rank=4)
        (ys_a, fin_a), (ys_b, fin_b) = _run_both(cells)
        np.testing.assert_allclose(ys_a, ys_b, atol=1e-5, rtol=1e-5)
        for (ha, ca), (hb, cb) in zip(fin_a, fin_b):
            np.testing.assert_allclose(ha, hb, atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(ca, cb, atol=1e-5, rtol=1e-5)

    def test_lmf_lstm_matches_sequential(self):
        cells = _stack(LSTMCell, (12, 12, 12), w_rank=4, u_rank=4)
        (ys_a, fin_a), (ys_b, fin_b) = _run_both(cells)
        np.testing.assert_allclose(ys_a, ys_b, atol=1e-5, rtol=1e-5)

    def test_gradients_match(self):
        cells = _stack(VMLMFCell, (6, 10, 10), w_rank=3, u_rank=3)
        rnn_seq = RNN(cells, backend="xla")
        rnn_pipe = RNN(cells, backend="pipelined")
        params = rnn_seq.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (5, 2, 6))

        def loss(rnn):
            def fn(p):
                ys, _ = rnn(p, xs, time_major=True)
                return jnp.sum(ys**2)

            return fn

        g_a = jax.grad(loss(rnn_seq))(params)
        g_b = jax.grad(loss(rnn_pipe))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_a), jax.tree_util.tree_leaves(g_b)):
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)

    def test_fallbacks(self):
        # dense LSTM (no factor ranks) can't batch -> not available
        dense = _stack(LSTMCell, (8, 8, 8))
        preps = [c.prepare(c.init(jax.random.PRNGKey(i))) for i, c in enumerate(dense)]
        assert not pipelined_available(dense, preps)
        # unequal factor ranks can't stack into one bmm -> not available,
        # and the fallback emits a one-time warning
        uneq = _stack(VMLMFCell, (8, 8, 8), w_rank=4, u_rank=3)
        preps = [c.prepare(c.init(jax.random.PRNGKey(i))) for i, c in enumerate(uneq)]
        assert not pipelined_available(uneq, preps)
        rnn = RNN(uneq, backend="pipelined")
        params = rnn.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 8))
        import vmlmf_tpu.ops.pipeline as pipe_mod

        pipe_mod._warned.clear()
        with pytest.warns(UserWarning, match="uniform LSTM-family stack"):
            rnn(params, xs, time_major=True)
        # single layer -> not available
        one = _stack(VMLMFCell, (8, 8), w_rank=2, u_rank=2)
        preps = [one[0].prepare(one[0].init(jax.random.PRNGKey(0)))]
        assert not pipelined_available(one, preps)
        # mismatched hidden sizes -> not available, and RNN falls back cleanly
        mixed = _stack(VMLMFCell, (8, 8, 12), w_rank=2, u_rank=2)
        rnn = RNN(mixed, backend="pipelined")
        params = rnn.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 8))
        ys, _ = rnn(params, xs, time_major=True)
        assert ys.shape == (4, 2, 12)

    def test_nonzero_initial_state_carries(self):
        cells = _stack(VMLMFCell, (10, 10, 10), w_rank=3, u_rank=3)
        rnn_seq = RNN(cells, backend="xla")
        rnn_pipe = RNN(cells, backend="pipelined")
        params = rnn_seq.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (6, 2, 10))
        states = [
            (
                jax.random.normal(jax.random.PRNGKey(10 + i), (2, 10)),
                jax.random.normal(jax.random.PRNGKey(20 + i), (2, 10)),
            )
            for i in range(len(cells))
        ]
        ys_a, fin_a = rnn_seq(params, xs, states, time_major=True)
        ys_b, fin_b = rnn_pipe(params, xs, [tuple(s) for s in states], time_major=True)
        np.testing.assert_allclose(ys_a, ys_b, atol=1e-5, rtol=1e-5)
        for (ha, ca), (hb, cb) in zip(fin_a, fin_b):
            np.testing.assert_allclose(ha, hb, atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(ca, cb, atol=1e-5, rtol=1e-5)


class TestLMModelPipelined:
    def _models(self, backend):
        return LMModel(
            vocab_size=50, hidden_size=16, num_layers=2,
            cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=6, u_rank=6),
            dropout_rate=0.5, winit=0.05, backend=backend,
        )

    def test_eval_matches_xla_backend(self):
        m_a, m_b = self._models("xla"), self._models("pipelined")
        params = m_a.init(jax.random.PRNGKey(0))
        preps = [c.prepare(p) for c, p in zip(m_b.rnn.cells, params["rnn"])]
        assert pipelined_available(m_b.rnn.cells, preps)  # not vacuous
        states = m_a.state0(4)
        ids = jax.random.randint(jax.random.PRNGKey(1), (9, 4), 0, 50)
        logits_a, st_a = m_a.apply(params, ids, states, train=False)
        logits_b, st_b = m_b.apply(params, ids, states, train=False)
        np.testing.assert_allclose(logits_a, logits_b, atol=1e-5, rtol=1e-5)
        for (ha, ca), (hb, cb) in zip(st_a, st_b):
            np.testing.assert_allclose(ha, hb, atol=1e-5, rtol=1e-5)

    def test_train_mode_runs_and_is_stochastic(self):
        m = self._models("pipelined")
        params = m.init(jax.random.PRNGKey(0))
        states = m.state0(4)
        ids = jax.random.randint(jax.random.PRNGKey(1), (9, 4), 0, 50)
        l1, _ = m.apply(params, ids, states, rng=jax.random.PRNGKey(2), train=True)
        l2, _ = m.apply(params, ids, states, rng=jax.random.PRNGKey(3), train=True)
        assert jnp.isfinite(l1).all()
        assert not jnp.allclose(l1, l2)  # dropout masks actually differ

    def test_head_bf16_close_to_f32_and_trains(self):
        m0, m1 = self._models("xla"), None
        m1 = LMModel(
            vocab_size=50, hidden_size=16, num_layers=2,
            cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=6, u_rank=6),
            dropout_rate=0.5, winit=0.05, backend="xla", head_bf16=True,
        )
        params = m0.init(jax.random.PRNGKey(0))
        states = m0.state0(4)
        ids = jax.random.randint(jax.random.PRNGKey(1), (9, 4), 0, 50)
        l0, _ = m0.apply(params, ids, states, train=False)
        l1, _ = m1.apply(params, ids, states, train=False)
        assert l1.dtype == jnp.float32
        np.testing.assert_allclose(l0, l1, atol=0.05)
        g = jax.grad(lambda p: jnp.sum(m1.apply(p, ids, states, train=False)[0] ** 2))(params)
        assert all(jnp.isfinite(x).all() for x in jax.tree_util.tree_leaves(g))

    def test_trains_under_jit(self):
        from vmlmf_tpu.train.lm import LMTrainer

        m = self._models("pipelined")
        trainer = LMTrainer(m, batch_size=4, seq_length=9, fuse_chunks=2)
        params = trainer.init()
        states = trainer.state0()
        x = np.random.RandomState(0).randint(0, 50, (2, 9, 4))
        y = np.random.RandomState(1).randint(0, 50, (2, 9, 4))
        p, s, losses, _ = trainer._fused_chunks(
            params, states, jnp.asarray(x), jnp.asarray(y),
            jnp.float32(1.0), jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(losses)).all()
