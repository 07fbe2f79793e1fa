"""Fused multi-layer wavefront Pallas kernel (`ops/pallas_pipeline.py`):
numerical parity with the sequential XLA schedule, forward and backward.

The kernel reschedules the whole LSTM stack as a block staircase inside one
`pallas_call`; the math must be identical to running each layer's scan to
completion before the next (`nn/recurrence.py`) — same adds in the same
per-gate association, so tolerances are f32-level.  Runs in Pallas interpret
mode on CPU (`nn.recurrence._use_interpret`); the compiled path is exercised
on real TPU hardware by `scripts/bench_lm_backends.py`.

The backend is a RETIRED experiment knob (measured slower than per-layer
'pallas' at every depth — docs/wavefront.md); these parity tests keep the
kept artifact honest and must opt in explicitly.
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
from vmlmf_tpu.ops.pallas_pipeline import lstm_stack_scan_fused, stack_units


def _stack(cell_cls, sizes, **kw):
    return tuple(
        cell_cls(sizes[i], sizes[i + 1], **kw) for i in range(len(sizes) - 1)
    )


class TestStackKernelParity:
    @pytest.mark.parametrize("layers", [2, 3])
    def test_vmlmf_matches_sequential(self, layers):
        sizes = (5,) + (12,) * layers  # layer 0 input 5 != hidden (pad path)
        cells = _stack(VMLMFCell, sizes, w_rank=4, u_rank=4)
        rnn_seq = RNN(cells, backend="xla")
        rnn_fused = RNN(cells, backend="pallas_pipelined")
        params = rnn_seq.init(jax.random.PRNGKey(0))
        preps = [c.prepare(p) for c, p in zip(cells, params)]
        assert stack_units(cells, preps) is not None  # not vacuous
        xs = jax.random.normal(jax.random.PRNGKey(1), (7, 3, 5))
        ys_a, fin_a = rnn_seq(params, xs, time_major=True)
        ys_b, fin_b = rnn_fused(params, xs, time_major=True)
        np.testing.assert_allclose(ys_a, ys_b, atol=1e-5, rtol=1e-5)
        for (ha, ca), (hb, cb) in zip(fin_a, fin_b):
            np.testing.assert_allclose(ha, hb, atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(ca, cb, atol=1e-5, rtol=1e-5)

    def test_unequal_ranks_supported(self):
        # unlike the XLA wavefront (one stacked bmm), per-layer operands mean
        # mixed ranks stack fine here
        cells = (
            VMLMFCell(10, 10, w_rank=3, u_rank=5),
            VMLMFCell(10, 10, w_rank=4, u_rank=2),
        )
        params = [c.init(jax.random.PRNGKey(i)) for i, c in enumerate(cells)]
        preps = [c.prepare(p) for c, p in zip(cells, params)]
        assert stack_units(cells, preps) is not None
        xs = jax.random.normal(jax.random.PRNGKey(1), (6, 2, 10))
        ys_a, _ = RNN(cells, backend="xla")(params, xs, time_major=True)
        ys_b, _ = RNN(cells, backend="pallas_pipelined")(params, xs, time_major=True)
        np.testing.assert_allclose(ys_a, ys_b, atol=1e-5, rtol=1e-5)

    def test_lowrank_lstm_matches_sequential(self):
        cells = _stack(LSTMCell, (12, 12, 12), w_rank=4, u_rank=4)
        params = RNN(cells).init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (5, 2, 12))
        ys_a, _ = RNN(cells, backend="xla")(params, xs, time_major=True)
        ys_b, _ = RNN(cells, backend="pallas_pipelined")(params, xs, time_major=True)
        np.testing.assert_allclose(ys_a, ys_b, atol=1e-5, rtol=1e-5)

    def test_gradients_match(self):
        cells = _stack(VMLMFCell, (6, 10, 10), w_rank=3, u_rank=3)
        rnn_seq = RNN(cells, backend="xla")
        rnn_fused = RNN(cells, backend="pallas_pipelined")
        params = rnn_seq.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (5, 2, 6))

        def loss(rnn):
            def fn(p):
                ys, fin = rnn(p, xs, time_major=True)
                return (jnp.sum(ys ** 2)
                        + sum(jnp.sum(h * h) + jnp.sum(jnp.cos(c)) for h, c in fin))
            return fn

        g_a = jax.grad(loss(rnn_seq))(params)
        g_b = jax.grad(loss(rnn_fused))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_a),
                        jax.tree_util.tree_leaves(g_b)):
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)

    def test_nonzero_initial_state_carries(self):
        cells = _stack(VMLMFCell, (10, 10, 10), w_rank=3, u_rank=3)
        params = RNN(cells).init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (6, 2, 10))
        states = [
            (jax.random.normal(jax.random.PRNGKey(10 + i), (2, 10)),
             jax.random.normal(jax.random.PRNGKey(20 + i), (2, 10)))
            for i in range(len(cells))
        ]
        ys_a, fin_a = RNN(cells, backend="xla")(params, xs, states, time_major=True)
        ys_b, fin_b = RNN(cells, backend="pallas_pipelined")(
            params, xs, [tuple(s) for s in states], time_major=True)
        np.testing.assert_allclose(ys_a, ys_b, atol=1e-5, rtol=1e-5)
        for (ha, ca), (hb, cb) in zip(fin_a, fin_b):
            np.testing.assert_allclose(ha, hb, atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(ca, cb, atol=1e-5, rtol=1e-5)

    def test_masked_path_matches_manual_reference(self):
        """Inter-layer dropout masks inside the kernel == applying the same
        masks between sequential per-layer scans."""
        cells = _stack(VMLMFCell, (10, 10, 10, 10), w_rank=3, u_rank=3)
        params = [c.init(jax.random.PRNGKey(i)) for i, c in enumerate(cells)]
        preps = [c.prepare(p) for c, p in zip(cells, params)]
        layers = stack_units(cells, preps)
        t, b, h = 6, 3, 10
        xs = jax.random.normal(jax.random.PRNGKey(1), (t, b, h))
        masks = [
            (jax.random.bernoulli(jax.random.PRNGKey(40 + i), 0.6, (t, b, h))
             / 0.6).astype(jnp.float32)
            for i in range(len(cells) - 1)
        ]
        h0s = [jnp.zeros((b, h)) for _ in cells]
        c0s = [jnp.zeros((b, h)) for _ in cells]

        def fused(ps):
            preps = [c.prepare(p) for c, p in zip(cells, ps)]
            lys = stack_units(cells, preps)
            gi0 = cells[0].inp(preps[0], xs)
            ys, hl, cl = lstm_stack_scan_fused(gi0, lys, h0s, c0s, masks,
                                               interpret=True)
            return ys, hl, cl

        def manual(ps):
            from vmlmf_tpu.nn.recurrence import scan_layer
            x = xs
            hl, cl = [], []
            for i, (cell, p) in enumerate(zip(cells, ps)):
                prep = cell.prepare(p)
                if i > 0:
                    x = x * masks[i - 1]
                x, (hf, cf) = scan_layer(cell, prep, x, (h0s[i], c0s[i]))
                hl.append(hf)
                cl.append(cf)
            return x, hl, cl

        ys_a, hl_a, cl_a = fused(params)
        ys_b, hl_b, cl_b = manual(params)
        np.testing.assert_allclose(ys_a, ys_b, atol=1e-5, rtol=1e-5)
        for a, b_ in zip(hl_a + cl_a, hl_b + cl_b):
            np.testing.assert_allclose(a, b_, atol=1e-5, rtol=1e-5)

        def loss(fn):
            def f(ps):
                ys, hl, cl = fn(ps)
                return jnp.sum(ys ** 2) + sum(jnp.sum(h) for h in hl)
            return f

        g_a = jax.grad(loss(fused))(params)
        g_b = jax.grad(loss(manual))(params)
        for a, b_ in zip(jax.tree_util.tree_leaves(g_a),
                         jax.tree_util.tree_leaves(g_b)):
            np.testing.assert_allclose(a, b_, atol=1e-4, rtol=1e-4)

    def test_fallback_nonuniform_stack(self):
        # mismatched hidden sizes -> per-layer "pallas" fallback, still correct
        cells = _stack(VMLMFCell, (8, 8, 12), w_rank=2, u_rank=2)
        params = RNN(cells).init(jax.random.PRNGKey(0))
        preps = [c.prepare(p) for c, p in zip(cells, params)]
        assert stack_units(cells, preps) is None
        xs = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 8))
        import vmlmf_tpu.ops.pipeline as pipe_mod

        pipe_mod._warned.clear()
        with pytest.warns(UserWarning, match="uniform LSTM-family stack"):
            ys_b, _ = RNN(cells, backend="pallas_pipelined")(
                params, xs, time_major=True)
        ys_a, _ = RNN(cells, backend="xla")(params, xs, time_major=True)
        np.testing.assert_allclose(ys_a, ys_b, atol=1e-5, rtol=1e-5)


class TestGroupedStack:
    """Depth past the VMEM bound runs as chained resident groups
    (`stack_groups` / `run_stack_grouped`) instead of falling back
    per-layer wholesale — the r2-VERDICT depth-bound fix."""

    def test_stack_groups_partitions_under_budget(self, monkeypatch):
        from vmlmf_tpu.ops.pallas_pipeline import stack_fits, stack_groups

        cells = _stack(VMLMFCell, (64,) * 5, w_rank=16, u_rank=16)
        params = RNN(cells).init(jax.random.PRNGKey(0))
        preps = [c.prepare(p) for c, p in zip(cells, params)]
        layers = stack_units(cells, preps)
        assert stack_fits(layers)  # tiny stack: one resident group
        assert stack_groups(layers) == [(0, 4)]
        # starve VMEM so only pairs fit -> two wavefront groups
        monkeypatch.setenv("VMLMF_VMEM_BYTES", str(13 << 20))
        assert not stack_fits(layers)
        groups = stack_groups(layers)
        assert groups == [(0, 2), (2, 4)]
        # starve further -> all singletons (per-layer kernel)
        monkeypatch.setenv("VMLMF_VMEM_BYTES", str(4 << 20))
        assert stack_groups(layers) == [(0, 1), (1, 2), (2, 3), (3, 4)]

    @pytest.mark.parametrize("vmem_mb", [16, 4])
    def test_grouped_matches_sequential(self, vmem_mb, monkeypatch):
        cells = _stack(VMLMFCell, (5,) + (64,) * 4, w_rank=8, u_rank=8)
        rnn_seq = RNN(cells, backend="xla")
        params = rnn_seq.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (6, 3, 5))
        ys_a, fin_a = rnn_seq(params, xs, time_major=True)
        monkeypatch.setenv("VMLMF_VMEM_BYTES", str(vmem_mb << 20))
        ys_b, fin_b = RNN(cells, backend="pallas_pipelined")(
            params, xs, time_major=True)
        np.testing.assert_allclose(ys_a, ys_b, atol=1e-5, rtol=1e-5)
        for (ha, ca), (hb, cb) in zip(fin_a, fin_b):
            np.testing.assert_allclose(ha, hb, atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(ca, cb, atol=1e-5, rtol=1e-5)

    def test_grouped_gradients_match(self, monkeypatch):
        cells = _stack(VMLMFCell, (8,) + (32,) * 4, w_rank=4, u_rank=4)
        rnn_seq = RNN(cells, backend="xla")
        params = rnn_seq.init(jax.random.PRNGKey(0))
        xs = jax.random.normal(jax.random.PRNGKey(1), (5, 2, 8))
        w_out = jax.random.normal(jax.random.PRNGKey(2), (5, 2, 32))

        def loss(params, xs, backend):
            ys, _ = RNN(cells, backend=backend)(params, xs, time_major=True)
            return jnp.sum(ys * w_out)

        g_a = jax.grad(loss, argnums=(0, 1))(params, xs, "xla")
        monkeypatch.setenv("VMLMF_VMEM_BYTES", str(8 << 20))
        g_b = jax.grad(loss, argnums=(0, 1))(params, xs, "pallas_pipelined")
        for a, b in zip(jax.tree_util.tree_leaves(g_a),
                        jax.tree_util.tree_leaves(g_b)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=3e-4, rtol=3e-4)


class TestLMModelPallasPipelined:
    def _model(self, backend):
        return LMModel(
            vocab_size=50, hidden_size=16, num_layers=2,
            cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=6, u_rank=6),
            dropout_rate=0.5, winit=0.05, backend=backend,
        )

    def test_eval_matches_xla_backend(self):
        m_a, m_b = self._model("xla"), self._model("pallas_pipelined")
        params = m_a.init(jax.random.PRNGKey(0))
        states = m_a.state0(4)
        ids = jax.random.randint(jax.random.PRNGKey(1), (9, 4), 0, 50)
        logits_a, st_a = m_a.apply(params, ids, states, train=False)
        logits_b, st_b = m_b.apply(params, ids, states, train=False)
        np.testing.assert_allclose(logits_a, logits_b, atol=1e-5, rtol=1e-5)
        for (ha, ca), (hb, cb) in zip(st_a, st_b):
            np.testing.assert_allclose(ha, hb, atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(ca, cb, atol=1e-5, rtol=1e-5)

    def test_train_mode_runs_and_is_stochastic(self):
        m = self._model("pallas_pipelined")
        params = m.init(jax.random.PRNGKey(0))
        states = m.state0(4)
        ids = jax.random.randint(jax.random.PRNGKey(1), (9, 4), 0, 50)
        l1, _ = m.apply(params, ids, states, rng=jax.random.PRNGKey(2), train=True)
        l2, _ = m.apply(params, ids, states, rng=jax.random.PRNGKey(3), train=True)
        assert jnp.isfinite(l1).all()
        assert not jnp.allclose(l1, l2)  # dropout masks actually differ

    def test_trains_under_jit(self):
        from vmlmf_tpu.train.lm import LMTrainer

        m = self._model("pallas_pipelined")
        trainer = LMTrainer(m, batch_size=4, seq_length=9, fuse_chunks=2)
        params = trainer.init()
        states = trainer.state0()
        x = np.random.RandomState(0).randint(0, 50, (2, 9, 4))
        y = np.random.RandomState(1).randint(0, 50, (2, 9, 4))
        p, s, losses, _ = trainer._fused_chunks(
            params, states, jnp.asarray(x), jnp.asarray(y),
            jnp.float32(1.0), jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(losses)).all()
