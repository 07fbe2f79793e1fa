"""Fused Pallas scan kernel: forward + gradient parity vs the XLA scan path.

Runs in interpreter mode on the CPU test mesh; the same kernels compile on
TPU (exercised by bench.py and the TPU verify runs).  Forward must match the
XLA path to fp32 tolerance; the custom-VJP backward must match XLA autodiff
through the scan for every input (gi, U, V, dvec, h0, c0) — the oracle
SURVEY.md §7 calls out as hard part #1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmlmf_tpu.cells import (
    DualDiagonalLSTMCell,
    LSTMCell,
    LSTMGroupCell,
    VMLMFCell,
    VMLMFGroupCell,
)
from vmlmf_tpu.nn.recurrence import scan_layer

KEY = jax.random.PRNGKey(0)


CASES = [
    ("vmlmf", VMLMFCell(77, 180, w_rank=8, u_rank=6), 24, 9),
    ("vmlmf_sq", VMLMFCell(64, 64, w_rank=16, u_rank=16), 7, 4),
    ("lstm_dense", LSTMCell(16, 40), 5, 3),
    ("lstm_lowrank", LSTMCell(16, 40, w_rank=8, u_rank=8), 5, 3),
    ("dualdiag", DualDiagonalLSTMCell(16, 40, w_rank=8, u_rank=8), 5, 3),
    # group cells ride the fused kernel via the dense-materialized recurrent
    # matrix (weight-only, once per step — `VMLMFGroupCell.fused_rec_inputs`)
    ("vmlmf_group", VMLMFGroupCell(9, 32, w_rank=4, u_ranks=(2, 3), groups=2), 6, 3),
    ("vmlmf_group_novm", VMLMFGroupCell(9, 32, w_rank=4, u_ranks=(2, 2), groups=2,
                                        use_vm=False), 5, 3),
    ("lstm_group", LSTMGroupCell(9, 30, u_ranks=(2, 2, 2), groups=3), 5, 3),
]


@pytest.mark.parametrize("name,cell,t,b", CASES, ids=[c[0] for c in CASES])
class TestFusedScanParity:
    def _setup(self, cell, t, b):
        params = cell.init(KEY)
        xs = jax.random.normal(jax.random.PRNGKey(1), (t, b, cell.input_size))
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        h0 = 0.3 * jax.random.normal(k1, (b, cell.hidden_size))
        c0 = 0.3 * jax.random.normal(k2, (b, cell.hidden_size))
        return params, xs, (h0, c0)

    def test_forward_parity(self, name, cell, t, b):
        params, xs, s0 = self._setup(cell, t, b)
        prep = cell.prepare(params)
        ys_x, (h_x, c_x) = scan_layer(cell, prep, xs, s0, backend="xla")
        ys_p, (h_p, c_p) = scan_layer(cell, prep, xs, s0, backend="pallas")
        np.testing.assert_allclose(ys_p, ys_x, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(h_p, h_x, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(c_p, c_x, atol=2e-5, rtol=2e-5)

    def test_gradient_parity(self, name, cell, t, b):
        params, xs, s0 = self._setup(cell, t, b)
        w_out = jax.random.normal(jax.random.PRNGKey(3), (t, b, cell.hidden_size))

        def loss(params, xs, s0, backend):
            prep = cell.prepare(params)
            ys, (h, c) = scan_layer(cell, prep, xs, s0, backend=backend)
            # touch ys, final h AND final c so every cotangent path is live
            return jnp.sum(ys * w_out) + jnp.sum(jnp.tanh(h)) + 0.5 * jnp.sum(c * c)

        gx = jax.grad(loss, argnums=(0, 1, 2))(params, xs, s0, "xla")
        gp = jax.grad(loss, argnums=(0, 1, 2))(params, xs, s0, "pallas")
        for a, b_ in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gp)):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=3e-4, rtol=3e-4)

    def test_reverse_parity(self, name, cell, t, b):
        params, xs, s0 = self._setup(cell, t, b)
        prep = cell.prepare(params)
        ys_x, (h_x, c_x) = scan_layer(cell, prep, xs, s0, backend="xla", reverse=True)
        ys_p, (h_p, c_p) = scan_layer(cell, prep, xs, s0, backend="pallas", reverse=True)
        np.testing.assert_allclose(ys_p, ys_x, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(h_p, h_x, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(c_p, c_x, atol=2e-5, rtol=2e-5)


class TestBf16Precision:
    """bf16 matmul path: same recurrence within bf16 rounding tolerance."""

    def test_bf16_close_to_f32(self):
        cell = VMLMFCell(64, 64, w_rank=16, u_rank=16)
        params = cell.init(KEY)
        prep = cell.prepare(params)
        xs = jax.random.normal(jax.random.PRNGKey(1), (7, 4, 64))
        s0 = (jnp.zeros((4, 64)), jnp.zeros((4, 64)))
        ys_x, _ = scan_layer(cell, prep, xs, s0, backend="xla")
        ys_b, _ = scan_layer(cell, prep, xs, s0, backend="pallas", precision="bf16")
        np.testing.assert_allclose(ys_b, ys_x, atol=5e-3, rtol=5e-3)

    def test_bf16_gradients_finite_and_close(self):
        cell = VMLMFCell(32, 32, w_rank=8, u_rank=8)
        params = cell.init(KEY)
        xs = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 32))
        s0 = (jnp.zeros((3, 32)), jnp.zeros((3, 32)))

        def loss(params, backend, prec):
            prep = cell.prepare(params)
            ys, _ = scan_layer(cell, prep, xs, s0, backend=backend, precision=prec)
            return jnp.sum(ys ** 2)

        gx = jax.grad(loss)(params, "xla", None)
        gb = jax.grad(loss)(params, "pallas", "bf16")
        for a, b in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gb)):
            assert np.all(np.isfinite(b))
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-2, rtol=5e-2)


class TestFusedModels:
    def test_harnet_pallas_matches_xla(self):
        from vmlmf_tpu.nn.models import HARNet

        factory = lambda n, h: VMLMFCell(n, h, w_rank=8, u_rank=6)
        m_x = HARNet(input_size=9, layer_sizes=(32, 32), cell_factory=factory,
                     num_classes=6, backend="xla")
        m_p = HARNet(input_size=9, layer_sizes=(32, 32), cell_factory=factory,
                     num_classes=6, backend="pallas")
        params = m_x.init(KEY)
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 12, 9))
        np.testing.assert_allclose(m_p.apply(params, x), m_x.apply(params, x),
                                   atol=2e-5, rtol=2e-5)

    def test_cell_without_fused_mapping_falls_back_to_xla(self):
        """Cells without a fused mapping must run unchanged under backend=pallas."""
        from vmlmf_tpu.cells import DiagonalLSTMCell

        cell = DiagonalLSTMCell(9, 32)
        params = cell.init(KEY)
        prep = cell.prepare(params)
        xs = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 9))
        s0 = cell.state0(3)
        ys_x, _ = scan_layer(cell, prep, xs, s0, backend="xla")
        ys_p, _ = scan_layer(cell, prep, xs, s0, backend="pallas")
        np.testing.assert_allclose(ys_p, ys_x, atol=1e-6)


class TestXinModes:
    """The pallas backend's two input modes must agree: x-fused (stream x,
    project inside the kernel — the default) vs hoisted gi (stream the
    precomputed [T,B,4h]).  VMLMF_PALLAS_XIN toggles them."""

    @pytest.mark.parametrize("cell", [
        VMLMFCell(77, 180, w_rank=8, u_rank=6),
        LSTMCell(16, 40),
        DualDiagonalLSTMCell(16, 40, w_rank=8, u_rank=8),
    ], ids=["vmlmf", "lstm_dense", "dualdiag"])
    def test_xin_matches_hoisted_gi(self, cell, monkeypatch):
        params = cell.init(KEY)
        xs = jax.random.normal(jax.random.PRNGKey(1), (6, 5, cell.input_size))
        s0 = (jnp.zeros((5, cell.hidden_size)), jnp.zeros((5, cell.hidden_size)))
        w_out = jax.random.normal(jax.random.PRNGKey(3), (6, 5, cell.hidden_size))

        def loss(params, xs):
            prep = cell.prepare(params)
            ys, (h, c) = scan_layer(cell, prep, xs, s0, backend="pallas")
            return jnp.sum(ys * w_out) + jnp.sum(jnp.tanh(h)) + 0.5 * jnp.sum(c * c)

        def run():
            val, grads = jax.value_and_grad(loss, argnums=(0, 1))(params, xs)
            return val, grads

        monkeypatch.setenv("VMLMF_PALLAS_XIN", "1")
        val_x, g_x = run()
        monkeypatch.setenv("VMLMF_PALLAS_XIN", "0")
        val_g, g_g = run()
        np.testing.assert_allclose(val_x, val_g, atol=2e-5, rtol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g_x),
                        jax.tree_util.tree_leaves(g_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-4, rtol=3e-4)

    def test_xin_reverse_scan(self, monkeypatch):
        cell = VMLMFCell(9, 32, w_rank=4, u_rank=4)
        params = cell.init(KEY)
        prep = cell.prepare(params)
        xs = jax.random.normal(jax.random.PRNGKey(1), (7, 4, 9))
        s0 = (jnp.zeros((4, 32)), jnp.zeros((4, 32)))
        ys_x, _ = scan_layer(cell, prep, xs, s0, backend="xla", reverse=True)
        monkeypatch.setenv("VMLMF_PALLAS_XIN", "1")
        ys_p, _ = scan_layer(cell, prep, xs, s0, backend="pallas", reverse=True)
        np.testing.assert_allclose(ys_p, ys_x, atol=2e-5, rtol=2e-5)

    def test_bf16_residuals_close(self, monkeypatch):
        """VMLMF_PALLAS_RESIDUALS=bf16 stores the backward-only gate/rank
        residual streams in bf16: gradients must match f32 to mixed-precision
        tolerance (the primal is untouched — bit-identical)."""
        cell = VMLMFCell(16, 40, w_rank=8, u_rank=8)
        params = cell.init(KEY)
        xs = jax.random.normal(jax.random.PRNGKey(1), (6, 5, 16))
        s0 = (jnp.zeros((5, 40)), jnp.zeros((5, 40)))
        w_out = jax.random.normal(jax.random.PRNGKey(3), (6, 5, 40))

        def loss(params, xs):
            prep = cell.prepare(params)
            ys, _ = scan_layer(cell, prep, xs, s0, backend="pallas")
            return jnp.sum(ys * w_out)

        val_f, g_f = jax.value_and_grad(loss)(params, xs)
        monkeypatch.setenv("VMLMF_PALLAS_RESIDUALS", "bf16")
        val_b, g_b = jax.value_and_grad(loss)(params, xs)
        np.testing.assert_allclose(val_b, val_f, rtol=1e-6)  # primal exact
        for a, b in zip(jax.tree_util.tree_leaves(g_f),
                        jax.tree_util.tree_leaves(g_b)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=2e-2, rtol=2e-2)

    def test_gru_xin_matches_hoisted_gi(self, monkeypatch):
        from vmlmf_tpu.cells import GRUCell

        cell = GRUCell(10, 48, w_rank=6, u_rank=6)
        params = cell.init(KEY)
        xs = jax.random.normal(jax.random.PRNGKey(1), (6, 5, 10))
        h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (5, 48))
        w_out = jax.random.normal(jax.random.PRNGKey(3), (6, 5, 48))

        def loss(params, xs):
            prep = cell.prepare(params)
            ys, hf = scan_layer(cell, prep, xs, h0, backend="pallas")
            return jnp.sum(ys * w_out) + jnp.sum(jnp.tanh(hf))

        monkeypatch.setenv("VMLMF_PALLAS_XIN", "1")
        val_x, g_x = jax.value_and_grad(loss, argnums=(0, 1))(params, xs)
        monkeypatch.setenv("VMLMF_PALLAS_XIN", "0")
        val_g, g_g = jax.value_and_grad(loss, argnums=(0, 1))(params, xs)
        np.testing.assert_allclose(val_x, val_g, atol=2e-5, rtol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g_x),
                        jax.tree_util.tree_leaves(g_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-4, rtol=3e-4)

    @pytest.mark.parametrize("cell", [
        VMLMFCell(77, 180, w_rank=8, u_rank=6),
        LSTMCell(16, 40),
    ], ids=["vmlmf", "lstm_dense"])
    def test_recompute_matches_saved_gates(self, cell, monkeypatch):
        """The x-fused backward's two residual policies must agree: the
        default batched gates/h@U recompute (no [T,B,4h]/[T,B,r] residual
        streams) vs VMLMF_PALLAS_SAVED_GATES=1 (zero-recompute, streamed
        residuals).  Identical math on identical inputs — tight tolerance."""
        params = cell.init(KEY)
        xs = jax.random.normal(jax.random.PRNGKey(1), (6, 5, cell.input_size))
        s0 = (jnp.zeros((5, cell.hidden_size)), jnp.zeros((5, cell.hidden_size)))
        w_out = jax.random.normal(jax.random.PRNGKey(3), (6, 5, cell.hidden_size))

        def loss(params, xs):
            prep = cell.prepare(params)
            ys, (h, c) = scan_layer(cell, prep, xs, s0, backend="pallas")
            return jnp.sum(ys * w_out) + jnp.sum(jnp.tanh(h)) + 0.5 * jnp.sum(c * c)

        monkeypatch.setenv("VMLMF_PALLAS_XIN", "1")
        monkeypatch.delenv("VMLMF_PALLAS_SAVED_GATES", raising=False)
        val_r, g_r = jax.value_and_grad(loss, argnums=(0, 1))(params, xs)
        monkeypatch.setenv("VMLMF_PALLAS_SAVED_GATES", "1")
        val_s, g_s = jax.value_and_grad(loss, argnums=(0, 1))(params, xs)
        np.testing.assert_allclose(val_r, val_s, rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g_r),
                        jax.tree_util.tree_leaves(g_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)

    def test_gru_recompute_matches_saved_gates(self, monkeypatch):
        """Same two residual policies on the GRU x-fused backward (low-rank
        'pre' form and the group 'post' form)."""
        from vmlmf_tpu.cells import GRUCell, GRUGroupCell

        for cell in (GRUCell(10, 48, w_rank=6, u_rank=6),
                     GRUGroupCell(10, 48, u_ranks=(2, 4, 6), groups=3)):
            params = cell.init(KEY)
            xs = jax.random.normal(jax.random.PRNGKey(1), (6, 5, 10))
            h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (5, 48))
            w_out = jax.random.normal(jax.random.PRNGKey(3), (6, 5, 48))

            def loss(params, xs, cell=cell):
                prep = cell.prepare(params)
                ys, hf = scan_layer(cell, prep, xs, h0, backend="pallas")
                return jnp.sum(ys * w_out) + jnp.sum(jnp.tanh(hf))

            monkeypatch.setenv("VMLMF_PALLAS_XIN", "1")
            monkeypatch.delenv("VMLMF_PALLAS_SAVED_GATES", raising=False)
            val_r, g_r = jax.value_and_grad(loss, argnums=(0, 1))(params, xs)
            monkeypatch.setenv("VMLMF_PALLAS_SAVED_GATES", "1")
            val_s, g_s = jax.value_and_grad(loss, argnums=(0, 1))(params, xs)
            np.testing.assert_allclose(val_r, val_s, rtol=1e-6)
            for a, b in zip(jax.tree_util.tree_leaves(g_r),
                            jax.tree_util.tree_leaves(g_s)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-5, rtol=1e-5)

    def test_xin_wide_input(self):
        """F > h exercises the kernel-side pad_features truncation."""
        cell = LSTMCell(200, 32, w_rank=8, u_rank=8)
        params = cell.init(KEY)
        prep = cell.prepare(params)
        xs = jax.random.normal(jax.random.PRNGKey(1), (5, 3, 200))
        s0 = (jnp.zeros((3, 32)), jnp.zeros((3, 32)))
        ys_x, _ = scan_layer(cell, prep, xs, s0, backend="xla")
        ys_p, _ = scan_layer(cell, prep, xs, s0, backend="pallas")
        np.testing.assert_allclose(ys_p, ys_x, atol=2e-5, rtol=2e-5)


class TestVmemBudgets:
    """Chip-aware VMEM budget table (`ops.vmem`) and its effect on the tile
    picker — the kernels must scale to v4/v5p parts without recalibration."""

    def test_table_and_calibrated_v5e_values(self):
        from vmlmf_tpu.ops.vmem import vmem_budgets

        for chip in ("v4", "v5e", "v5p"):
            b = vmem_budgets(chip)
            assert b["budget"] < b["limit"] < b["compiler_limit"]
        # the empirically calibrated round-2 v5e constants, reproduced
        v5e = vmem_budgets("v5e")
        assert v5e["budget"] == 80 << 20
        assert v5e["limit"] == 110 << 20
        assert v5e["compiler_limit"] == 116 << 20

    def test_env_override_shrinks_tiles(self, monkeypatch):
        from vmlmf_tpu.ops.pallas_scan import _pick_tiles
        from vmlmf_tpu.ops.vmem import chip_vmem_bytes

        t, bp, fourhp = 24, 512, 1024
        full = _pick_tiles(t, bp, fourhp, live=10)
        monkeypatch.setenv("VMLMF_VMEM_BYTES", str(48 << 20))
        assert chip_vmem_bytes() == 48 << 20
        small = _pick_tiles(t, bp, fourhp, live=10)
        assert small[0] * small[1] < full[0] * full[1]

    def test_sblk_cap_knob_numerics_invariant(self, monkeypatch):
        """VMLMF_PALLAS_SBLK (grid-step time-block cap — the per-grid-step
        overhead A/B knob) must not change results: sblk=1 (max grid steps)
        and sblk=T (one grid step) match the default."""
        cell = VMLMFCell(12, 40, w_rank=4, u_rank=4)
        params = cell.init(KEY)
        prep = cell.prepare(params)
        xs = jax.random.normal(jax.random.PRNGKey(1), (12, 5, 12))
        s0 = (jnp.zeros((5, 40)), jnp.zeros((5, 40)))
        ys_ref, _ = scan_layer(cell, prep, xs, s0, backend="pallas")
        for cap in ("1", "12"):
            monkeypatch.setenv("VMLMF_PALLAS_SBLK", cap)
            ys, _ = scan_layer(cell, prep, xs, s0, backend="pallas")
            np.testing.assert_allclose(ys, ys_ref, atol=1e-6, rtol=1e-6)

    def test_kernel_correct_under_tiny_budget(self, monkeypatch):
        """Numerics are tile-invariant: the fused kernel under a starved
        budget (many small grid steps) matches the XLA scan."""
        cell = VMLMFCell(16, 40, w_rank=8, u_rank=8)
        params = cell.init(KEY)
        prep = cell.prepare(params)
        xs = jax.random.normal(jax.random.PRNGKey(1), (6, 24, 16))
        s0 = (jnp.zeros((24, 40)), jnp.zeros((24, 40)))
        ys_x, _ = scan_layer(cell, prep, xs, s0, backend="xla")
        monkeypatch.setenv("VMLMF_VMEM_BYTES", str(8 << 20))
        ys_p, _ = scan_layer(cell, prep, xs, s0, backend="pallas")
        np.testing.assert_allclose(ys_p, ys_x, atol=2e-5, rtol=2e-5)

    def test_tile_overflow_falls_back_to_xla(self, monkeypatch):
        """When even the minimal (sblk=1, bt=8) tile overflows the budget
        (here: a VMEM so small the backward kernel cannot tile), scan_layer
        must route to the XLA scan — matching numerics, one-time warning —
        instead of compiling the proven-unfit tile (round-3 verdict item 4)."""
        import vmlmf_tpu.nn.recurrence as rec

        cell = VMLMFCell(12, 128, w_rank=4, u_rank=4)
        params = cell.init(KEY)
        prep = cell.prepare(params)
        xs = jax.random.normal(jax.random.PRNGKey(1), (6, 5, 12))
        s0 = (jnp.zeros((5, 128)), jnp.zeros((5, 128)))

        def loss(prep, xs, backend):
            ys, (h, c) = scan_layer(cell, prep, xs, s0, backend=backend)
            return jnp.sum(ys**2) + jnp.sum(h * c)

        val_x, g_x = jax.value_and_grad(loss)(prep, xs, "xla")
        # 1 MiB VMEM: the forward fits (live 12 × 8 × 512 × 4 ≈ 196 KiB)
        # but the backward (live 28) cannot — the pre-check must catch it
        monkeypatch.setenv("VMLMF_VMEM_BYTES", str(1 << 20))
        from vmlmf_tpu.ops.pallas_scan import fused_scan_fits

        assert not fused_scan_fits(6, 5, 512, jax.tree_util.tree_leaves(prep),
                                   xin=True)
        rec._warned_unfit.clear()
        with pytest.warns(UserWarning, match="falling back to the XLA scan"):
            val_p, g_p = jax.value_and_grad(loss)(prep, xs, "pallas")
        np.testing.assert_allclose(val_p, val_x, rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g_p),
                        jax.tree_util.tree_leaves(g_x)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-6)

    def test_gru_tile_overflow_falls_back_to_xla(self, monkeypatch):
        from vmlmf_tpu.cells import GRUCell
        import vmlmf_tpu.nn.recurrence as rec

        cell = GRUCell(10, 128, w_rank=4, u_rank=4)
        params = cell.init(KEY)
        prep = cell.prepare(params)
        xs = jax.random.normal(jax.random.PRNGKey(1), (6, 5, 10))
        h0 = jnp.zeros((5, 128))
        ys_x, _ = scan_layer(cell, prep, xs, h0, backend="xla")
        monkeypatch.setenv("VMLMF_VMEM_BYTES", str(1 << 19))
        rec._warned_unfit.clear()
        with pytest.warns(UserWarning, match="falling back to the XLA scan"):
            ys_p, _ = scan_layer(cell, prep, xs, h0, backend="pallas")
        np.testing.assert_allclose(ys_p, ys_x, atol=1e-6, rtol=1e-6)

    def test_direct_kernel_overflow_raises_clearly(self, monkeypatch):
        """Direct kernel callers (not via scan_layer) get a clear error
        naming the budget, not an opaque Mosaic VMEM failure."""
        from vmlmf_tpu.ops.pallas_scan import lstm_scan_fused

        monkeypatch.setenv("VMLMF_VMEM_BYTES", str(1 << 16))
        gi = jnp.zeros((4, 3, 4 * 32))
        u = jnp.zeros((32, 8))
        v = jnp.zeros((8, 4 * 32))
        with pytest.raises(ValueError, match="minimal .* tile"):
            lstm_scan_fused(gi, u, v, jnp.zeros(4 * 32), jnp.zeros((3, 32)),
                            jnp.zeros((3, 32)), interpret=True)

    def test_fits_check_lies_kernel_overflow_still_falls_back(self, monkeypatch):
        """ADVICE r4: `fused_scan_fits` estimates padded bytes approximately;
        if it passes but the kernel's exact tile picker refuses
        (TileOverflowError at trace time), scan_layer must STILL fall back to
        the XLA scan instead of surfacing the error."""
        import vmlmf_tpu.nn.recurrence as rec
        import vmlmf_tpu.ops.pallas_scan as ps

        cell = VMLMFCell(12, 40, w_rank=4, u_rank=4)
        params = cell.init(KEY)
        prep = cell.prepare(params)
        xs = jax.random.normal(jax.random.PRNGKey(1), (6, 5, 12))
        s0 = (jnp.zeros((5, 40)), jnp.zeros((5, 40)))
        ys_x, _ = scan_layer(cell, prep, xs, s0, backend="xla")
        # force the pre-check optimistic while the budget is unusable
        monkeypatch.setattr(ps, "fused_scan_fits", lambda *a, **k: True)
        monkeypatch.setenv("VMLMF_VMEM_BYTES", str(1 << 14))
        rec._warned_unfit.clear()
        with pytest.warns(UserWarning, match="falling back to the XLA scan"):
            ys_p, _ = scan_layer(cell, prep, xs, s0, backend="pallas")
        np.testing.assert_allclose(ys_p, ys_x, atol=1e-6, rtol=1e-6)

    def test_stack_fits_consults_chip_budget(self, monkeypatch):
        from vmlmf_tpu.nn.recurrence import RNN
        from vmlmf_tpu.ops.pallas_pipeline import stack_fits, stack_units

        cells = tuple(VMLMFCell(64, 64, w_rank=16, u_rank=16) for _ in range(2))
        rnn = RNN(cells)
        params = rnn.init(KEY)
        preps = [c.prepare(p) for c, p in zip(cells, params)]
        layers = stack_units(cells, preps)
        assert stack_fits(layers)
        monkeypatch.setenv("VMLMF_VMEM_BYTES", str(2 << 20))
        assert not stack_fits(layers)


class TestFusedGRU:
    """Fused GRU scan (ops/pallas_gru) vs the XLA scan: forward + gradients."""

    CASES = [
        ("gru_lowrank", 24, 9, dict(w_rank=8, u_rank=8)),
        ("gru_dense", 7, 4, dict()),
        ("gru_tall", 12, 5, dict(w_rank=4, u_rank=4)),
    ]

    @pytest.mark.parametrize("name,t,b,kw", CASES, ids=[c[0] for c in CASES])
    def test_forward_and_grad_parity(self, name, t, b, kw):
        from vmlmf_tpu.cells import GRUCell

        cell = GRUCell(10, 48, **kw)
        params = cell.init(KEY)
        xs = jax.random.normal(jax.random.PRNGKey(1), (t, b, 10))
        h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (b, 48))

        def run(backend):
            prep = cell.prepare(params)
            return scan_layer(cell, prep, xs, h0, backend=backend)

        ys_x, hf_x = run("xla")
        ys_p, hf_p = run("pallas")
        np.testing.assert_allclose(ys_p, ys_x, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(hf_p, hf_x, atol=2e-5, rtol=2e-5)

        w_out = jax.random.normal(jax.random.PRNGKey(3), ys_x.shape)

        def loss(params, xs, h0, backend):
            prep = cell.prepare(params)
            ys, hf = scan_layer(cell, prep, xs, h0, backend=backend)
            return jnp.sum(ys * w_out) + jnp.sum(jnp.tanh(hf))

        gx = jax.grad(loss, argnums=(0, 1, 2))(params, xs, h0, "xla")
        gp = jax.grad(loss, argnums=(0, 1, 2))(params, xs, h0, "pallas")
        for a, b_ in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gp)):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       atol=3e-4, rtol=3e-4)

    @pytest.mark.parametrize("t,b,kw", [
        (5, 3, dict(u_ranks=(2, 2), groups=2)),
        (12, 7, dict(w_rank=6, u_ranks=(2, 3, 4), groups=3)),
    ], ids=["g2", "g3_lowrank_inp"])
    def test_group_gru_fused_post_mode_parity(self, t, b, kw):
        """Group-GRU rides the fused kernel's mode='post' (reset applied to
        the candidate matmul output) via dense materialization."""
        from vmlmf_tpu.cells import GRUGroupCell

        cell = GRUGroupCell(9, 48, **kw)
        params = cell.init(KEY)
        xs = jax.random.normal(jax.random.PRNGKey(1), (t, b, 9))
        h0 = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (b, 48))

        def run(backend):
            prep = cell.prepare(params)
            return scan_layer(cell, prep, xs, h0, backend=backend)

        ys_x, hf_x = run("xla")
        ys_p, hf_p = run("pallas")
        np.testing.assert_allclose(ys_p, ys_x, atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(hf_p, hf_x, atol=2e-5, rtol=2e-5)

        w_out = jax.random.normal(jax.random.PRNGKey(3), ys_x.shape)

        def loss(params, xs, h0, backend):
            prep = cell.prepare(params)
            ys, hf = scan_layer(cell, prep, xs, h0, backend=backend)
            return jnp.sum(ys * w_out) + jnp.sum(jnp.tanh(hf))

        gx = jax.grad(loss, argnums=(0, 1, 2))(params, xs, h0, "xla")
        gp = jax.grad(loss, argnums=(0, 1, 2))(params, xs, h0, "pallas")
        for a, b_ in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gp)):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       atol=3e-4, rtol=3e-4)
