"""Training-engine tests: seed-pinned short-train regression on tiny synthetic
data (the loss-curve oracle the reference lacks — SURVEY.md §4d), LM loss
convention, clip/decay schedule, checkpoint round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from vmlmf_tpu.cells import LSTMCell, VMLMFCell
from vmlmf_tpu.data.har import synthetic_har
from vmlmf_tpu.data.ptb import minibatch, synthetic_corpus
from vmlmf_tpu.nn.models import HARNet, LMModel
from vmlmf_tpu.train.checkpoint import load_checkpoint, run_name, save_checkpoint
from vmlmf_tpu.train.har import HARTrainer, evaluate, macro_f1
from vmlmf_tpu.train.lm import LMTrainer, clip_by_global_norm, lm_loss


def _tiny_har_model():
    return HARNet(input_size=9, layer_sizes=(32,),
                  cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4),
                  num_classes=6)


class TestHARTrainer:
    def test_loss_decreases_and_learns(self):
        x_tr, y_tr, x_te, y_te = synthetic_har("uci", n_train=128, n_test=64, seed=0)
        x_tr, x_te = x_tr[:, :32], x_te[:, :32]  # trim T for CPU speed
        model = _tiny_har_model()
        tr = HARTrainer(model, learning_rate=1e-2, batch_size=32, seed=3)
        params, opt_state = tr.init()
        params, opt_state, hist = tr.fit(params, opt_state, x_tr, y_tr,
                                         epochs=12, log_fn=None)
        assert hist[-1]["loss"] < hist[0]["loss"] * 0.8
        metrics = evaluate(model, params, x_te, y_te, batch_size=32)
        assert metrics["accuracy"] > 1.0 / 6 + 0.1  # clearly above chance

    def test_determinism_same_seed(self):
        x_tr, y_tr, *_ = synthetic_har("uci", n_train=64, n_test=8, seed=0)
        x_tr = x_tr[:, :16]
        model = _tiny_har_model()

        def run():
            tr = HARTrainer(model, learning_rate=5e-3, batch_size=32, seed=3)
            p, o = tr.init()
            p, o, h = tr.fit(p, o, x_tr, y_tr, epochs=2, log_fn=None)
            return h[-1]["loss"]

        assert run() == run()


class TestMacroF1:
    def test_against_known_values(self):
        pred = np.array([0, 0, 1, 1, 2, 2])
        tgt = np.array([0, 1, 1, 1, 2, 0])
        # class0: tp1 fp1 fn1 -> 0.5 ; class1: tp2 fp0 fn1 -> 0.8 ; class2: tp1 fp1 fn0 -> 2/3
        expected = (0.5 + 0.8 + 2 / 3) / 3
        assert abs(macro_f1(pred, tgt) - expected) < 1e-9


class TestLMLoss:
    def test_zaremba_convention(self):
        t, b, v = 3, 4, 11
        logits = jax.random.normal(jax.random.PRNGKey(0), (t, b, v))
        y = jax.random.randint(jax.random.PRNGKey(1), (t, b), 0, v)
        loss = lm_loss(logits, y)
        # manual: mean over T*B of nll, times batch size
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, y[..., None], -1).squeeze(-1)
        np.testing.assert_allclose(loss, nll.mean() * b, rtol=1e-6)

    def test_clip_by_global_norm(self):
        g = {"a": jnp.ones((10,)) * 3.0}
        clipped, norm = clip_by_global_norm(g, 1.0)
        np.testing.assert_allclose(norm, np.sqrt(90.0), rtol=1e-6)
        np.testing.assert_allclose(
            np.sqrt(np.sum(clipped["a"] ** 2)), 1.0, rtol=1e-4)
        # under the threshold -> unchanged
        g2 = {"a": jnp.ones((4,)) * 0.1}
        c2, _ = clip_by_global_norm(g2, 1.0)
        np.testing.assert_allclose(c2["a"], g2["a"], rtol=1e-6)


class TestLMTrainer:
    def test_short_train_reduces_perplexity(self):
        ids = synthetic_corpus(vocab_size=64, length=6000, seed=0)
        trn = minibatch(ids[:5000], 8, 16)
        vld = minibatch(ids[5000:], 8, 16)
        model = LMModel(vocab_size=64, hidden_size=32, num_layers=1,
                        cell_factory=lambda n, h: LSTMCell(n, h),
                        dropout_rate=0.0, winit=0.05)
        tr = LMTrainer(model, batch_size=8, seq_length=16, learning_rate=1.0,
                       factor_epoch=100, max_grad_norm=5.0, seed=0)
        params = tr.init()
        ppl0 = tr.perplexity(params, vld)
        params, hist = tr.fit(params, (trn, vld, vld), epochs=2, log_fn=None)
        assert hist[0]["val_ppl"] < ppl0
        assert hist[1]["val_ppl"] < ppl0

    def test_tied_embeddings_no_dead_param(self):
        """tie_embeddings=True must not carry a dead [H, V] projection copy:
        param count drops by exactly V*H and gradients flow to the embedding
        table through the softmax head."""
        from vmlmf_tpu.utils.analytics import count_params

        v, h = 64, 32

        def build(tie):
            return LMModel(vocab_size=v, hidden_size=h, num_layers=1,
                           cell_factory=lambda n, hh: LSTMCell(n, hh),
                           dropout_rate=0.0, winit=0.05, tie_embeddings=tie)

        untied = build(False)
        tied = build(True)
        p_u = untied.init(jax.random.PRNGKey(0))
        p_t = tied.init(jax.random.PRNGKey(0))
        assert "w" not in p_t["fc"]
        assert count_params(p_u) - count_params(p_t) == v * h

        ids = jnp.zeros((4, 2), jnp.int32).at[1].set(3)
        tgt = jnp.ones((4, 2), jnp.int32)
        states = tied.state0(2)

        def loss_fn(p):
            logits, _ = tied.apply(p, ids, states, train=False)
            return lm_loss(logits, tgt)

        grads = jax.grad(loss_fn)(p_t)
        # head-path gradient: rows of embed.w the inputs never touch still get
        # gradient through the (derived) projection weight
        untouched = np.asarray(grads["embed"]["w"])[10:]
        assert np.abs(untouched).max() > 0

    def test_lr_decay_schedule(self):
        """lr decays by /factor per epoch past factor_epoch (`lm_test.py:194-195`)."""
        ids = synthetic_corpus(vocab_size=16, length=600, seed=1)
        trn = minibatch(ids, 4, 8)
        model = LMModel(vocab_size=16, hidden_size=8, num_layers=1,
                        cell_factory=lambda n, h: LSTMCell(n, h),
                        dropout_rate=0.0)
        tr = LMTrainer(model, batch_size=4, learning_rate=1.0, factor_epoch=1,
                       factor=2.0, seed=0)
        params = tr.init()
        _, hist = tr.fit(params, (trn, trn, trn), epochs=4, log_fn=None)
        lrs = [h["lr"] for h in hist if "lr" in h]
        assert lrs == [1.0, 1.0, 0.5, 0.25]


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        model = _tiny_har_model()
        params = model.init(jax.random.PRNGKey(0))
        path = save_checkpoint(str(tmp_path / "ck"), params, meta={"k": 1})
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        restored = load_checkpoint(path, zeros)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shape_mismatch_raises(self, tmp_path):
        import pytest

        model = _tiny_har_model()
        params = model.init(jax.random.PRNGKey(0))
        path = save_checkpoint(str(tmp_path / "ck"), params)
        other = HARNet(input_size=9, layer_sizes=(16,),
                       cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4),
                       num_classes=6).init(jax.random.PRNGKey(0))
        with pytest.raises(ValueError):
            load_checkpoint(path, other)

    def test_run_name(self):
        name = run_name("vmmodel", layer_sizes=(180,), w_rank=8, u_ranks=(6,),
                        data="OPP", seed=3)
        assert name == "vmmodel_L180_w8_u6_opp_seed3"


class TestRoofline:
    def test_bounds_and_fraction(self):
        from vmlmf_tpu.utils.analytics import roofline_report

        # high intensity -> compute-bound; fraction = roofline time / measured
        r = roofline_report(1e12, 1e9, 0.1, chip="v5e", dtype="bf16")
        assert r["bound"] == "compute"
        assert 0 < r["fraction_of_roofline"] <= 1.0
        np.testing.assert_allclose(r["achieved_flops_per_s"], 1e13)
        # low intensity -> memory-bound
        assert roofline_report(1e9, 1e12, 0.1)["bound"] == "memory"


class TestOrbaxCheckpoint:
    def test_roundtrip_and_sharded_restore(self, tmp_path):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vmlmf_tpu.parallel.mesh import make_mesh
        from vmlmf_tpu.train.checkpoint import (
            load_checkpoint_orbax,
            save_checkpoint_orbax,
        )

        state = {"params": {"w": jnp.arange(32.0).reshape(8, 4)},
                 "step": jnp.int32(7)}
        path = str(tmp_path / "ckpt")
        save_checkpoint_orbax(path, state)

        like = {"params": {"w": jnp.zeros((8, 4))}, "step": jnp.int32(0)}
        out = load_checkpoint_orbax(path, like)
        np.testing.assert_allclose(out["params"]["w"], state["params"]["w"])
        assert int(out["step"]) == 7

        mesh = make_mesh(data=8, model=1)
        shardings = {"params": {"w": NamedSharding(mesh, P("data", None))},
                     "step": NamedSharding(mesh, P())}
        out = load_checkpoint_orbax(path, like, shardings=shardings)
        assert out["params"]["w"].sharding == shardings["params"]["w"]
        np.testing.assert_allclose(out["params"]["w"], state["params"]["w"])


class TestAnalytics:
    def test_flops_formula_matches_reference_closed_form(self):
        from vmlmf_tpu.utils.analytics import lstm_cell_flops

        n, h, wr, ur = 77, 180, 8, 6
        # reproduce compression_cal.py:72-113 independently
        input_ops = (2 * n - 1) * wr + (2 * wr - 1) * h
        hidden_ops = (2 * h - 1) * ur + (2 * ur - 1) * h
        state = (input_ops + hidden_ops + n + h + 3 * h
                 + (2 * wr - 1) * n + h + (2 * ur - 1) * h + h + h)
        expected = state * 4 + 3 * h + h
        assert lstm_cell_flops(n, h, wr, ur) == expected

    def test_vanilla_flops(self):
        from vmlmf_tpu.utils.analytics import lstm_cell_flops

        n, h = 77, 180
        state = (2 * n - 1) * h + (2 * h - 1) * h + h + h
        expected = state * 4 + 3 * h + h
        assert lstm_cell_flops(n, h, vm=False) == expected


class TestFusionEquivalence:
    """Epoch/chunk fusion must be a pure execution-strategy change: fused and
    per-step paths produce identical parameters and losses."""

    def test_har_fused_steps_match_per_batch(self):
        model = _tiny_har_model()
        tr = HARTrainer(model, learning_rate=1e-2, batch_size=8, fuse_batches=4)
        params, opt = tr.init()
        xs = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 12, 9))
        ys = jax.random.randint(jax.random.PRNGKey(2), (4, 8), 0, 6)

        pf, of, losses_f = tr._fused_steps(params, opt, xs, ys)
        p2, o2 = tr.init()
        losses_s = []
        for i in range(4):
            p2, o2, l = tr._train_step(p2, o2, xs[i], ys[i])
            losses_s.append(float(l))
        np.testing.assert_allclose(np.asarray(losses_f), losses_s, rtol=2e-5, atol=2e-6)
        for a, b in zip(jax.tree_util.tree_leaves(pf), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    def test_lm_fused_chunks_match_per_chunk(self):
        model = LMModel(vocab_size=40, hidden_size=16, num_layers=1,
                        cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4),
                        dropout_rate=0.0, winit=0.05)
        tr = LMTrainer(model, batch_size=4, seq_length=5, fuse_chunks=3)
        params = tr.init()
        states = model.state0(4)
        xs = jax.random.randint(jax.random.PRNGKey(1), (3, 5, 4), 0, 40)
        ys = jax.random.randint(jax.random.PRNGKey(2), (3, 5, 4), 0, 40)
        lr = jnp.float32(0.5)
        rng = jax.random.PRNGKey(7)

        pf, sf, losses_f, _ = tr._fused_chunks(params, states, xs, ys, lr, rng)
        p2 = tr.init()
        s2 = model.state0(4)
        keys = jax.random.split(rng, 3)
        losses_s = []
        for i in range(3):
            p2, s2, l, _ = tr._train_step(p2, s2, xs[i], ys[i], lr, keys[i])
            losses_s.append(float(l))
        np.testing.assert_allclose(np.asarray(losses_f), losses_s, rtol=2e-5, atol=2e-6)
        for a, b in zip(jax.tree_util.tree_leaves(pf), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    def test_lm_eval_chunks_match_per_chunk(self):
        """Fused batch-eval (one dispatch per chunk stack, the serving-style
        path bench.py measures) must equal sequential per-chunk eval."""
        model = LMModel(vocab_size=40, hidden_size=16, num_layers=2,
                        cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4),
                        dropout_rate=0.0, winit=0.05)
        tr = LMTrainer(model, batch_size=4, seq_length=5)
        params = tr.init()
        xs = jax.random.randint(jax.random.PRNGKey(1), (3, 5, 4), 0, 40)
        ys = jax.random.randint(jax.random.PRNGKey(2), (3, 5, 4), 0, 40)

        losses_f, sf = tr._eval_chunks(params, model.state0(4), xs, ys)
        s2 = model.state0(4)
        losses_s = []
        for i in range(3):
            l, s2 = tr._eval_step(params, s2, xs[i], ys[i])
            losses_s.append(float(l))
        np.testing.assert_allclose(np.asarray(losses_f), losses_s, rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(sf), jax.tree_util.tree_leaves(s2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                       atol=1e-7)


class TestProfilingUtils:
    def test_nan_checks_toggle(self):
        from vmlmf_tpu.utils.profiling import enable_nan_checks

        enable_nan_checks(True)
        try:
            with np.testing.assert_raises(Exception):
                jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(1.0)).block_until_ready()
        finally:
            enable_nan_checks(False)
        # back off: the same computation silently yields nan
        out = jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(1.0))
        assert np.isnan(np.asarray(out))

    def test_live_buffer_bytes_counts(self):
        from vmlmf_tpu.utils.profiling import live_buffer_bytes

        before = live_buffer_bytes()
        keep = jnp.ones((256, 256), jnp.float32) + 0  # materialize
        keep.block_until_ready()
        assert live_buffer_bytes() >= before
        del keep


class TestDeviceTimeFit:
    """`bench.fit_device_seconds` — the relay-free timing protocol
    (docs/latency.md finding 1) must recover (device, fixed) exactly from
    a synthetic loop-time model and never return negatives."""

    def test_recovers_synthetic_model(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        from bench import fit_device_seconds

        calls = []

        def timed(iters):
            calls.append(iters)
            return 71.3e-6 * iters + 30.8e-3  # device 71.3us + 30.8ms relay

        dev, fixed = fit_device_seconds(timed, counts=(4, 32), rounds=3)
        assert abs(dev - 71.3e-6) < 1e-9
        assert abs(fixed - 30.8e-3) < 1e-9
        assert calls == [4, 32] * 3  # interleaved rounds

    def test_clamps_noise_to_nonnegative(self):
        from bench import fit_device_seconds

        # pathological noise: hi count faster than lo -> device clamps to ~0,
        # fixed to >= 0, never negative/zero division
        seq = iter([1.0, 0.5] * 3)
        dev, fixed = fit_device_seconds(lambda n: next(seq), counts=(1, 2),
                                        rounds=3)
        assert dev > 0 and fixed >= 0


class TestChipTables:
    """v4→v7 chip peak/VMEM tables: device-kind mapping, env override, and
    the loud unknown-chip fallback (MFU must never be silently wrong)."""

    def test_device_kind_mapping(self):
        from vmlmf_tpu.utils.analytics import detect_chip

        cases = {
            "TPU v4": "v4",
            "TPU v5e": "v5e",
            "TPU v5 lite": "v5e",
            "TPU v5p": "v5p",
            "TPU v6e": "v6e",
            "TPU v6 lite": "v6e",
            "Trillium": "v6e",
            "TPU v7": "v7",
            "TPU7x": "v7",
            "Ironwood": "v7",
        }
        for kind, expect in cases.items():
            assert detect_chip(kind) == expect, (kind, detect_chip(kind))

    def test_every_chip_has_peaks_and_vmem(self):
        from vmlmf_tpu.ops.vmem import VMEM_BYTES, vmem_budgets
        from vmlmf_tpu.utils.analytics import TPU_PEAKS, chip_peaks

        assert set(VMEM_BYTES) == set(TPU_PEAKS)
        for chip, peaks in TPU_PEAKS.items():
            assert set(peaks) == {"bf16", "f32", "hbm_bw"}
            assert peaks["bf16"] > peaks["f32"] > 0
            b = vmem_budgets(chip)
            assert 0 < b["budget"] < b["limit"] <= b["compiler_limit"]
            assert chip_peaks(chip) == peaks

    def test_v6e_peaks_scale_over_v5e(self):
        # the VERDICT's concern: v6e bf16 peak is ~4.7x v5e — an MFU computed
        # against the v5e entry on a v6e part would overstate by that factor
        from vmlmf_tpu.utils.analytics import TPU_PEAKS

        ratio = TPU_PEAKS["v6e"]["bf16"] / TPU_PEAKS["v5e"]["bf16"]
        assert 4.0 < ratio < 5.5

    def test_unknown_tpu_kind_warns(self):
        import warnings

        from vmlmf_tpu.utils.analytics import detect_chip

        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            chip = detect_chip("TPU v99 hypothetical")
        assert chip == "v5e"
        assert any("unrecognized TPU device kind" in str(r.message) for r in rec)

    def test_peaks_env_override(self, monkeypatch):
        from vmlmf_tpu.utils.analytics import chip_peaks

        monkeypatch.setenv("VMLMF_TPU_PEAKS", "f32:5e13,hbm_bw:1e12")
        p = chip_peaks("v5e")
        assert p["f32"] == 5e13 and p["hbm_bw"] == 1e12
        assert p["bf16"] == 197e12  # unspecified key: chip default
        monkeypatch.setenv("VMLMF_TPU_PEAKS", "bogus:1")
        import pytest

        with pytest.raises(ValueError):
            chip_peaks("v5e")

    def test_cpu_backend_quiet_fallback(self):
        # tests run on CPU: detection must not warn, just report v5e
        import warnings

        from vmlmf_tpu.utils.analytics import detect_chip

        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            assert detect_chip() == "v5e"
        assert not [r for r in rec if "unrecognized" in str(r.message)]
