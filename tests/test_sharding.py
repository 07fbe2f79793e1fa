"""Mesh/sharding tests on 8 virtual CPU devices — the "distributed test
without a cluster" strategy (SURVEY.md §4c).  Checks that the data-parallel
HAR step and the vocab-sharded LM step compile, execute, and are *numerically
invariant to the mesh shape* (device-count invariance is the correctness
oracle for sharded training)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vmlmf_tpu.cells import VMLMFCell
from vmlmf_tpu.nn.models import HARNet, LMModel
from vmlmf_tpu.parallel.mesh import make_mesh
from vmlmf_tpu.parallel.sharding import (
    batch_sharding,
    har_param_sharding,
    lm_param_sharding,
    lm_state_sharding,
    replicated,
)
from vmlmf_tpu.train.lm import lm_loss


def _har_model():
    return HARNet(input_size=9, layer_sizes=(32,),
                  cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4),
                  num_classes=6)


def _har_loss_fn(model):
    def f(params, x, y):
        import optax

        return optax.softmax_cross_entropy_with_integer_labels(
            model.apply(params, x), y).mean()

    return f


class TestMesh:
    def test_make_mesh_shapes(self):
        m = make_mesh()  # all 8 devices on data
        assert m.shape == {"data": 8, "model": 1}
        m2 = make_mesh(model=2)
        assert m2.shape == {"data": 4, "model": 2}
        m3 = make_mesh(data=2, model=2)
        assert m3.shape == {"data": 2, "model": 2}


class TestDataParallelHAR:
    def test_dp_grad_matches_single_device(self):
        model = _har_model()
        params = model.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (16, 12, 9))
        y = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 6)
        loss_fn = _har_loss_fn(model)

        # single-device truth
        g_ref = jax.grad(loss_fn)(params, x, y)
        l_ref = loss_fn(params, x, y)

        mesh = make_mesh()  # 8-way data parallel
        p_shard = har_param_sharding(params, mesh)
        x_s = jax.device_put(x, batch_sharding(mesh, 3))
        y_s = jax.device_put(y, batch_sharding(mesh, 1))
        p_s = jax.device_put(params, p_shard)
        step = jax.jit(jax.value_and_grad(loss_fn),
                       in_shardings=(p_shard, batch_sharding(mesh, 3), batch_sharding(mesh, 1)),
                       out_shardings=(replicated(mesh), p_shard))
        l_dp, g_dp = step(p_s, x_s, y_s)

        np.testing.assert_allclose(float(l_dp), float(l_ref), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g_dp), jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


class TestVocabShardedLM:
    def _loss(self, model, params, states, ids, y):
        logits, _ = model.apply(params, ids, states, train=False)
        return lm_loss(logits, y)

    def test_mesh_shape_invariance(self):
        """Same LM loss+grads on (8,1), (4,2), (2,4) meshes and single device."""
        vocab, hidden, t, b = 32, 16, 6, 8
        model = LMModel(vocab_size=vocab, hidden_size=hidden, num_layers=2,
                        cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4),
                        dropout_rate=0.0, winit=0.05)
        params = model.init(jax.random.PRNGKey(0))
        states = model.state0(b)
        ids = jax.random.randint(jax.random.PRNGKey(1), (t, b), 0, vocab)
        y = jax.random.randint(jax.random.PRNGKey(2), (t, b), 0, vocab)

        loss_fn = lambda p, s, i, yy: self._loss(model, p, s, i, yy)
        ref_loss = float(loss_fn(params, states, ids, y))
        ref_grads = jax.grad(loss_fn)(params, states, ids, y)

        for dp, mp in [(8, 1), (4, 2), (2, 4)]:
            mesh = make_mesh(data=dp, model=mp)
            p_shard = lm_param_sharding(params, mesh)
            s_shard = lm_state_sharding(states, mesh)
            d_shard = NamedSharding(mesh, P(None, "data"))
            step = jax.jit(jax.value_and_grad(loss_fn),
                           in_shardings=(p_shard, s_shard, d_shard, d_shard),
                           out_shardings=(replicated(mesh), p_shard))
            l, g = step(jax.device_put(params, p_shard),
                        jax.device_put(states, s_shard),
                        jax.device_put(ids, d_shard),
                        jax.device_put(y, d_shard))
            np.testing.assert_allclose(float(l), ref_loss, rtol=1e-5,
                                       err_msg=f"mesh ({dp},{mp})")
            for a, bb in zip(jax.tree_util.tree_leaves(g),
                             jax.tree_util.tree_leaves(ref_grads)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                           atol=1e-5, rtol=1e-4)

    def test_embedding_table_actually_sharded(self):
        vocab, hidden = 64, 16
        model = LMModel(vocab_size=vocab, hidden_size=hidden, num_layers=1,
                        cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4),
                        dropout_rate=0.0)
        params = model.init(jax.random.PRNGKey(0))
        mesh = make_mesh(data=2, model=4)
        p_shard = lm_param_sharding(params, mesh)
        p = jax.device_put(params, p_shard)
        # each model-shard holds V/4 rows of the embedding
        shard_shapes = {s.data.shape for s in p["embed"]["w"].addressable_shards}
        assert shard_shapes == {(vocab // 4, hidden)}
        shard_shapes = {s.data.shape for s in p["fc"]["w"].addressable_shards}
        assert shard_shapes == {(hidden, vocab // 4)}


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "graft_entry",
            os.path.join(os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py"),
        )
        g = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(g)
        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (81, 18)
        g.dryrun_multichip(8)


class TestShardedCheckpoint:
    def test_restore_onto_mesh(self, tmp_path):
        """Checkpoint saved from host arrays restores directly sharded."""
        import numpy as np
        from vmlmf_tpu.cells import VMLMFCell
        from vmlmf_tpu.nn.models import LMModel
        from vmlmf_tpu.parallel.mesh import make_mesh
        from vmlmf_tpu.parallel.sharding import lm_param_sharding
        from vmlmf_tpu.train.checkpoint import load_checkpoint, save_checkpoint

        model = LMModel(vocab_size=64, hidden_size=16, num_layers=1,
                        cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4),
                        dropout_rate=0.0, winit=0.05)
        params = model.init(jax.random.PRNGKey(0))
        path = save_checkpoint(str(tmp_path / "ckpt"), params)

        mesh = make_mesh(model=2)
        shardings = lm_param_sharding(params, mesh)
        restored = load_checkpoint(path, params, shardings=shardings)

        # values identical, embedding leaf actually sharded over the mesh
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        emb = restored["embed"]["w"]
        assert len(emb.sharding.device_set) > 1, emb.sharding


class TestDataParallelTrainer:
    def test_har_trainer_on_mesh_matches_single_device(self):
        """HARTrainer(mesh=...) must train to the same parameters as the
        single-device trainer (DP is an execution detail, not semantics)."""
        import numpy as np
        from vmlmf_tpu.cells import VMLMFCell
        from vmlmf_tpu.nn.models import HARNet
        from vmlmf_tpu.parallel.mesh import make_mesh
        from vmlmf_tpu.train.har import HARTrainer

        model = HARNet(input_size=9, layer_sizes=(16,),
                       cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4),
                       num_classes=6)
        x = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 12, 9))
        y = jax.random.randint(jax.random.PRNGKey(2), (3, 8), 0, 6)

        t1 = HARTrainer(model, batch_size=8, fuse_batches=1)
        p1, o1 = t1.init()
        t2 = HARTrainer(model, batch_size=8, fuse_batches=1, mesh=make_mesh(model=1))
        p2, o2 = t2.init()

        for i in range(3):
            p1, o1, l1 = t1._train_step(p1, o1, x[i], y[i])
            p2, o2, l2 = t2._train_step(p2, o2, x[i], y[i])
            np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
        # batch really is sharded across the 8 virtual devices
        assert len(jax.tree_util.tree_leaves(p2)[0].sharding.device_set) == 8


class TestHostInputPipeline:
    """Per-host input pipeline (SURVEY §2.3 item 2): batches committed to the
    mesh via `make_global_batch` / `local_batch_slice` +
    `jax.make_array_from_process_local_data`."""

    def test_make_global_batch_single_process(self):
        from vmlmf_tpu.parallel.mesh import make_global_batch

        mesh = make_mesh(data=4, model=2)
        x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
        arr = make_global_batch(mesh, x, P("data", None))
        assert arr.sharding == NamedSharding(mesh, P("data", None))
        np.testing.assert_array_equal(np.asarray(arr), x)
        # each data-shard holds B/4 rows
        assert {s.data.shape for s in arr.addressable_shards} == {(2, 3)}

    def test_make_global_batch_accepts_sharding(self):
        from vmlmf_tpu.parallel.mesh import make_global_batch

        mesh = make_mesh(data=8, model=1)
        sh = NamedSharding(mesh, P(None, "data"))
        x = np.arange(5 * 8, dtype=np.int32).reshape(5, 8)
        arr = make_global_batch(sh, x)
        assert arr.sharding == sh
        np.testing.assert_array_equal(np.asarray(arr), x)

    def test_local_batch_slice_single_process(self):
        from vmlmf_tpu.parallel.mesh import local_batch_slice

        assert local_batch_slice(16) == slice(0, 16)

    def test_make_global_batch_rejects_indivisible_batch(self, monkeypatch):
        """Multi-process with batch % process_count != 0 must raise, not
        silently drop rows (HAR's batch 81 on 2 hosts would lose row 80)."""
        import pytest

        from vmlmf_tpu.parallel.mesh import make_global_batch

        mesh = make_mesh()
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        with pytest.raises(ValueError, match="not divisible"):
            make_global_batch(mesh, np.zeros((9, 3), np.float32), P("data", None))

    def test_data_axis_index(self):
        from vmlmf_tpu.parallel.mesh import _data_axis_index

        assert _data_axis_index(P(None, "data")) == 1
        assert _data_axis_index(P("data")) == 0
        import pytest

        with pytest.raises(ValueError):
            _data_axis_index(P(None, "model"))

    def test_trainer_commit_batch_shards_tokens(self):
        """LMTrainer.commit_batch commits token chunks to the data axis —
        the sharding VERDICT r1 flagged as dead code is now load-bearing."""
        from vmlmf_tpu.train.lm import LMTrainer

        mesh = make_mesh(data=4, model=2)
        model = LMModel(vocab_size=64, hidden_size=16, num_layers=1,
                        cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4),
                        dropout_rate=0.0, winit=0.05)
        tr = LMTrainer(model, batch_size=8, seq_length=5, mesh=mesh)
        x = np.zeros((5, 8), np.int32)
        xb, yb = tr.commit_batch(x, x)
        assert xb.sharding == NamedSharding(mesh, P(None, "data"))
        xs, ys = tr.commit_batch(x[None], x[None], stacked=True)
        assert xs.sharding == NamedSharding(mesh, P(None, None, "data"))

    def test_initialize_multihost_failure_semantics(self, monkeypatch):
        """Explicit multi-host args must RAISE on init failure (no silent
        single-process degradation); the fully-auto call may fall back."""
        import pytest

        from vmlmf_tpu.parallel import mesh as mesh_mod

        def boom(**kw):
            raise RuntimeError("no coordinator")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        mesh_mod.initialize_multihost()  # auto-detect: benign fallback
        with pytest.raises(RuntimeError):
            mesh_mod.initialize_multihost(coordinator_address="host:1234",
                                          num_processes=2, process_id=0)


class TestLMTrainerOnMesh:
    def test_lm_trainer_fit_mesh_epoch_matches_single_device(self):
        """Full `fit()` epoch (fused-chunk path, committed token stacks) on a
        (4,2) mesh vs single device at PTB-like vocab; params must agree."""
        from vmlmf_tpu.train.lm import LMTrainer

        vocab, hidden, b, t = 1024, 16, 8, 5

        def build(mesh):
            model = LMModel(vocab_size=vocab, hidden_size=hidden, num_layers=2,
                            cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4),
                            dropout_rate=0.0, winit=0.05)
            return LMTrainer(model, batch_size=b, seq_length=t, mesh=mesh,
                             fuse_chunks=4, learning_rate=0.5)

        rng = np.random.default_rng(0)
        chunks = [(rng.integers(0, vocab, (t, b)).astype(np.int32),
                   rng.integers(0, vocab, (t, b)).astype(np.int32))
                  for _ in range(6)]

        t1 = build(None)
        t2 = build(make_mesh(data=4, model=2))
        p1, _ = t1.fit(t1.init(), (chunks, chunks[:1], chunks[:1]),
                       epochs=1, log_fn=None)
        p2, _ = t2.fit(t2.init(), (chunks, chunks[:1], chunks[:1]),
                       epochs=1, log_fn=None)
        for a, bb in zip(jax.tree_util.tree_leaves(p1),
                         jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=2e-5, atol=2e-6)
        # the sharded trainer's embedding is genuinely vocab-sharded
        assert len(p2["embed"]["w"].sharding.device_set) >= 2

    def test_lm_trainer_mesh_matches_single_device(self):
        import numpy as np
        from vmlmf_tpu.cells import VMLMFCell
        from vmlmf_tpu.nn.models import LMModel
        from vmlmf_tpu.parallel.mesh import make_mesh
        from vmlmf_tpu.train.lm import LMTrainer

        def build(mesh):
            model = LMModel(vocab_size=64, hidden_size=16, num_layers=1,
                            cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4),
                            dropout_rate=0.0, winit=0.05)
            return LMTrainer(model, batch_size=4, seq_length=5, mesh=mesh), model

        t1, m1 = build(None)
        t2, m2 = build(make_mesh(model=2))
        p1, p2 = t1.init(), t2.init()
        s1, s2 = m1.state0(4), t2.state0(4)
        xs = jax.random.randint(jax.random.PRNGKey(1), (5, 4), 0, 64)
        ys = jax.random.randint(jax.random.PRNGKey(2), (5, 4), 0, 64)
        lr = jnp.float32(0.5)
        key = jax.random.PRNGKey(7)
        for _ in range(3):
            p1, s1, l1, _ = t1._train_step(p1, s1, xs, ys, lr, key)
            p2, s2, l2, _ = t2._train_step(p2, s2, xs, ys, lr, key)
            np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
        assert len(jax.tree_util.tree_leaves(p2)[0].sharding.device_set) >= 2


class TestPallasBackendOnMesh:
    """Directive: the production `pallas` backend composed with the mesh.

    A bare `pallas_call` has no SPMD partitioning rule — under jit with a
    batch-sharded operand XLA resolves it by replicating, which on a real pod
    silently destroys DP scaling.  `parallel.spmd.kernel_spmd` (activated by
    the trainers) shard_maps the fused kernels over the data axis instead;
    these tests prove (a) the shard_map wrapper actually engages, (b) the
    sharded pallas trainers reproduce the unsharded pallas results, and
    (c) the math still matches the XLA backend."""

    def _har(self, backend, cell="vmlmf"):
        from vmlmf_tpu.cells import GRUCell

        if cell == "vmlmf":
            factory = lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4)
        else:
            factory = lambda n, h: GRUCell(n, h, w_rank=4, u_rank=4)
        return HARNet(input_size=9, layer_sizes=(16,), cell_factory=factory,
                      num_classes=6, backend=backend)

    def test_spmd_wrapper_engages(self, monkeypatch):
        """The fused kernel really runs under shard_map on the data axis
        (not via XLA's opaque handling of an unsharded custom call)."""
        import vmlmf_tpu.parallel.spmd as spmd_mod
        from vmlmf_tpu.train.har import HARTrainer

        calls = []
        real = spmd_mod.shard_map

        def spy(fn, **kw):
            calls.append(kw["in_specs"])
            return real(fn, **kw)

        monkeypatch.setattr(spmd_mod, "shard_map", spy)
        model = self._har("pallas")
        tr = HARTrainer(model, batch_size=8, fuse_batches=1, mesh=make_mesh(model=1))
        p, o = tr.init()
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 12, 9))
        y = jax.random.randint(jax.random.PRNGKey(1), (8,), 0, 6)
        tr._train_step(p, o, x, y)
        assert calls, "fused kernel was not shard_map-wrapped under the mesh"
        # stream sharded on batch dim 1, states on dim 0
        assert calls[0][0] == P(None, "data")
        assert calls[0][-1] == P("data")

    def test_har_pallas_mesh_matches_unsharded_and_xla(self):
        from vmlmf_tpu.train.har import HARTrainer

        x = jax.random.normal(jax.random.PRNGKey(1), (3, 8, 12, 9))
        y = jax.random.randint(jax.random.PRNGKey(2), (3, 8), 0, 6)

        runs = {}
        for name, backend, mesh in [
            ("pallas_mesh", "pallas", make_mesh(model=1)),
            ("pallas_1dev", "pallas", None),
            ("xla_mesh", "xla", make_mesh(model=1)),
        ]:
            tr = HARTrainer(self._har(backend), batch_size=8,
                            fuse_batches=1, mesh=mesh)
            p, o = tr.init()
            for i in range(3):
                p, o, loss = tr._train_step(p, o, x[i], y[i])
            runs[name] = p
        for other in ("pallas_1dev", "xla_mesh"):
            for a, b in zip(jax.tree_util.tree_leaves(runs["pallas_mesh"]),
                            jax.tree_util.tree_leaves(runs[other])):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-5, atol=2e-6)
        assert len(jax.tree_util.tree_leaves(
            runs["pallas_mesh"])[0].sharding.device_set) == 8

    def test_har_pallas_mesh_fused_epoch(self):
        """fused_steps (scan over stacked batches) with the shard_mapped
        kernel inside — the production epoch path."""
        from vmlmf_tpu.train.har import HARTrainer

        rng = np.random.default_rng(0)
        x = rng.normal(size=(64, 12, 9)).astype(np.float32)
        y = rng.integers(0, 6, size=(64,)).astype(np.int32)
        ps = []
        for mesh in (make_mesh(model=1), None):
            tr = HARTrainer(self._har("pallas"), batch_size=8,
                            fuse_batches=4, mesh=mesh)
            p, o = tr.init()
            p, o, _ = tr.fit(p, o, x, y, epochs=1, log_fn=None)
            ps.append(p)
        for a, b in zip(jax.tree_util.tree_leaves(ps[0]),
                        jax.tree_util.tree_leaves(ps[1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)

    def test_gru_pallas_mesh_matches_unsharded(self):
        from vmlmf_tpu.train.har import HARTrainer

        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 12, 9))
        y = jax.random.randint(jax.random.PRNGKey(2), (2, 8), 0, 6)
        ps = []
        for mesh in (make_mesh(model=1), None):
            tr = HARTrainer(self._har("pallas", cell="gru"), batch_size=8,
                            fuse_batches=1, mesh=mesh)
            p, o = tr.init()
            for i in range(2):
                p, o, _ = tr._train_step(p, o, x[i], y[i])
            ps.append(p)
        for a, b in zip(jax.tree_util.tree_leaves(ps[0]),
                        jax.tree_util.tree_leaves(ps[1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)

    def test_lm_pallas_mesh_matches_single_device(self):
        """Pallas backend + DP data axis + vocab-sharded head, jointly."""
        from vmlmf_tpu.train.lm import LMTrainer

        def build(mesh):
            model = LMModel(vocab_size=64, hidden_size=16, num_layers=2,
                            cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4),
                            dropout_rate=0.0, winit=0.05, backend="pallas")
            return LMTrainer(model, batch_size=8, seq_length=5, mesh=mesh), model

        t1, m1 = build(None)
        t2, m2 = build(make_mesh(data=4, model=2))
        p1, p2 = t1.init(), t2.init()
        s1, s2 = m1.state0(8), m2.state0(8)
        xs = jax.random.randint(jax.random.PRNGKey(1), (5, 8), 0, 64)
        ys = jax.random.randint(jax.random.PRNGKey(2), (5, 8), 0, 64)
        lr = jnp.float32(0.5)
        key = jax.random.PRNGKey(7)
        for _ in range(3):
            p1, s1, l1, _ = t1._train_step(p1, s1, xs, ys, lr, key)
            p2, s2, l2, _ = t2._train_step(p2, s2, xs, ys, lr, key)
            np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)

    def test_indivisible_batch_warns_and_still_runs(self):
        from vmlmf_tpu.parallel.spmd import kernel_spmd
        import warnings as w

        model = self._har("pallas")
        params = model.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (6, 12, 9))  # 6 % 8 != 0
        with kernel_spmd(make_mesh(model=1)):
            with w.catch_warnings(record=True) as rec:
                w.simplefilter("always")
                out = model.apply(params, x)
        assert out.shape == (6, 6)
        assert any("does not divide" in str(r.message) for r in rec)

    def test_local_batch(self):
        from vmlmf_tpu.parallel.spmd import kernel_spmd, local_batch

        assert local_batch(16) == 16  # no context
        with kernel_spmd(make_mesh(model=1)):  # 8-way data
            assert local_batch(16) == 2
            assert local_batch(6) == 6  # indivisible: unwrapped
        with kernel_spmd(None):
            assert local_batch(16) == 16
