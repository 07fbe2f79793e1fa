"""True multi-process input-pipeline smoke test (SURVEY §2.3 item 2).

Spawns TWO OS processes that form a real `jax.distributed` cluster over CPU
(gloo collectives), each contributing only its `local_batch_slice` rows via
`make_global_batch` / `jax.make_array_from_process_local_data`, and asserts a
global reduction sees every host's rows.  This is the strongest
"distributed test without a TPU pod" available on one machine — the
cross-process sharding/assembly math is exercised for real, not simulated.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import sys
    pid, nproc, port, repo = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np
    sys.path.insert(0, repo)
    from jax.sharding import PartitionSpec as P
    from vmlmf_tpu.parallel.mesh import (
        local_batch_slice, make_global_batch, make_mesh)

    assert jax.process_count() == nproc, jax.process_count()
    mesh = make_mesh()  # all global devices on the data axis
    # host-replicated loader: every process sees the full global batch and
    # make_global_batch cuts out + contributes only its own rows
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = make_global_batch(mesh, x, P("data", None))
    assert arr.shape == (8, 3), arr.shape
    total = float(jax.jit(lambda a: a.sum())(arr))
    assert total == float(x.sum()), (total, float(x.sum()))
    sl = local_batch_slice(8)
    expect = slice(pid * 4, pid * 4 + 4)
    assert sl == expect, (sl, expect)
    print(f"MPOK {pid}", flush=True)
    """
)


TRAIN_WORKER = textwrap.dedent(
    """
    import sys
    pid, nproc, port, repo = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    sys.path.insert(0, repo)
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vmlmf_tpu.cells import VMLMFCell
    from vmlmf_tpu.nn.models import HARNet, LMModel
    from vmlmf_tpu.parallel.mesh import make_mesh
    from vmlmf_tpu.train.har import HARTrainer
    from vmlmf_tpu.train.lm import LMTrainer

    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc  # 2 local devices per process

    def materialize(mesh, tree):
        # replicate every leaf (gloo all-gathers the remote shards) so each
        # process can read full values for comparison
        rep = NamedSharding(mesh, P())
        gathered = jax.jit(lambda t: t, out_shardings=rep)(tree)
        return jax.tree_util.tree_map(np.asarray, gathered)

    def tree_close(a, b, what):
        la = jax.tree_util.tree_leaves(a)
        lb = jax.tree_util.tree_leaves(b)
        assert len(la) == len(lb), what
        for x, y in zip(la, lb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-5, rtol=1e-5, err_msg=what)

    # ---- HAR: one data-parallel Adam step across both processes ----------
    model = HARNet(input_size=9, layer_sizes=(16,), num_classes=6,
                   cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4))
    x = np.random.RandomState(0).normal(size=(8, 5, 9)).astype(np.float32)
    y = np.random.RandomState(1).randint(0, 6, size=(8,)).astype(np.int32)

    ref = HARTrainer(model, learning_rate=1e-2, seed=7)
    p_ref, o_ref = ref.init()
    p_ref, o_ref, loss_ref = ref._train_step(p_ref, o_ref, x, y)

    mesh = make_mesh()  # all 4 global devices on 'data'
    dp = HARTrainer(model, learning_rate=1e-2, seed=7, mesh=mesh)
    p_dp, o_dp = dp.init()
    xb, yb = dp.commit_batch(x, y)  # this process contributes rows pid*4:+4
    p_dp, o_dp, loss_dp = dp._train_step(p_dp, o_dp, xb, yb)
    np.testing.assert_allclose(float(loss_dp), float(loss_ref),
                               atol=1e-6, rtol=1e-6)
    tree_close(materialize(mesh, (p_dp, o_dp)),
               (jax.device_get(p_ref), jax.device_get(o_ref)), "har params")

    # ---- HAR on the PALLAS backend across both processes: the fused scan
    # kernel runs shard_mapped over the 4-device data axis spanning the
    # process boundary (parallel/spmd.kernel_spmd; weight-grad psum rides
    # gloo) — the round-5 kernel x mesh composition on a real cluster ------
    pmodel = HARNet(input_size=9, layer_sizes=(16,), num_classes=6,
                    backend="pallas",
                    cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4))
    pref = HARTrainer(pmodel, learning_rate=1e-2, seed=7)
    pp_ref, po_ref = pref.init()
    pp_ref, po_ref, ploss_ref = pref._train_step(pp_ref, po_ref, x, y)
    pdp = HARTrainer(pmodel, learning_rate=1e-2, seed=7, mesh=mesh)
    pp, po = pdp.init()
    xb2, yb2 = pdp.commit_batch(x, y)
    pp, po, ploss = pdp._train_step(pp, po, xb2, yb2)
    np.testing.assert_allclose(float(ploss), float(ploss_ref),
                               atol=1e-5, rtol=1e-5)
    tree_close(materialize(mesh, pp), jax.device_get(pp_ref),
               "pallas cross-process params")

    # ---- LM: one vocab-sharded + data-parallel SGD step ------------------
    lm = LMModel(vocab_size=32, hidden_size=16, num_layers=1,
                 cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=4, u_rank=4),
                 dropout_rate=0.0, winit=0.05)
    ids = np.random.RandomState(2).randint(0, 32, size=(6, 4)).astype(np.int32)
    tgt = np.random.RandomState(3).randint(0, 32, size=(6, 4)).astype(np.int32)
    rng = jax.random.PRNGKey(5)
    lr = jnp.float32(0.5)

    ref_lm = LMTrainer(lm, batch_size=4, seq_length=6, seed=0)
    pr = ref_lm.init()
    sr = ref_lm.state0()
    pr, sr, loss_r, _ = ref_lm._train_step(pr, sr, ids, tgt, lr, rng)

    mesh2 = make_mesh(model=2)  # (data=2, model=2): model axis intra-process
    sh_lm = LMTrainer(lm, batch_size=4, seq_length=6, seed=0, mesh=mesh2)
    ps = sh_lm.init()
    ss = sh_lm.state0()
    xb, yb = sh_lm.commit_batch(ids, tgt)
    ps, ss, loss_s, _ = sh_lm._train_step(ps, ss, xb, yb, lr, rng)
    np.testing.assert_allclose(float(loss_s), float(loss_r),
                               atol=1e-5, rtol=1e-5)
    tree_close(materialize(mesh2, (ps, ss)),
               (jax.device_get(pr), jax.device_get(sr)), "lm params/state")

    # ---- Ranker: sharded top-K retrieval with the item table row-sharded
    # ACROSS the two processes (model axis spans the process boundary — the
    # north-star "multi-host row-sharded item-embedding table" for real:
    # the per-shard top-k candidates merge over gloo) -----------------------
    from vmlmf_tpu.parallel.sharding import lm_param_sharding
    from vmlmf_tpu.serve.ranker import SessionRanker

    rk = SessionRanker.create(256, hidden_size=16, num_layers=1,
                              w_rank=4, u_rank=4, backend="xla")
    rparams = rk.init(jax.random.PRNGKey(0))
    sess = np.random.RandomState(4).randint(0, 256, (9, 4)).astype(np.int32)
    h, _ = rk.encode(rparams, jnp.asarray(sess))
    ov, oi = rk.topk(rparams, h, 10)  # replicated single-device oracle

    mesh4 = make_mesh(data=1, model=4)  # 4 global devices: 2 per process
    rp_s = jax.device_put(rparams, lm_param_sharding(rparams, mesh4))
    rep4 = NamedSharding(mesh4, P())
    sv, si = jax.jit(
        lambda p, hh: rk.topk_sharded(p, hh, 10, mesh4, data_sharded=False),
        out_shardings=(rep4, rep4))(rp_s, jax.device_put(h, rep4))
    np.testing.assert_array_equal(np.asarray(si), np.asarray(oi),
                                  err_msg="cross-process sharded top-K")
    np.testing.assert_allclose(np.asarray(sv), np.asarray(ov),
                               atol=1e-5, rtol=1e-5,
                               err_msg="cross-process sharded top-K scores")

    print(f"MPTRAIN-OK {pid}", flush=True)
    """
)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_cluster(tmp_path, source, marker, timeout=240):
    worker = tmp_path / "worker.py"
    worker.write_text(source)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = str(_free_port())
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu via jax.config
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", port, repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"{marker} {pid}" in out


@pytest.mark.slow
def test_two_process_global_batch(tmp_path):
    _run_cluster(tmp_path, WORKER, "MPOK", timeout=180)


@pytest.mark.slow
def test_two_process_train_steps(tmp_path):
    """One HAR data-parallel Adam step and one LM vocab-sharded SGD step
    across a REAL 2-process gloo cluster must produce the same parameters
    (to fp32 tolerance) as the single-process run — gradient psum and the
    sharded embedding/softmax collectives exercised across process
    boundaries, not just virtual devices (r2-VERDICT item 3)."""
    _run_cluster(tmp_path, TRAIN_WORKER, "MPTRAIN-OK")
