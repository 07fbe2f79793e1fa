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


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_global_batch(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
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
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"MPOK {pid}" in out
