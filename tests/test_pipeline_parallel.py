"""Pipeline parallelism (layer-per-device wavefront): parity on a virtual mesh.

Runs on 8 virtual CPU devices (conftest).  The pipeline-parallel scan must be
numerically equivalent to the single-device sequential schedule — same ys,
final states, and gradients — with the layers sharded one-per-device over the
mesh's 'model' axis and the batch optionally sharded over 'data'.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmlmf_tpu.cells import VMLMFCell
from vmlmf_tpu.nn.recurrence import RNN
from vmlmf_tpu.parallel.mesh import make_mesh
from vmlmf_tpu.parallel.pipeline_parallel import pipeline_parallel_scan


def _stack(sizes, w_rank=4, u_rank=4):
    return tuple(
        VMLMFCell(sizes[i], sizes[i + 1], w_rank=w_rank, u_rank=u_rank)
        for i in range(len(sizes) - 1)
    )


def _setup(layers, t=6, batch=4, in_size=5, hidden=12, seed=0):
    cells = _stack((in_size,) + (hidden,) * layers)
    rnn = RNN(cells)
    params = rnn.init(jax.random.PRNGKey(seed))
    preps = [c.prepare(p) for c, p in zip(cells, params)]
    xs = jax.random.normal(jax.random.PRNGKey(seed + 1), (t, batch, in_size))
    states = [c.state0(batch) for c in cells]
    return cells, rnn, params, preps, xs, states


@pytest.mark.parametrize("data,model", [(2, 4), (1, 8)])
def test_matches_sequential(data, model):
    mesh = make_mesh(data=data, model=model)
    cells, rnn, params, preps, xs, states = _setup(layers=model)
    ys_ref, fin_ref = rnn(params, xs, time_major=True)
    ys, fin = pipeline_parallel_scan(cells, preps, xs, states, mesh)
    np.testing.assert_allclose(ys_ref, ys, atol=1e-5, rtol=1e-5)
    for (ha, ca), (hb, cb) in zip(fin_ref, fin):
        np.testing.assert_allclose(ha, hb, atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(ca, cb, atol=1e-5, rtol=1e-5)


def test_gradients_match_sequential():
    mesh = make_mesh(data=2, model=4)
    cells, rnn, params, preps, xs, states = _setup(layers=4)

    def loss_seq(p):
        ys, _ = rnn(p, xs, time_major=True)
        return jnp.sum(ys**2)

    def loss_pipe(p):
        preps = [c.prepare(pp) for c, pp in zip(cells, p)]
        ys, _ = pipeline_parallel_scan(cells, preps, xs, states, mesh)
        return jnp.sum(ys**2)

    g_a = jax.grad(loss_seq)(params)
    g_b = jax.grad(loss_pipe)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_a), jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_jit_and_nonzero_state():
    mesh = make_mesh(data=1, model=4)
    cells, rnn, params, preps, xs, _ = _setup(layers=4)
    states = [
        (
            jax.random.normal(jax.random.PRNGKey(30 + i), (4, 12)),
            jax.random.normal(jax.random.PRNGKey(40 + i), (4, 12)),
        )
        for i in range(4)
    ]
    ys_ref, fin_ref = rnn(params, xs, states, time_major=True)

    @jax.jit
    def run(params):
        preps = [c.prepare(p) for c, p in zip(cells, params)]
        return pipeline_parallel_scan(cells, preps, xs, states, mesh)

    ys, fin = run(params)
    np.testing.assert_allclose(ys_ref, ys, atol=1e-5, rtol=1e-5)
    for (ha, ca), (hb, cb) in zip(fin_ref, fin):
        np.testing.assert_allclose(ha, hb, atol=1e-5, rtol=1e-5)


def test_layer_count_must_match_axis():
    mesh = make_mesh(data=2, model=4)
    cells, _, params, preps, xs, states = _setup(layers=3)
    with pytest.raises(AssertionError, match="pipeline needs layers"):
        pipeline_parallel_scan(cells, preps, xs, states, mesh)


def test_dropout_runs_and_is_stochastic():
    mesh = make_mesh(data=1, model=4)
    cells, _, params, preps, xs, states = _setup(layers=4)
    ys1, _ = pipeline_parallel_scan(
        cells, preps, xs, states, mesh, dropout_rate=0.5,
        rng=jax.random.PRNGKey(0))
    ys2, _ = pipeline_parallel_scan(
        cells, preps, xs, states, mesh, dropout_rate=0.5,
        rng=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(ys1)).all()
    assert not np.allclose(ys1, ys2)
