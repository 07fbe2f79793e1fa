"""Pipeline-parallel recurrence: one layer per device, wavefront over ICI.

A 4-layer VMLMF stack with layer l on device l of the mesh's 'model' axis and
the batch sharded over 'data'; one SGD step flows gradients through the
ppermute chain.  On one host, test with 8 virtual devices:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/04_pipeline_parallel.py
"""
import jax
import jax.numpy as jnp

from vmlmf_tpu.cells import VMLMFCell
from vmlmf_tpu.parallel.mesh import make_mesh
from vmlmf_tpu.parallel.pipeline_parallel import pipeline_parallel_scan

LAYERS, HIDDEN, T, BATCH = 4, 64, 20, 16
mesh = make_mesh(model=LAYERS)  # (data x model); data gets the rest

cells = tuple(VMLMFCell(HIDDEN, HIDDEN, w_rank=16, u_rank=16) for _ in range(LAYERS))
params = [c.init(jax.random.PRNGKey(i)) for i, c in enumerate(cells)]
xs = jax.random.normal(jax.random.PRNGKey(10), (T, BATCH, HIDDEN))
target = jax.random.normal(jax.random.PRNGKey(11), (T, BATCH, HIDDEN))
states = [c.state0(BATCH) for c in cells]


@jax.jit
def train_step(params):
    def loss_fn(params):
        preps = [c.prepare(p) for c, p in zip(cells, params)]
        ys, _ = pipeline_parallel_scan(cells, preps, xs, states, mesh)
        return jnp.mean((ys - target) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return jax.tree_util.tree_map(lambda p, g: p - 0.1 * g, params, grads), loss


for step in range(5):
    params, loss = train_step(params)
    print(f"step {step}: loss {float(loss):.5f}")
