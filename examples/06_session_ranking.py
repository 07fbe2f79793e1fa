"""Session-based next-item ranking over a row-sharded item table.

Run: python examples/06_session_ranking.py
     (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
      to see the sharded path on a virtual 8-device mesh)

The BASELINE.json north-star stretch config: a VMLMF session encoder scores
a catalog whose embedding table is row-sharded over the mesh's `model`
axis.  Retrieval never materializes (or all-gathers) the full [B, N] score
row — each shard scores its own N/S rows, takes a local top-k, and only
S·k (score, id) candidates cross the ICI for the global merge.  Training
reuses the full LM engine (full-CE next-item objective, manual SGD) with
the same sharded table.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vmlmf_tpu.parallel.mesh import make_mesh
from vmlmf_tpu.parallel.sharding import lm_param_sharding
from vmlmf_tpu.serve import SessionRanker

N_ITEMS, HIDDEN, BATCH, T, K = 4096, 64, 8, 12, 10

ranker = SessionRanker.create(N_ITEMS, hidden_size=HIDDEN, num_layers=1,
                              w_rank=16, u_rank=16, backend="xla")

# ---- training: next-item prediction with the LM engine -------------------
n_dev = len(jax.devices())
mesh = make_mesh(data=2, model=n_dev // 2) if n_dev >= 4 else None
trainer = ranker.trainer(batch_size=BATCH, seq_length=T, mesh=mesh,
                         fuse_chunks=1, learning_rate=1.0)
params = trainer.init()
states = trainer.state0()
rng = np.random.RandomState(0)
for step in range(5):
    sess = rng.randint(0, N_ITEMS, (T, BATCH))
    nxt = np.roll(sess, -1, axis=0)
    xb, yb = trainer.commit_batch(sess, nxt)
    params, states, loss, _ = trainer._train_step(
        params, states, xb, yb, jnp.float32(1.0), jax.random.PRNGKey(step))
    print(f"step {step}: next-item CE {float(loss) / BATCH:.3f}")

# catalog too big for full-CE?  sampled softmax caps the head cost at
# O(T*B*S) (uniform negatives, logQ-corrected) and in-batch negatives keep
# the contrastive signal on actively-traded items — same trainer surface:
strainer = ranker.trainer(batch_size=BATCH, seq_length=T, mesh=mesh,
                          fuse_chunks=1, learning_rate=1.0,
                          sampled_softmax=128, in_batch_negatives=True)
sparams, sstates = strainer.init(), strainer.state0()
sess = rng.randint(0, N_ITEMS, (T, BATCH))
xb, yb = strainer.commit_batch(sess, np.roll(sess, -1, axis=0))
sparams, sstates, sloss, _ = strainer._train_step(
    sparams, sstates, xb, yb, jnp.float32(1.0), jax.random.PRNGKey(99))
print(f"sampled-softmax (S=128) CE {float(sloss) / BATCH:.3f}")

# ---- serving: encode the session, retrieve top-K -------------------------
session = jnp.asarray(rng.randint(0, N_ITEMS, (T, BATCH)))
if mesh is not None:
    params = jax.device_put(params, lm_param_sharding(params, mesh))
scores, ids = jax.jit(
    lambda p, s: ranker.rank_next(p, s, K, mesh=mesh, exclude_seen=True)
)(params, session)
print("top-K item ids for session 0:", np.asarray(ids)[0])
print("scores:", np.round(np.asarray(scores)[0], 3))

# production catalogs: method="approx" switches retrieval to the TPU-native
# approx_max_k MIPS path (~25x over a catalog-wide sort at 1M items,
# recall_target-controlled — BASELINE.md serving table)
_, ids_approx = jax.jit(lambda p, s: ranker.rank_next(
    p, s, K, mesh=mesh, method="approx", recall_target=0.95))(params, session)
print("approx top-K (recall>=0.95):", np.asarray(ids_approx)[0])

# the sharded retrieval equals the single-device oracle.  Scores must agree
# exactly; ids are compared as sets per row because exactly-tied scores may
# legitimately order differently between the blocked top-k and the
# cross-shard merge (see the ranker docstring's tie caveat).
oracle_scores, oracle_ids = ranker.rank_next(
    jax.device_put(jax.tree.map(np.asarray, params)), session, K,
    exclude_seen=True)
np.testing.assert_allclose(np.asarray(scores), np.asarray(oracle_scores),
                           rtol=1e-6, atol=1e-6)
for row, orow in zip(np.asarray(ids), np.asarray(oracle_ids)):
    assert set(row) == set(orow) or np.array_equal(
        np.sort(row), np.sort(orow)), (row, orow)
print("sharded top-K == unsharded oracle ✓")
