"""Compare LM training backends (xla / pallas / pipelined / pallas_pipelined)
on one chip.  The wavefront rows reproduce the retired-backend measurements
of docs/wavefront.md.

Reference PTB flagship config (lm_test.py:46-79): 2x650 VMLMF w300/u300,
batch 20, BPTT 35, dropout 0.5, manual SGD — full fused-chunk train steps.
Timing protocol per BASELINE.md: chain iterations through (params, state),
close with a single device-to-host value read, assert the value moved.
"""
import os, sys, time
os.environ.setdefault("VMLMF_EXPERIMENTAL_WAVEFRONT", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from vmlmf_tpu.cells import VMLMFCell
from vmlmf_tpu.nn.models import LMModel
from vmlmf_tpu.train.lm import LMTrainer
from vmlmf_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
print("backend:", jax.default_backend())

vocab, hidden, T, B, fuse = 10000, 650, 35, 20, 64
xs = jnp.asarray(np.random.RandomState(0).randint(0, vocab, (fuse, T, B)))
ys = jnp.asarray(np.random.RandomState(1).randint(0, vocab, (fuse, T, B)))

for backend in ["xla", "pallas", "pipelined", "pallas_pipelined"]:
    m = LMModel(vocab_size=vocab, hidden_size=hidden, num_layers=2,
                cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=300, u_rank=300),
                dropout_rate=0.5, winit=0.05, backend=backend)
    tr = LMTrainer(m, batch_size=B, seq_length=T, fuse_chunks=fuse)
    p = tr.init(); s = tr.state0()
    rng = jax.random.PRNGKey(0)
    p, s, losses, _ = tr._fused_chunks(p, s, xs, ys, jnp.float32(1.0), rng)  # compile
    l0 = float(losses[-1])
    iters = 6
    t0 = time.perf_counter()
    for i in range(iters):
        p, s, losses, _ = tr._fused_chunks(p, s, xs, ys, jnp.float32(1.0), jax.random.PRNGKey(i))
    l1 = float(losses[-1])
    dt = time.perf_counter() - t0
    assert l1 != l0, "chain did not execute"
    wps = iters * fuse * T * B / dt
    print(f"{backend:10s}: {wps/1e3:8.1f}k words/sec  (loss {l0:.3f} -> {l1:.3f})")
