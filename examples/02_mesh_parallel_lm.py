"""Vocab-sharded + data-parallel LM training on a device mesh.

On one host, test with 8 virtual devices:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/02_mesh_parallel_lm.py
On a pod slice, call parallel.mesh.initialize_multihost() first.
"""
import jax
import jax.numpy as jnp

from vmlmf_tpu.cells import VMLMFCell
from vmlmf_tpu.data.ptb import load_or_synthesize, minibatch
from vmlmf_tpu.nn.models import LMModel
from vmlmf_tpu.parallel.mesh import make_mesh
from vmlmf_tpu.train.lm import LMTrainer

trn, vld, tst, vocab = load_or_synthesize(None, vocab_size=1000)
mesh = make_mesh(model=2)  # (data x model) over all devices

model = LMModel(vocab_size=vocab, hidden_size=64, num_layers=2,
                cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=16, u_rank=16),
                dropout_rate=0.5, winit=0.05)
trainer = LMTrainer(model, batch_size=8, seq_length=16, mesh=mesh, fuse_chunks=8)
params = trainer.init()
data = tuple(minibatch(ids, 8, 16) for ids in (trn, vld, tst))
params, history = trainer.fit(params, data, epochs=1)
print(history[-1])
