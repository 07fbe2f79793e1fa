"""Define a new compressed cell and run it through the framework's stack.

Any object following the Cell protocol (init/prepare/inp/step/state0)
composes with RNN, the models, the trainers, and the mesh machinery.
"""
import dataclasses

import jax
import jax.numpy as jnp

from vmlmf_tpu.cells.base import Cell, lstm_update, normal_init
from vmlmf_tpu.nn.models import HARNet
from vmlmf_tpu.train.har import HARTrainer


@dataclasses.dataclass(frozen=True)
class ResidualLowRankLSTM(Cell):
    """Low-rank LSTM whose recurrence adds an identity (residual) path."""

    rank: int = 8

    def init(self, key, dtype=jnp.float32):
        n, h, r = self.input_size, self.hidden_size, self.rank
        ks = jax.random.split(key, 4)
        return {
            "wf": normal_init(ks[0], (n, r), dtype=dtype),
            "wp": normal_init(ks[1], (r, 4 * h), dtype=dtype),
            "uf": normal_init(ks[2], (h, r), dtype=dtype),
            "up": normal_init(ks[3], (r, 4 * h), dtype=dtype),
            "b": jnp.ones((4 * h,), dtype),
        }

    def inp(self, prep, xs):
        return (xs @ prep["wf"]) @ prep["wp"] + prep["b"]

    def step(self, prep, gi_t, state):
        h, c = state
        gr = (h @ prep["uf"]) @ prep["up"]
        gr = gr + jnp.tile(h, (1,) * (h.ndim - 1) + (4,))  # residual into every gate
        h2, c2 = lstm_update(gi_t + gr, c)
        return (h2, c2), h2


model = HARNet(input_size=9, layer_sizes=(64,),
               cell_factory=lambda n, h: ResidualLowRankLSTM(n, h, rank=8),
               num_classes=6)
trainer = HARTrainer(model, batch_size=16)
params, opt = trainer.init()
x = jax.random.normal(jax.random.PRNGKey(0), (64, 24, 9))
y = jax.random.randint(jax.random.PRNGKey(1), (64,), 0, 6)
params, opt, hist = trainer.fit(params, opt, x, y, epochs=3)
print("final loss:", hist[-1]["loss"])
