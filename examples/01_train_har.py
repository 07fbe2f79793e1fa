"""Train a VMLMF HAR classifier (the reference demo.sh config) end to end.

Runs on any backend (CPU/TPU); uses synthetic data unless you pass a dataset
folder produced by `python -m vmlmf_tpu.data.download opp`.
"""
import sys

from vmlmf_tpu.cells import VMLMFCell
from vmlmf_tpu.data.har import load_or_synthesize
from vmlmf_tpu.nn.models import HARNet
from vmlmf_tpu.train.har import HARTrainer, evaluate
from vmlmf_tpu.utils.analytics import count_params

folder = sys.argv[1] if len(sys.argv) > 1 else None
x_tr, y_tr, x_te, y_te = load_or_synthesize("opp", folder)

model = HARNet(
    input_size=x_tr.shape[-1], layer_sizes=(180,),
    cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=8, u_rank=6),
)
trainer = HARTrainer(model, learning_rate=2e-3, batch_size=81)
params, opt_state = trainer.init()
print(f"params: {count_params(params) / 1e3:.1f}K")
params, opt_state, history = trainer.fit(params, opt_state, x_tr, y_tr, epochs=5)
print(evaluate(model, params, x_te, y_te))
