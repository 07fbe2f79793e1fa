"""Serving example: prefill + blockwise autoregressive decode.

Run: python examples/05_serving.py   (any backend; compiles two executables)

The reference has no generation path; this is the TPU-native serving story:
the prompt is one scan dispatch (time-batched input projections on the MXU),
then each generated block is ONE device-resident `lax.scan` — no
host<->device traffic until the block is done.  Chain blocks through
`return_logits=True`; never step tokens eagerly between blocks.
"""

import jax
import jax.numpy as jnp

from vmlmf_tpu.cells import VMLMFCell
from vmlmf_tpu.nn.models import LMModel
from vmlmf_tpu.serve import Decoder

VOCAB, HIDDEN, BATCH = 1000, 64, 4

model = LMModel(
    vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=2,
    cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=16, u_rank=16),
    dropout_rate=0.0, winit=0.05,
)
params = model.init(jax.random.PRNGKey(0))
dec = Decoder(model)

# one-call generation (prefill + one decode block)
prompt = jax.random.randint(jax.random.PRNGKey(1), (12, BATCH), 0, VOCAB)
tokens = dec.generate(params, prompt, max_new_tokens=32,
                      key=jax.random.PRNGKey(2), temperature=0.8, top_k=50)
print("sampled:", tokens.shape, tokens[:4, 0])

# beam search: one device-resident scan; beams sorted by total log-prob
toks, scores = dec.beam_search(params, prompt, steps=16, beams=4)
print("beam tokens:", toks.shape, "top scores:", scores[:, 0])

# streaming-style loop: sampled blocks chained fully on device (an untrained
# model decoded greedily collapses to a fixed point — sample for the demo)
states = model.state0(BATCH)
logits, states = dec.prefill(params, prompt, states)
key = jax.random.PRNGKey(3)
for block in range(3):
    key, sub = jax.random.split(key)
    toks, states, logits = dec.decode(params, logits, states, steps=16,
                                      key=sub, temperature=1.0,
                                      return_logits=True)
    print(f"block {block}: first stream continues with {toks[:, 0].tolist()}")
