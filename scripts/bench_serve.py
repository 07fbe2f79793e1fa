"""Serving throughput: autoregressive decode tokens/sec on one chip.

PTB-config LM (vocab 10k, 2x650, VMLMF w300/u300) at several batch sizes.
Timing uses the completion-proof protocol (BASELINE.md): chain iterations
through their outputs, close with one device-to-host value read, and solve
the per-block DEVICE time out of two iteration counts
(`bench.fit_device_seconds`) — the closing read costs a ~30ms tunnel relay
that round <= 3 folded into the per-step numbers (~24us/step at the old
20x64 loop; docs/latency.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vmlmf_tpu.cells import VMLMFCell
from vmlmf_tpu.nn.models import LMModel
from vmlmf_tpu.serve import Decoder

VOCAB, STEPS, PROMPT_T = 10000, 64, 35


def bench(batch, iters=20):
    model = LMModel(
        vocab_size=VOCAB, hidden_size=650, num_layers=2,
        cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=300, u_rank=300),
        dropout_rate=0.0, winit=0.05)
    params = model.init(jax.random.PRNGKey(0))
    dec = Decoder(model)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (PROMPT_T, batch), 0, VOCAB)
    states = model.state0(batch)
    logits, states = dec.prefill(params, prompt, states)

    def run(logits, states, iters):
        toks = None
        for _ in range(iters):
            # chain: next block conditions on the last token's logits —
            # returned by decode itself, so the whole chain stays jitted
            # (an eager per-token bridge here costs hundreds of tunneled
            # op dispatches per iteration and dominates the measurement)
            toks, states, logits = dec.decode(
                params, logits, states, steps=STEPS, return_logits=True)
        return toks, logits

    toks, out = run(logits, states, 2)  # compile + warm
    # drain the queue with a REAL value read before starting the clock —
    # block_until_ready can return early on this runtime (BASELINE.md), so
    # without this the compile+warm work leaks into the timed window
    _ = int(jnp.sum(out[0]) != 0) + int(toks[-1, 0])

    def timed(n):
        t0 = time.perf_counter()
        toks, out = run(logits, states, n)
        _ = int(jnp.sum(out[0]) != 0) + int(toks[-1, 0])  # value read
        return time.perf_counter() - t0

    from bench import fit_device_seconds

    dev, _ = fit_device_seconds(timed, counts=(4, 24), rounds=3)
    tps = STEPS * batch / dev
    print(f"B={batch:4d}  greedy decode: {tps:,.0f} tokens/sec/chip "
          f"({dev/STEPS*1e6:.1f} us/step, device)")
    return tps


def bench_beam(batch, beams=4, iters=10):
    model = LMModel(
        vocab_size=VOCAB, hidden_size=650, num_layers=2,
        cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=300, u_rank=300),
        dropout_rate=0.0, winit=0.05)
    params = model.init(jax.random.PRNGKey(0))
    dec = Decoder(model)
    prompt = jax.random.randint(jax.random.PRNGKey(1), (PROMPT_T, batch), 0, VOCAB)
    _, scores = dec.beam_search(params, prompt, steps=STEPS, beams=beams)
    _ = float(jnp.sum(scores))  # drain compile + warm before the clock

    def timed(n):
        t0 = time.perf_counter()
        for _ in range(n):
            _, scores = dec.beam_search(params, prompt, steps=STEPS,
                                        beams=beams)
        _ = float(jnp.sum(scores))  # value read closes the chain
        return time.perf_counter() - t0

    from bench import fit_device_seconds

    dev, _ = fit_device_seconds(timed, counts=(3, 12), rounds=3)
    sps = STEPS * batch / dev
    print(f"B={batch:4d}  beam W={beams}: {sps:,.0f} sequence-positions/sec/chip "
          f"({dev/STEPS*1e6:.1f} us/step incl prefill, device)")


if __name__ == "__main__":
    for b in (1, 20, 128, 512):
        bench(b)
    for b in (20, 128):
        bench_beam(b)
