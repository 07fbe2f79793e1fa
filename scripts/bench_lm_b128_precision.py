"""Precision ablation at the B=128 LM throughput profile (r4 verdict #3).

BASELINE.md measured bf16 recurrence/head neutral at the B=20 protocol
config, where the step is serial-chain/latency bound.  At B=128 the
arithmetic-intensity argument gives bf16 its best chance — the head matmul
([T*B=4480, 650] @ [650, 10k]) and the batched recurrence tiles are wide
enough to be MXU-throughput sensitive.  Interleaved A/B/C in ONE process
(run-to-run drift on this tunneled runtime is +-20%; single-shot
comparisons are meaningless), device time via the two-count fit.

  f32        — production default (bit-exact vs the XLA scan)
  bf16       — VMLMF_PALLAS_PRECISION=bf16 (single-pass bf16 recurrent
               matmuls in the fused kernel, f32 accumulation)
  bf16+head  — + head_bf16=True (bf16 softmax-projection matmul, f32 accum)

Usage: python scripts/bench_lm_b128_precision.py [rounds]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vmlmf_tpu.cells import VMLMFCell
from vmlmf_tpu.nn.models import LMModel
from vmlmf_tpu.train.lm import LMTrainer
from vmlmf_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

VOCAB, HIDDEN, T, B, FUSE = 10000, 650, 35, 128, 16
xs = jnp.asarray(np.random.RandomState(0).randint(0, VOCAB, (FUSE, T, B)))
ys = jnp.asarray(np.random.RandomState(1).randint(0, VOCAB, (FUSE, T, B)))


def build(precision, head_bf16):
    # precision is captured at trace time from the env (scan_layer); set it
    # before the first dispatch of this trainer and it stays baked into the
    # jitted executable
    os.environ["VMLMF_PALLAS_PRECISION"] = precision
    model = LMModel(vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=2,
                    cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=300,
                                                        u_rank=300),
                    dropout_rate=0.5, winit=0.05, backend="pallas",
                    head_bf16=head_bf16)
    tr = LMTrainer(model, batch_size=B, seq_length=T, fuse_chunks=FUSE)
    p, s = tr.init(), tr.state0()
    p, s, losses, _ = tr._fused_chunks(p, s, xs, ys, jnp.float32(1.0),
                                       jax.random.PRNGKey(0))  # compile+warm
    state = {"p": p, "s": s, "l": float(losses[-1]), "i": 0}

    def timed(iters):
        os.environ["VMLMF_PALLAS_PRECISION"] = precision  # trace safety
        p, s = state["p"], state["s"]
        t0 = time.perf_counter()
        for i in range(iters):
            p, s, losses, _ = tr._fused_chunks(
                p, s, xs, ys, jnp.float32(1.0),
                jax.random.PRNGKey(state["i"] + i))
        l1 = float(losses[-1])
        dt = time.perf_counter() - t0
        assert l1 != state["l"], "chain did not execute"
        state.update(p=p, s=s, l=l1, i=state["i"] + iters)
        return dt

    return timed


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    timers = {
        "f32": build("f32", False),
        "bf16": build("bf16", False),
        "bf16+head": build("bf16", True),
    }
    lo_n, hi_n = 1, 4
    samples = {k: {lo_n: [], hi_n: []} for k in timers}
    for _ in range(rounds):
        for k, timed in timers.items():
            samples[k][lo_n].append(timed(lo_n))
            samples[k][hi_n].append(timed(hi_n))
    for k, s in samples.items():
        dev = max((statistics.median(s[hi_n]) - statistics.median(s[lo_n]))
                  / (hi_n - lo_n), 1e-12)
        wps = FUSE * T * B / dev
        print(f"{k:10s}: {wps / 1e3:8.1f}k words/sec  "
              f"({dev * 1e3:.2f} ms/fused-dispatch)")


if __name__ == "__main__":
    main()
