"""Serving throughput of the session ranker on one chip: sessions scored/sec
vs item-table size.

One serving step = encode a [T, B] session batch through the fused Pallas
scan + score the full item table + top-K — all inside ONE jitted dispatch
(`SessionRanker.rank_next`).  Timing protocol: chain iterations through the
returned scores (feed a score-derived token back into the next batch) and
close with a single device-to-host value read, the same completion-proof
used by `bench.py` (block_until_ready on this tunneled runtime can return
before queued work executes).

Usage: python scripts/bench_ranker.py [T] [B] [k] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(n_items, t=35, b=128, k=100, iters=20, hidden=650, rank=300):
    from vmlmf_tpu.serve.ranker import SessionRanker

    r = SessionRanker.create(n_items, hidden_size=hidden, num_layers=1,
                             w_rank=rank, u_rank=rank, backend="pallas")
    params = r.init(jax.random.PRNGKey(0))

    @jax.jit
    def step(params, sess):
        scores, ids = r.rank_next(params, sess, k)
        # chain: next batch depends on this step's output (forces execution)
        nxt = jnp.concatenate([sess[1:], ids[:, :1].T % n_items], axis=0)
        return scores, ids, nxt

    sess = jnp.asarray(np.random.RandomState(0).randint(0, n_items, (t, b)))
    scores, ids, sess = step(params, sess)  # compile + warm
    s0 = float(scores[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        scores, ids, sess = step(params, sess)
    s1 = float(scores[0, 0])  # single D2H read closes the chain
    dt = time.perf_counter() - t0
    assert s1 != s0, "serving chain did not execute"
    return b * iters / dt


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 35
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    for n in (10_000, 100_000, 1_000_000):
        sps = bench(n, t=t, b=b, k=k, iters=iters)
        print(f"items={n:>9,}: {sps/1e3:8.1f}k sessions/sec/chip "
              f"(T={t}, B={b}, k={k}, H=650 w300/u300 pallas encoder)")


if __name__ == "__main__":
    main()
