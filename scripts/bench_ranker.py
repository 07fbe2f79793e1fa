"""Serving throughput of the session ranker on one chip: sessions scored/sec
vs item-table size.

One serving step = encode a [T, B] session batch through the fused Pallas
scan + score the full item table + top-K — all inside ONE jitted dispatch
(`SessionRanker.rank_next`).  Timing protocol: chain iterations through the
returned scores (feed a score-derived token back into the next batch),
close with a single device-to-host value read (the completion-proof —
block_until_ready on this tunneled runtime can return before queued work
executes), and solve the per-dispatch DEVICE time out of two iteration
counts (`bench.fit_device_seconds` — the closing read costs a ~30ms tunnel
relay that would otherwise bias the number by iters).

Usage: python scripts/bench_ranker.py [T] [B] [k]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(n_items, t=35, b=128, k=100, hidden=650, rank=300):
    from bench import fit_device_seconds
    from vmlmf_tpu.serve.ranker import SessionRanker

    r = SessionRanker.create(n_items, hidden_size=hidden, num_layers=1,
                             w_rank=rank, u_rank=rank, backend="pallas")
    params = r.init(jax.random.PRNGKey(0))

    @jax.jit
    def step(params, sess, acc):
        scores, ids = r.rank_next(params, sess, k)
        # chain: next batch depends on this step's output (forces execution);
        # the accumulator strictly increases every step — greedy self-feeding
        # converges to a fixed cycle, so a raw score can legitimately repeat
        nxt = jnp.concatenate([sess[1:], ids[:, :1].T % n_items], axis=0)
        return nxt, acc + 1.0 + jnp.abs(scores[0, 0])

    sess = jnp.asarray(np.random.RandomState(0).randint(0, n_items, (t, b)))
    sess, acc = step(params, sess, jnp.float32(0.0))  # compile + warm
    state = {"sess": sess, "acc": acc, "a": float(acc)}

    def timed(iters):
        sess, acc = state["sess"], state["acc"]
        t0 = time.perf_counter()
        for _ in range(iters):
            sess, acc = step(params, sess, acc)
        a1 = float(acc)  # single D2H read closes the chain
        dt = time.perf_counter() - t0
        assert a1 > state["a"], "serving chain did not execute"
        state.update(sess=sess, acc=acc, a=a1)
        return dt

    dev, _ = fit_device_seconds(timed, counts=(8, 64), rounds=3)
    return b / dev


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 35
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    from vmlmf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    for n in (10_000, 100_000, 1_000_000):
        sps = bench(n, t=t, b=b, k=k)
        print(f"items={n:>9,}: {sps/1e3:8.1f}k sessions/sec/chip "
              f"(T={t}, B={b}, k={k}, H=650 w300/u300 pallas encoder)",
              flush=True)


if __name__ == "__main__":
    main()
