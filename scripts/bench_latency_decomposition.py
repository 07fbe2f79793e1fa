"""Decompose the HAR train step's time: serial-chain latency vs bandwidth.

Protocol: hold the activation count T*B (and so FLOPs and HBM bytes) fixed
while varying T.  A bandwidth/compute-bound step is invariant in T; a
serial-latency-bound step scales linearly with T (the per-timestep
dependent-matmul + VPU-epilogue chain).  The slope IS the per-step serial
latency; the T->0 intercept is the per-batch overhead (dispatch, glue,
Adam).

Usage: python scripts/bench_latency_decomposition.py [rounds]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def measure(t, b, rounds, fuse=64, feats=77):
    from vmlmf_tpu.cells import VMLMFCell
    from vmlmf_tpu.nn.models import HARNet
    from vmlmf_tpu.train.har import HARTrainer

    model = HARNet(input_size=feats, layer_sizes=(180,),
                   cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=8, u_rank=6),
                   backend="pallas")
    tr = HARTrainer(model, learning_rate=2e-3, batch_size=b,
                    fuse_batches=fuse)
    p, o = tr.init()
    xs = jax.random.normal(jax.random.PRNGKey(0), (fuse, b, t, feats))
    ys = jax.random.randint(jax.random.PRNGKey(1), (fuse, b), 0, 18)
    p, o, losses = tr._fused_steps(p, o, xs, ys)  # compile + warm
    l0 = float(losses[-1])
    vals = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(3):
            p, o, losses = tr._fused_steps(p, o, xs, ys)
        l1 = float(losses[-1])
        vals.append((time.perf_counter() - t0) / (3 * fuse) * 1e6)
    assert l1 != l0
    return statistics.median(vals)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    # fixed T*B = 1944 activations per batch step (the demo config's count);
    # every T divides 1944 exactly so all points carry identical work
    configs = [(8, 243), (12, 162), (24, 81), (36, 54)]
    res = []
    for t, b in configs:
        us = measure(t, b, rounds)
        res.append((t, b, us))
        print(f"T={t:3d} B={b:3d}: {us:8.1f} us/batch-step "
              f"({b / us * 1e6 / 1e3:.1f}k seq/s-equivalent)")
    # least-squares us = a*T + c
    n = len(res)
    sx = sum(t for t, _, _ in res)
    sy = sum(u for _, _, u in res)
    sxx = sum(t * t for t, _, _ in res)
    sxy = sum(t * u for t, _, u in res)
    a = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    c = (sy - a * sx) / n
    print(f"fit: time = {a:.2f} us/timestep * T + {c:.1f} us overhead "
          f"(serial fraction at T=24: {a * 24 / (a * 24 + c):.2f})")


if __name__ == "__main__":
    main()
