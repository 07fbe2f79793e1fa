"""Decompose a train step's time: serial-chain latency vs bandwidth/compute.

Protocol: hold the activation count T*B (and so FLOPs and HBM bytes) fixed
while varying T.  A bandwidth/compute-bound step is invariant in T; a
serial-latency-bound step scales linearly with T (the per-timestep
dependent-matmul + VPU-epilogue chain).  The slope IS the per-step serial
latency; the T->0 intercept is the T-invariant work (dispatch, glue,
optimizer — and for the LM, the whole softmax head, whose matmul sees
T*B rows regardless of T).

Modes:
  har — reference demo config (layers [180] w8/u6), T*B = 1944
  lm  — PTB flagship (2x650 w300/u300, fused-chunk manual SGD), T*B = 700
        tokens/chunk; the serial chain is 2 layers x T steps, so the fit is
        vs L*T (us per layer-timestep)

Fit outputs are committed to docs/latency.md and the HAR two-point version
is machine-checked per round via bench.py's har_us_per_timestep /
har_us_overhead / har_serial_fraction extras.

Usage: python scripts/bench_latency_decomposition.py [har|lm] [rounds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def measure(t, b, rounds, fuse=64, feats=77):
    """Device us per fused batch-step (relay solved out via the two-count
    fit — `bench.fit_device_seconds`)."""
    from bench import fit_device_seconds
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
    state = {"p": p, "o": o, "l": float(losses[-1])}

    def timed(iters):
        p, o = state["p"], state["o"]
        t0 = time.perf_counter()
        for _ in range(iters):
            p, o, losses = tr._fused_steps(p, o, xs, ys)
        l1 = float(losses[-1])
        dt = time.perf_counter() - t0
        assert l1 != state["l"]
        state.update(p=p, o=o, l=l1)
        return dt

    dev, _ = fit_device_seconds(timed, counts=(4, 32), rounds=rounds)
    return dev / fuse * 1e6


def measure_lm(t, b, rounds, fuse=16, vocab=10000, hidden=650, rank=300):
    """Device us per fused TBPTT chunk (700 tokens) at the PTB flagship
    shapes (relay solved out via the two-count fit)."""
    import jax.numpy as jnp
    import numpy as np

    from bench import fit_device_seconds
    from vmlmf_tpu.cells import VMLMFCell
    from vmlmf_tpu.nn.models import LMModel
    from vmlmf_tpu.train.lm import LMTrainer

    model = LMModel(vocab_size=vocab, hidden_size=hidden, num_layers=2,
                    cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=rank,
                                                        u_rank=rank),
                    dropout_rate=0.5, winit=0.05, backend="pallas")
    tr = LMTrainer(model, batch_size=b, seq_length=t, fuse_chunks=fuse)
    p = tr.init()
    s = tr.state0()
    xs = jnp.asarray(np.random.RandomState(0).randint(0, vocab, (fuse, t, b)))
    ys = jnp.asarray(np.random.RandomState(1).randint(0, vocab, (fuse, t, b)))
    p, s, losses, _ = tr._fused_chunks(p, s, xs, ys, jnp.float32(1.0),
                                       jax.random.PRNGKey(0))
    state = {"p": p, "s": s, "l": float(losses[-1]), "i": 0}

    def timed(iters):
        p, s = state["p"], state["s"]
        t0 = time.perf_counter()
        for i in range(iters):
            p, s, losses, _ = tr._fused_chunks(
                p, s, xs, ys, jnp.float32(1.0),
                jax.random.PRNGKey(state["i"] + i))
        l1 = float(losses[-1])
        dt = time.perf_counter() - t0
        assert l1 != state["l"]
        state.update(p=p, s=s, l=l1, i=state["i"] + iters)
        return dt

    dev, _ = fit_device_seconds(timed, counts=(2, 8), rounds=rounds)
    return dev / fuse * 1e6


def fit_and_print(res, x_of, x_name, x_eval):
    """Least-squares us = a*x + c over [(x, us)] points."""
    pts = [(x_of(r), r[-1]) for r in res]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(u for _, u in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * u for x, u in pts)
    a = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    c = (sy - a * sx) / n
    frac = a * x_eval / (a * x_eval + c)
    print(f"fit: time = {a:.2f} us/{x_name} * {x_name.upper()} + {c:.1f} us "
          f"T-invariant (serial fraction at {x_name}={x_eval}: {frac:.2f})")
    return a, c, frac


def main():
    from vmlmf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    mode = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].isdigit() else "har"
    rounds = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 3
    if mode == "lm":
        # fixed T*B = 700 tokens per chunk (the flagship chunk size); the
        # serial chain is L=2 layers x T steps
        configs = [(10, 70), (20, 35), (35, 20), (70, 10)]
        res = []
        for t, b in configs:
            us = measure_lm(t, b, rounds)
            res.append((t, b, us))
            print(f"T={t:3d} B={b:3d}: {us:8.1f} us/chunk "
                  f"({700 / us * 1e6 / 1e3:.1f}k words/s-equivalent)")
        fit_and_print(res, lambda r: 2 * r[0], "layer-step", 70)
        return
    # fixed T*B = 1944 activations per batch step (the demo config's count);
    # every T divides 1944 exactly so all points carry identical work
    configs = [(8, 243), (12, 162), (24, 81), (36, 54)]
    res = []
    for t, b in configs:
        us = measure(t, b, rounds)
        res.append((t, b, us))
        print(f"T={t:3d} B={b:3d}: {us:8.1f} us/batch-step "
              f"({b / us * 1e6 / 1e3:.1f}k seq/s-equivalent)")
    fit_and_print(res, lambda r: r[0], "timestep", 24)


if __name__ == "__main__":
    main()
