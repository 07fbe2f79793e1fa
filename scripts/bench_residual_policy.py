"""A/B the x-fused kernels' residual policies on-chip, drift-cancelled.

The tunneled runtime's run-to-run variance (±20%) swamps single-shot
comparisons, so this interleaves the two policies A,B,A,B,... inside one
process and reports per-policy medians.  Policies:
  recompute (VMLMF_PALLAS_SAVED_GATES=0) — backward recomputes gates/rank
  saved     (=1, the round-5 DEFAULT)    — backward streams saved residuals

Usage: python scripts/bench_residual_policy.py [har|gru|group] [rounds] [ENV]
ENV (default VMLMF_PALLAS_SAVED_GATES) is A/B'd between "0" ("A") and "1"
("B") — e.g. pass VMLMF_PALLAS_DENSE_REC to A/B the dense-materialized
recurrence instead (for knobs whose off state is unset, "0" must equal
unset, as it does for every VMLMF_* boolean knob).
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def make_runner(kind):
    import jax.numpy as jnp  # noqa: F401

    from vmlmf_tpu.cells import GRUCell, VMLMFCell, VMLMFGroupCell
    from vmlmf_tpu.nn.models import HARNet
    from vmlmf_tpu.train.har import HARTrainer

    batch, t, feats, fuse = 81, 24, 77, 64
    if kind == "har":
        factory = lambda n, h: VMLMFCell(n, h, w_rank=8, u_rank=6)
        sizes = (180,)
    elif kind == "gru":
        factory = lambda n, h: GRUCell(n, h, w_rank=9, u_rank=9)
        sizes = (64, 64)
    else:
        factory = lambda n, h: VMLMFGroupCell(n, h, w_rank=8,
                                              u_ranks=(2, 4), groups=2)
        sizes = (180,)

    def run(iters=5):
        # fresh trainer per call: the jit closure re-reads the env policy
        model = HARNet(input_size=feats, layer_sizes=sizes,
                       cell_factory=factory, backend="pallas")
        tr = HARTrainer(model, learning_rate=2e-3, batch_size=batch,
                        fuse_batches=fuse)
        p, o = tr.init()
        xs = jax.random.normal(jax.random.PRNGKey(0), (fuse, batch, t, feats))
        ys = jax.random.randint(jax.random.PRNGKey(1), (fuse, batch), 0, 18)
        p, o, losses = tr._fused_steps(p, o, xs, ys)  # compile + warm
        l0 = float(losses[-1])
        t0 = time.perf_counter()
        for _ in range(iters):
            p, o, losses = tr._fused_steps(p, o, xs, ys)
        l1 = float(losses[-1])
        assert l1 != l0
        return batch * iters * fuse / (time.perf_counter() - t0)

    return run


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "har"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    env = sys.argv[3] if len(sys.argv) > 3 else "VMLMF_PALLAS_SAVED_GATES"
    run = make_runner(kind)
    a, b = f"{env}=0", f"{env}=1"
    results = {a: [], b: []}
    for _ in range(rounds):
        os.environ[env] = "0"
        results[a].append(run())
        os.environ[env] = "1"
        results[b].append(run())
    os.environ.pop(env, None)
    for k, v in results.items():
        print(f"{kind} {k}: median {statistics.median(v)/1e3:.1f}k seq/s "
              f"(runs: {[round(x/1e3, 1) for x in v]})")
    ratio = statistics.median(results[a]) / statistics.median(results[b])
    print(f"{kind} =1 vs =0: {ratio:.3f}x")


if __name__ == "__main__":
    main()
