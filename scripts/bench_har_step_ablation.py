"""Ablate the HAR fused train step to locate the ~215us T-invariant cost.

docs/latency.md establishes the step is fixed-overhead bound (T-sweep at
constant T*B: slope ~0).  This script times progressively smaller step
bodies under the same fused-scan protocol, interleaved (drift-cancelled):

  full     — pallas fwd + bwd + Adam update          (the production step)
  sgd      — pallas fwd + bwd + plain p -= lr*g      (Adam ops removed)
  grad     — pallas fwd + bwd, params untouched       (update ops removed;
             carry still threads params so the scan shape matches)
  fwd      — pallas fwd + loss only                   (backward removed)
  nohead   — pallas fwd only, sum(ys) loss            (head/CE removed)

Differences between adjacent rows price each component.  us/batch-step.

Usage: python scripts/bench_har_step_ablation.py [rounds]
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def build(kind, model, opt):
    def loss_fn(p, xb, yb):
        logits = model.apply(p, xb)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, yb).mean()

    def nohead_loss(p, xb, yb):
        ys, _ = model.rnn(p["rnn"], xb)
        return jnp.sum(ys[:, -1]) * 1e-6

    @jax.jit
    def fused(params, opt_state, xs, ys):
        def body(carry, batch):
            p, o = carry
            xb, yb = batch
            if kind == "fwd":
                loss = loss_fn(p, xb, yb)
                return (p, o), loss
            if kind == "nohead":
                loss = nohead_loss(p, xb, yb)
                return (p, o), loss
            fn = nohead_loss if kind == "grad_nohead" else loss_fn
            loss, grads = jax.value_and_grad(fn)(p, xb, yb)
            if kind == "full":
                updates, o = opt.update(grads, o)
                p = optax.apply_updates(p, updates)
            elif kind == "sgd":
                p = jax.tree_util.tree_map(lambda a, g: a - 2e-3 * g, p, grads)
            elif kind in ("grad", "grad_nohead"):
                # fold the grads into the loss so nothing is dead-code
                loss = loss + 1e-30 * sum(
                    jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (xs, ys))
        return params, opt_state, losses

    return fused


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from vmlmf_tpu.cells import VMLMFCell
    from vmlmf_tpu.nn.models import HARNet
    from vmlmf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    batch, t, feats, fuse = 81, 24, 77, 64
    model = HARNet(input_size=feats, layer_sizes=(180,),
                   cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=8,
                                                       u_rank=6),
                   backend="pallas")
    opt = optax.adam(2e-3)
    xs = jax.random.normal(jax.random.PRNGKey(0), (fuse, batch, t, feats))
    ys = jax.random.randint(jax.random.PRNGKey(1), (fuse, batch), 0, 18)

    kinds = ["full", "sgd", "grad", "fwd", "nohead"]
    runners, state = {}, {}
    for kind in kinds:
        fn = build(kind, model, opt)
        p = model.init(jax.random.PRNGKey(3))
        o = opt.init(p)
        p, o, losses = fn(p, o, xs, ys)  # compile + warm
        runners[kind] = fn
        state[kind] = (p, o, float(losses[-1]))
        print(f"compiled {kind}", flush=True)

    samples = {k: [] for k in kinds}
    for _ in range(rounds):
        for kind in kinds:
            p, o, l0 = state[kind]
            t0 = time.perf_counter()
            for _ in range(3):
                p, o, losses = runners[kind](p, o, xs, ys)
            l1 = float(losses[-1])  # D2H read closes the chain
            samples[kind].append((time.perf_counter() - t0) / (3 * fuse) * 1e6)
            state[kind] = (p, o, l1)

    meds = {k: statistics.median(v) for k, v in samples.items()}
    for k in kinds:
        print(f"{k:8s}: {meds[k]:7.1f} us/batch-step "
              f"(runs {[round(x, 1) for x in samples[k]]})")
    print(f"adam ops  : {meds['full'] - meds['sgd']:7.1f} us")
    print(f"sgd update: {meds['sgd'] - meds['grad']:7.1f} us")
    print(f"backward  : {meds['grad'] - meds['fwd']:7.1f} us")
    print(f"head+CE   : {meds['fwd'] - meds['nohead']:7.1f} us")
    print(f"fwd kernel+glue: {meds['nohead']:7.1f} us")


if __name__ == "__main__":
    main()
