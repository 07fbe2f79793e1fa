"""Benchmark: VMLMF HAR training throughput on one TPU chip.

Headline config = the reference demo protocol (`script/demo.sh`, `main.py`):
OPP shapes [batch 81, T 24, 77 sensors], one VMLMF layer of 180 hidden,
w_rank 8 / u_rank 6, Adam, full train step (forward + BPTT + update).

``value`` is the framework's production path: hoisted input projection +
fused whole-scan Pallas recurrence (`--backend pallas`; factors + carry
VMEM-resident across the scan) + epoch-fused stepping (batches scanned
on-device in one dispatch — `HARTrainer.fuse_batches`).  Measured +7% over
the XLA-scan backend at this config (see BASELINE.md).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is a *reference-faithful execution strategy* measured on the same
chip: the identical cell math with the per-gate correction reductions and
input projections recomputed inside every timestep (the op structure of
`vmlmf.py:78-125`), dispatched per batch from the host (the reference's
per-batch loop, `train.py:58`).  Values > 1 mean the TPU-native design beats
a direct port of the reference's design.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import optax


def make_loss(model):
    def loss_fn(p, x, y):
        return optax.softmax_cross_entropy_with_integer_labels(
            model.apply(p, x), y).mean()

    return loss_fn


def build_naive_step(model, opt):
    """Reference-style execution: full unhoisted cell math inside the loop."""

    def forward(params, x):
        xs = jnp.swapaxes(x, 0, 1)  # [T, B, F]
        for cell, p in zip(model.rnn.cells, params["rnn"]):
            state0 = cell.state0(xs.shape[1], xs.dtype)

            def body(state, x_t, cell=cell, p=p):
                return cell.apply_step(p, x_t, state)

            _, xs = jax.lax.scan(body, state0, xs)
        return model.head(params["head"], xs[-1])

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            return optax.softmax_cross_entropy_with_integer_labels(
                forward(p, x), y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def main():
    from vmlmf_tpu.cells import VMLMFCell
    from vmlmf_tpu.nn.models import HARNet
    from vmlmf_tpu.train.har import HARTrainer
    from vmlmf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    batch, t, feats, fuse = 81, 24, 77, 64
    model = HARNet(input_size=feats, layer_sizes=(180,),
                   cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=8, u_rank=6),
                   backend="pallas")
    trainer = HARTrainer(model, learning_rate=2e-3, batch_size=batch,
                         fuse_batches=fuse)
    params, opt_state = trainer.init()
    xs = jax.random.normal(jax.random.PRNGKey(0), (fuse, batch, t, feats))
    ys = jax.random.randint(jax.random.PRNGKey(1), (fuse, batch), 0, 18)

    # production path: epoch-fused scan over batches.
    # Timing protocol: chain all iterations through (params, opt_state), then
    # ONE device-to-host value read of the final losses.  A real value read
    # must wait for the whole dependency chain; `block_until_ready` on this
    # tunneled runtime can return before queued work executes, and a read per
    # call pays ~30ms relay round-trip each — both distort badly.  The loss
    # value moving across calls proves the work actually ran.
    p, o, losses = trainer._fused_steps(params, opt_state, xs, ys)  # compile
    loss_start = float(losses[-1])
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, losses = trainer._fused_steps(p, o, xs, ys)
    loss_end = float(losses[-1])  # single D2H read closes the chain
    sec_per_batch = (time.perf_counter() - t0) / (iters * fuse)
    seq_per_sec = batch / sec_per_batch
    assert loss_end != loss_start, "training chain did not execute"

    # baseline path: unhoisted math, per-batch host dispatch
    # (fresh params — the production path donated its buffers)
    opt = optax.adam(2e-3)
    naive_step = build_naive_step(model, opt)
    pn = model.init(jax.random.PRNGKey(3))
    on = opt.init(pn)
    pn, on, loss = naive_step(pn, on, xs[0], ys[0])  # compile
    _ = float(loss)
    t0 = time.perf_counter()
    for i in range(50):
        pn, on, loss = naive_step(pn, on, xs[i % fuse], ys[i % fuse])
    _ = float(loss)  # single D2H read closes the chain
    sec_naive = (time.perf_counter() - t0) / 50

    print(json.dumps({
        "metric": "vmlmf_har_train_throughput",
        "value": round(seq_per_sec, 1),
        "unit": "sequences/sec/chip",
        "vs_baseline": round(sec_naive / sec_per_batch, 3),
    }))


if __name__ == "__main__":
    main()
