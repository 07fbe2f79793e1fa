"""Benchmark: VMLMF training/inference throughput + roofline on one TPU chip.

Headline config = the reference demo protocol (`script/demo.sh`, `main.py`):
OPP shapes [batch 81, T 24, 77 sensors], one VMLMF layer of 180 hidden,
w_rank 8 / u_rank 6, Adam, full train step (forward + BPTT + update).

``value`` is the framework's production path: the x-fused whole-scan Pallas
recurrence (`--backend pallas`; the input projection runs INSIDE the kernel —
x streams at F=77 wide instead of gi at 4h=720, all weights VMEM-resident
across the scan, gi/dgi never touch HBM) + epoch-fused stepping (batches
scanned on-device in one dispatch — `HARTrainer.fuse_batches`).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is a *reference-faithful execution strategy* measured on the same
chip: the identical cell math with the per-gate correction reductions and
input projections recomputed inside every timestep (the op structure of
`vmlmf.py:78-125`), dispatched per batch from the host (the reference's
per-batch loop, `train.py:58`).  Values > 1 mean the TPU-native design beats
a direct port of the reference's design.

Timing protocol (round 4): every loop is timed at TWO iteration counts and
the per-dispatch DEVICE time solved out (`fit_device_seconds`) — the
closing D2H value read costs a ~30ms tunnel relay on this runtime, and
dividing raw loop time by steps folds an iteration-count-dependent share of
that relay into the throughput (rounds <= 3 under-reported the HAR headline
by ~1.5x; quantified in docs/latency.md).  The relay itself is recorded in
``extra.relay_ms``.  Production (non-tunneled) deployments never pay it:
results stream asynchronously and the read amortizes over an epoch.

``extra`` carries the machine-checkable secondary metrics so round-over-round
regressions are visible in BENCH_r*.json:
  * har_mfu / har_fraction_of_roofline / har_bound — achieved-vs-roofline for
    the HAR train step (analytic FLOPs from the reference's own FLOP model,
    `compression_cal.py:72-135`; HBM bytes from the documented estimate below),
  * lm_train_wps / lm_infer_wps — the PTB flagship (2x650 VMLMF w300/u300,
    B20/T35) fused-chunk training and no-grad inference words/sec,
  * lm_train_mfu — achieved fraction of the bf16 MXU peak for the LM train
    step (the rate TPU matmuls actually run at under JAX's default
    precision; redefined from the f32 peak in round 5 — docs/latency.md),
  * lm_train_wps_b128/_b256 (+ MFUs) — the large-batch throughput profiles
    (BASELINE.md LM-vs-batch row; B=256 is the post-lse-loss knee and the
    recommended profile), tracked so they cannot rot,
  * ranker_* — session-ranking serving throughput for both retrieval tiers
    plus the measured approx recall vs the exact ranking (the speed/recall
    trade is regression-guarded together).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
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


def detect_chip():
    """Best-effort chip generation for the roofline peaks table."""
    from vmlmf_tpu.utils.analytics import detect_chip as _detect

    return _detect()


def har_train_hbm_bytes(batch, t, feats, hidden, u_rank, n_params):
    """HBM traffic model of one x-fused Pallas HAR train step (per batch),
    fp32.  The x-fused kernel (`ops/pallas_scan.py` xin mode) streams the
    RAW input x instead of the hoisted gi [T,B,4h] and never materializes
    gi/dgi in HBM; the primal returns c_last (no dcs zeros-cotangent
    stream).  Under the round-5 DEFAULT (saved gates) the backward streams
    the [T,B,4h] gates and [T,B,r] h@U residuals (write fwd + read bwd) and
    the byte model counts those streams; VMLMF_PALLAS_SAVED_GATES=0 selects
    the recompute policy (gates/h@U rebuilt batched from x + saved h_prev,
    no residual streams) — the reported roofline fraction stays consistent
    with whichever policy the bench process traced.  Kernel streams are
    counted at the PADDED widths the chip actually moves (lane multiples of
    128); XLA-side glue at logical widths:
      fwd kernel:  x read; ys, cs writes [; gates, hu writes (saved policy)]
      bwd kernel:  x, ys (h_prev), cs (c_prev + c_t), dys reads; dx write
                   [; gates, hu reads (saved policy)]
      XLA glue:    x read (pad relayout), ys[-1] head read + dys write,
                   params/grads/opt-state (Adam m, v) ~ 10 accesses of P
    """
    import os

    f32 = 4
    pad = lambda n: -(-n // 128) * 128
    hp, fp, rp = pad(hidden), pad(feats), pad(u_rank)
    act = batch * t
    kernel_words = act * (
        fp + hp + hp            # fwd: x read; ys, cs writes
        + fp + hp + 2 * hp + hp  # bwd reads: x, h_prev, c_prev + c_t, dys
        + fp                    # dx write
    )
    if os.environ.get("VMLMF_PALLAS_SAVED_GATES", "1") != "0":
        kernel_words += act * 2 * (4 * hp + rp)  # gates + h@U, write + read
    xla_words = act * (feats + 2 * hidden) + 10 * n_params
    return f32 * (kernel_words + xla_words)


def bench_har():
    from vmlmf_tpu.cells import VMLMFCell
    from vmlmf_tpu.nn.models import HARNet
    from vmlmf_tpu.train.har import HARTrainer
    from vmlmf_tpu.utils.analytics import (
        chip_peaks,
        count_params,
        roofline_report,
        vmlmf_hw_flops,
    )

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
    # ONE device-to-host value read of the final losses (a real value read
    # must wait for the whole dependency chain; `block_until_ready` on this
    # tunneled runtime can return before queued work executes).  The closing
    # read costs a ~30ms tunnel relay, so the loop is timed at TWO iteration
    # counts and the per-dispatch DEVICE time solved out (fit_device_seconds)
    # — reporting raw loop time divided by steps would fold an
    # iteration-count-dependent share of the relay into the throughput
    # (docs/latency.md quantifies the bias).  The loss value moving across
    # calls proves the work actually ran.
    p, o, losses = trainer._fused_steps(params, opt_state, xs, ys)  # compile
    state = {"p": p, "o": o, "l": float(losses[-1])}

    def timed(iters):
        p, o = state["p"], state["o"]
        t0 = time.perf_counter()
        for _ in range(iters):
            p, o, losses = trainer._fused_steps(p, o, xs, ys)
        l1 = float(losses[-1])
        dt = time.perf_counter() - t0
        assert l1 != state["l"], "training chain did not execute"
        state.update(p=p, o=o, l=l1)
        return dt

    dev_sec, relay = fit_device_seconds(timed, counts=(4, 32), rounds=3)
    sec_per_batch = dev_sec / fuse
    seq_per_sec = batch / sec_per_batch
    p = state["p"]

    # roofline accounting: HARDWARE forward FLOPs x3 for fwd+bwd, documented
    # HBM-byte estimate, measured seconds.  NOTE: the reference's analytic
    # FLOP model (`model_flops`, compression_cal.py parity) counts each gate's
    # low-rank chain separately, ~4x the executed FLOPs of the shared-factor
    # implementation — it is the compression METRIC; MFU must use the FLOPs
    # the chip actually runs.
    fwd_flops = vmlmf_hw_flops(feats, 180, 8, 6) * t * batch
    train_flops = 3 * fwd_flops
    n_params = count_params(p)
    hbm = har_train_hbm_bytes(batch, t, feats, 180, 6, n_params)
    chip = detect_chip()
    roof = roofline_report(train_flops, hbm, sec_per_batch, chip=chip, dtype="f32")
    # MFU denominator: the bf16 MXU peak — the rate the chip actually runs
    # matmuls at (JAX's default TPU matmul precision executes f32 matmuls
    # as single-pass bf16 with f32 accumulation; measured fwd-head 62 TF/s
    # on v5e, above the 49 TF multi-pass 'f32 peak' — docs/latency.md r5).
    # Rounds <= 4 used the f32 peak: multiply old values by 49/197 (v5e)
    # to compare.
    mfu = roof["achieved_flops_per_s"] / chip_peaks(chip)["bf16"]

    # baseline path: unhoisted math, per-batch host dispatch (fresh params —
    # the production path donated its buffers).  Same two-count device fit
    # so the ratio compares device times, not relay-bias artifacts.
    opt = optax.adam(2e-3)
    naive_step = build_naive_step(model, opt)
    pn = model.init(jax.random.PRNGKey(3))
    on = opt.init(pn)
    pn, on, loss = naive_step(pn, on, xs[0], ys[0])  # compile
    nstate = {"p": pn, "o": on, "l": float(loss)}

    def timed_naive(iters):
        pn, on = nstate["p"], nstate["o"]
        t0 = time.perf_counter()
        for i in range(iters):
            pn, on, loss = naive_step(pn, on, xs[i % fuse], ys[i % fuse])
        l1 = float(loss)
        dt = time.perf_counter() - t0
        assert l1 != nstate["l"], "baseline chain did not execute"
        nstate.update(p=pn, o=on, l=l1)
        return dt

    sec_naive, _ = fit_device_seconds(timed_naive, counts=(16, 64), rounds=3)

    return {
        "seq_per_sec": seq_per_sec,
        "vs_baseline": sec_naive / sec_per_batch,
        "mfu": mfu,
        "fraction_of_roofline": roof["fraction_of_roofline"],
        "bound": roof["bound"],
        "chip": chip,
        "relay_ms": relay * 1e3,
    }


def _har_timer(model, batch=81, t=24, feats=77, fuse=64):
    """Compile a fused-epoch HAR trainer once and return a closure that
    times `iters` chained dispatches, closed by one D2H value read.
    Returns SECONDS for the whole loop (feed to `fit_device_seconds`)."""
    from vmlmf_tpu.train.har import HARTrainer

    tr = HARTrainer(model, learning_rate=2e-3, batch_size=batch,
                    fuse_batches=fuse)
    p, o = tr.init()
    xs = jax.random.normal(jax.random.PRNGKey(0), (fuse, batch, t, feats))
    ys = jax.random.randint(jax.random.PRNGKey(1), (fuse, batch), 0, 18)
    p, o, losses = tr._fused_steps(p, o, xs, ys)  # compile + warm
    state = {"p": p, "o": o, "l": float(losses[-1])}

    def timed(iters=3):
        p, o = state["p"], state["o"]
        t0 = time.perf_counter()
        for _ in range(iters):
            p, o, losses = tr._fused_steps(p, o, xs, ys)
        l1 = float(losses[-1])
        dt = time.perf_counter() - t0
        assert l1 != state["l"], "training chain did not execute"
        state.update(p=p, o=o, l=l1)
        return dt

    return timed


def fit_device_seconds(timed, counts=(4, 32), rounds=3):
    """Separate true per-dispatch DEVICE time from the timing loop's fixed
    cost (the closing D2H value read costs a ~30ms tunnel relay round trip
    on this runtime; dispatch enqueue is async/free).

    Measured model (docs/latency.md iters sweep, fit residuals < 3%):
        loop_seconds(iters) = device * iters + fixed
    Timing at two iteration counts and solving the 2x2 system removes the
    iteration-count-dependent bias that inflated every round <= 3 number
    (e.g. the r3 HAR headline at iters=10 carried 30.8ms/640 = 48us/step of
    relay on a 71us device step).  Rounds are interleaved across the two
    counts and medianed (drift-cancelling).  -> (device_seconds_per_dispatch,
    fixed_seconds_per_loop)."""
    import statistics

    lo, hi = counts
    samples = {lo: [], hi: []}
    for _ in range(rounds):
        samples[lo].append(timed(lo))
        samples[hi].append(timed(hi))
    tlo = statistics.median(samples[lo])
    thi = statistics.median(samples[hi])
    device = (thi - tlo) / (hi - lo)
    fixed = tlo - device * lo
    return max(device, 1e-12), max(fixed, 0.0)


def bench_har_variants(rounds=4):
    """Secondary HAR-family headline configs (machine-checked per round):
    group-VMLMF demo config and the legacy rank-9 GRU grid, both on the
    x-fused pallas path.

    Protocol (drift-cancelled + relay-free): this tunneled runtime drifts
    ±20%+ run-to-run and every timing loop's closing D2H read costs ~30ms
    of relay, so each config is timed at two iteration counts (device time
    solved out, `fit_device_seconds`) with the two configs' rounds
    INTERLEAVED (group, gru, group, gru, ...) inside one process — slow
    runtime drift hits both configs alike, so round-over-round deltas in
    BENCH_r*.json are attributable to code, not runtime weather (the
    `scripts/bench_residual_policy.py` protocol)."""
    import statistics

    from vmlmf_tpu.cells import GRUCell, VMLMFGroupCell
    from vmlmf_tpu.nn.models import HARNet

    batch, fuse = 81, 64
    timers = {
        "har_group_seq_per_sec": _har_timer(HARNet(
            input_size=77, layer_sizes=(180,), backend="pallas",
            cell_factory=lambda n, h: VMLMFGroupCell(
                n, h, w_rank=8, u_ranks=(2, 4), groups=2))),
        "gru_seq_per_sec": _har_timer(HARNet(
            input_size=77, layer_sizes=(64, 64), backend="pallas",
            cell_factory=lambda n, h: GRUCell(n, h, w_rank=9, u_rank=9))),
    }
    samples = {k: {4: [], 32: []} for k in timers}
    for _ in range(rounds):
        for k, timed in timers.items():
            samples[k][4].append(timed(4))
            samples[k][32].append(timed(32))
    out = {}
    for k, s in samples.items():
        # same positive-floor clamp as fit_device_seconds: a negative delta
        # (runtime drift exceeding the device time) must not write a
        # negative/infinite throughput into the BENCH artifact
        dev = max((statistics.median(s[32]) - statistics.median(s[4]))
                  / (32 - 4), 1e-12)
        out[k] = batch * fuse / dev
    return out


def bench_har_latency_fit(rounds=3):
    """Latency decomposition of the HAR train step, machine-checked: hold
    T*B=1944 activations fixed, vary T — a bandwidth/compute-bound step is
    T-invariant, a serial-chain-bound step scales linearly in T.  Two
    endpoints (T=8,B=243) and (T=24,B=81) give the per-timestep slope and
    the T-invariant intercept; `har_serial_fraction` is the T-scaling share
    at the demo config's T=24.  Round-4 finding (docs/latency.md): the
    fraction is ~0 and the device intercept ~72us — the step is bound by
    T-invariant work, NOT the serial chain; a positive slope in a later
    round means a kernel regression re-serialized the scan.  Full 4-point
    fit +
    methodology: `scripts/bench_latency_decomposition.py`.  Rounds are
    interleaved across the two configs and medianed (same drift-cancelling
    rationale as `bench_har_variants`)."""
    import statistics

    from vmlmf_tpu.cells import VMLMFCell
    from vmlmf_tpu.nn.models import HARNet

    def make(batch, t):
        model = HARNet(
            input_size=77, layer_sizes=(180,), backend="pallas",
            cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=8, u_rank=6))
        return _har_timer(model, batch=batch, t=t)

    # the fit's T-invariance protocol was established under the RECOMPUTE
    # residual policy; the round-5 saved-gates default makes the B=243
    # endpoint tile differently (policy-sensitive per-step time at fixed
    # T*B breaks the linear-in-T model with a spurious negative slope), so
    # the diagnostic pins recompute.  Policy captured at trace time — set
    # before the configs compile.
    import os as _os

    prev = _os.environ.get("VMLMF_PALLAS_SAVED_GATES")
    _os.environ["VMLMF_PALLAS_SAVED_GATES"] = "0"
    try:
        configs = {8: make(243, 8), 24: make(81, 24)}
        secs = {t: {4: [], 32: []} for t in configs}
        for _ in range(rounds):
            for t, timed in configs.items():
                secs[t][4].append(timed(4))
                secs[t][32].append(timed(32))
    finally:
        if prev is None:
            _os.environ.pop("VMLMF_PALLAS_SAVED_GATES", None)
        else:
            _os.environ["VMLMF_PALLAS_SAVED_GATES"] = prev

    def dev_us(s):  # device µs per batch-step, relay solved out
        dev = max((statistics.median(s[32]) - statistics.median(s[4]))
                  / (32 - 4), 1e-12)  # positive floor, as fit_device_seconds
        return dev / 64 * 1e6

    u8, u24 = dev_us(secs[8]), dev_us(secs[24])
    slope = (u24 - u8) / (24 - 8)
    intercept = u8 - slope * 8
    serial = slope * 24 / (slope * 24 + intercept)
    return {"har_us_per_timestep": slope, "har_us_overhead": intercept,
            "har_serial_fraction": serial}


def bench_lm(chip):
    """PTB flagship: 2x650 VMLMF w300/u300, B20/T35, fused-chunk manual SGD
    (training) and no-grad eval (inference) on the winning `pallas` backend
    (measured vs xla/pipelined/pallas_pipelined — BASELINE.md)."""
    from vmlmf_tpu.cells import VMLMFCell
    from vmlmf_tpu.nn.models import LMModel
    from vmlmf_tpu.train.lm import LMTrainer
    from vmlmf_tpu.utils.analytics import chip_peaks, vmlmf_hw_flops

    vocab, hidden, t, b, fuse = 10000, 650, 35, 20, 64
    model = LMModel(vocab_size=vocab, hidden_size=hidden, num_layers=2,
                    cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=300, u_rank=300),
                    dropout_rate=0.5, winit=0.05, backend="pallas")
    trainer = LMTrainer(model, batch_size=b, seq_length=t, fuse_chunks=fuse)
    params = trainer.init()
    states = trainer.state0()
    xs = jnp.asarray(np.random.RandomState(0).randint(0, vocab, (fuse, t, b)))
    ys = jnp.asarray(np.random.RandomState(1).randint(0, vocab, (fuse, t, b)))

    p, s, losses, _ = trainer._fused_chunks(params, states, xs, ys,
                                            jnp.float32(1.0), jax.random.PRNGKey(0))
    lstate = {"p": p, "s": s, "l": float(losses[-1]), "i": 0}

    def timed_train(iters):
        p, s = lstate["p"], lstate["s"]
        t0 = time.perf_counter()
        for i in range(iters):
            p, s, losses, _ = trainer._fused_chunks(
                p, s, xs, ys, jnp.float32(1.0),
                jax.random.PRNGKey(lstate["i"] + i))
        l1 = float(losses[-1])
        dt = time.perf_counter() - t0
        assert l1 != lstate["l"], "LM training chain did not execute"
        lstate.update(p=p, s=s, l=l1, i=lstate["i"] + iters)
        return dt

    dev_sec, _ = fit_device_seconds(timed_train, counts=(1, 5), rounds=3)
    train_wps = fuse * t * b / dev_sec
    p, s = lstate["p"], lstate["s"]

    # hardware train FLOPs/word: 2 recurrent layers + embed (gather) + head
    cell_fwd = vmlmf_hw_flops(hidden, hidden, 300, 300)
    head_fwd = 2 * hidden * vocab
    train_flops_per_word = 3 * (2 * cell_fwd + head_fwd)
    # bf16-peak denominator (see bench_har's MFU note / docs/latency.md r5)
    lm_mfu = train_wps * train_flops_per_word / chip_peaks(chip)["bf16"]

    # inference: fused no-grad eval — one dispatch per 64-chunk stack,
    # state carried on device (the serving-style batch-eval path)
    losses, s2 = trainer._eval_chunks(p, s, xs, ys)  # compile
    estate = {"s": s2, "l": float(losses[-1])}

    def timed_eval(iters):
        s2 = estate["s"]
        t0 = time.perf_counter()
        for _ in range(iters):
            losses, s2 = trainer._eval_chunks(p, s2, xs, ys)
        _ = float(losses[-1])
        dt = time.perf_counter() - t0
        estate["s"] = s2
        return dt

    edev, _ = fit_device_seconds(timed_eval, counts=(1, 5), rounds=3)
    infer_wps = fuse * t * b / edev

    # recommended throughput profile: B=128 (BASELINE.md LM-vs-batch row:
    # serving-style deployments should batch to ~128/chip — 1.26x the B=20
    # protocol config).  Machine-checked here so the recommendation cannot
    # silently rot; MFU against the same hw-FLOP model.
    b2, fuse2 = 128, 16
    tr2 = LMTrainer(model, batch_size=b2, seq_length=t, fuse_chunks=fuse2)
    p2 = tr2.init()
    s2 = tr2.state0()
    xs2 = jnp.asarray(np.random.RandomState(2).randint(0, vocab, (fuse2, t, b2)))
    ys2 = jnp.asarray(np.random.RandomState(3).randint(0, vocab, (fuse2, t, b2)))
    p2, s2, losses2, _ = tr2._fused_chunks(p2, s2, xs2, ys2, jnp.float32(1.0),
                                           jax.random.PRNGKey(0))
    bstate = {"p": p2, "s": s2, "l": float(losses2[-1]), "i": 0}

    def timed_b128(iters):
        p2, s2 = bstate["p"], bstate["s"]
        t0 = time.perf_counter()
        for i in range(iters):
            p2, s2, losses2, _ = tr2._fused_chunks(
                p2, s2, xs2, ys2, jnp.float32(1.0),
                jax.random.PRNGKey(bstate["i"] + i))
        l1 = float(losses2[-1])
        dt = time.perf_counter() - t0
        assert l1 != bstate["l"], "B=128 LM training chain did not execute"
        bstate.update(p=p2, s=s2, l=l1, i=bstate["i"] + iters)
        return dt

    bdev, _ = fit_device_seconds(timed_b128, counts=(1, 5), rounds=3)
    b128_wps = fuse2 * t * b2 / bdev
    b128_mfu = b128_wps * train_flops_per_word / chip_peaks(chip)["bf16"]

    # B=256: the post-lse-loss throughput knee (round-5 sweep: 748.9k /
    # 883.8k / 856.7k wps at B=128/256/512) — the recommended profile
    b3, fuse3 = 256, 8
    tr3 = LMTrainer(model, batch_size=b3, seq_length=t, fuse_chunks=fuse3)
    p3 = tr3.init()
    s3 = tr3.state0()
    xs3 = jnp.asarray(np.random.RandomState(6).randint(0, vocab, (fuse3, t, b3)))
    ys3 = jnp.asarray(np.random.RandomState(7).randint(0, vocab, (fuse3, t, b3)))
    p3, s3, losses3, _ = tr3._fused_chunks(p3, s3, xs3, ys3, jnp.float32(1.0),
                                           jax.random.PRNGKey(0))
    cstate = {"p": p3, "s": s3, "l": float(losses3[-1]), "i": 0}

    def timed_b256(iters):
        p3, s3 = cstate["p"], cstate["s"]
        t0 = time.perf_counter()
        for i in range(iters):
            p3, s3, losses3, _ = tr3._fused_chunks(
                p3, s3, xs3, ys3, jnp.float32(1.0),
                jax.random.PRNGKey(cstate["i"] + i))
        l1 = float(losses3[-1])
        dt = time.perf_counter() - t0
        assert l1 != cstate["l"], "B=256 LM training chain did not execute"
        cstate.update(p=p3, s=s3, l=l1, i=cstate["i"] + iters)
        return dt

    cdev, _ = fit_device_seconds(timed_b256, counts=(1, 5), rounds=3)
    b256_wps = fuse3 * t * b3 / cdev
    b256_mfu = b256_wps * train_flops_per_word / chip_peaks(chip)["bf16"]

    return {"lm_train_wps": train_wps, "lm_infer_wps": infer_wps,
            "lm_train_mfu": lm_mfu, "lm_train_wps_b128": b128_wps,
            "lm_train_mfu_b128": b128_mfu, "lm_train_wps_b256": b256_wps,
            "lm_train_mfu_b256": b256_mfu}


def bench_ranker(n_items=100_000, t=35, b=128, k=100):
    """Session-ranking serving throughput (BASELINE.json configs[4]) on one
    chip: encode a [T, B] session batch (fused scan) + score the full item
    table + top-K, all one jitted dispatch (`SessionRanker.rank_next`) —
    measured for both retrieval tiers (exact `blocked_topk` and the
    `approx_max_k` MIPS path, on-chip recall 0.9855 at this config).
    Chained through a score-derived next batch; one closing D2H read."""
    from vmlmf_tpu.serve.ranker import SessionRanker

    r = SessionRanker.create(n_items, hidden_size=650, num_layers=1,
                             w_rank=300, u_rank=300, backend="pallas")
    params = r.init(jax.random.PRNGKey(0))

    def make_timer(method):
        @jax.jit
        def step(params, sess, acc):
            scores, ids = r.rank_next(params, sess, k, method=method)
            nxt = jnp.concatenate([sess[1:], ids[:, :1].T % n_items], axis=0)
            # strictly-increasing accumulator: greedy self-feeding converges
            # to a fixed cycle, so a raw score value can legitimately repeat
            # — the completion proof must be a value that moves every step
            return nxt, acc + 1.0 + jnp.abs(scores[0, 0])

        sess0 = jnp.asarray(
            np.random.RandomState(0).randint(0, n_items, (t, b)))
        sess, acc = step(params, sess0, jnp.float32(0.0))  # compile + warm
        rstate = {"sess": sess, "acc": acc, "a": float(acc)}

        def timed(iters):
            sess, acc = rstate["sess"], rstate["acc"]
            t0 = time.perf_counter()
            for _ in range(iters):
                sess, acc = step(params, sess, acc)
            a1 = float(acc)
            dt = time.perf_counter() - t0
            assert a1 > rstate["a"], "ranking chain did not execute"
            rstate.update(sess=sess, acc=acc, a=a1)
            return dt

        return timed

    timers = {"exact": make_timer("exact"), "approx": make_timer("approx")}
    import statistics

    res = {m: [] for m in timers}
    for _ in range(3):  # interleaved rounds (drift-cancelling)
        for m, timed in timers.items():
            lo, hi = timed(4), timed(24)
            res[m].append((hi - lo) / (24 - 4))

    # measured recall of the approx tier vs the exact ranking at this very
    # config — regression-guarded next to its speed, so a knob drift that
    # trades recall for throughput cannot read as a pure win
    # training throughput at the same catalog scale: sampled-softmax SGD
    # (the full-CE [T*B, 100k] logits block is exactly what the sampled
    # path exists to avoid), in-batch negatives, fused chunks, sparse
    # gathered-row table updates (the production path — step-identical to
    # the dense trainer, tests/test_ranker.py::TestSparseSampledTrainer) —
    # the other half of the north-star ranking workload
    tr = r.sparse_trainer(batch_size=b, seq_length=t, fuse_chunks=8,
                          sampled_softmax=8192, in_batch_negatives=True)
    tp = tr.init()
    ts = tr.state0()
    fuse = 8
    txs = jnp.asarray(
        np.random.RandomState(4).randint(0, n_items, (fuse, t, b)))
    tys = jnp.asarray(
        np.random.RandomState(5).randint(0, n_items, (fuse, t, b)))
    tp, ts, tlosses, _ = tr._fused_chunks(tp, ts, txs, tys, jnp.float32(0.1),
                                          jax.random.PRNGKey(0))
    tstate = {"p": tp, "s": ts, "l": float(tlosses[-1]), "i": 0}

    def timed_train(iters):
        tp, ts = tstate["p"], tstate["s"]
        t0 = time.perf_counter()
        for i in range(iters):
            tp, ts, tlosses, _ = tr._fused_chunks(
                tp, ts, txs, tys, jnp.float32(0.1),
                jax.random.PRNGKey(tstate["i"] + i))
        l1 = float(tlosses[-1])
        dt = time.perf_counter() - t0
        assert l1 != tstate["l"], "ranker training chain did not execute"
        tstate.update(p=tp, s=ts, l=l1, i=tstate["i"] + iters)
        return dt

    tdev, _ = fit_device_seconds(timed_train, counts=(1, 5), rounds=3)
    train_sessions_per_sec = fuse * b / tdev

    sess = jnp.asarray(np.random.RandomState(7).randint(0, n_items, (t, b)))
    _, ids_exact = jax.jit(
        lambda p, s: r.rank_next(p, s, k, method="exact"))(params, sess)
    _, ids_approx = jax.jit(
        lambda p, s: r.rank_next(p, s, k, method="approx",
                                 recall_target=0.95))(params, sess)
    ex, ap = np.asarray(ids_exact), np.asarray(ids_approx)
    recall = float(np.mean([
        len(np.intersect1d(ex[i], ap[i])) / k for i in range(b)]))

    # positive floor as in fit_device_seconds: drift must not produce a
    # negative/infinite sessions/sec in the artifact
    return {
        "ranker_sessions_per_sec":
            b / max(statistics.median(res["exact"]), 1e-12),
        "ranker_approx_sessions_per_sec":
            b / max(statistics.median(res["approx"]), 1e-12),
        "ranker_approx_recall": recall,
        "ranker_train_sessions_per_sec": train_sessions_per_sec,
    }


def main():
    from vmlmf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    # variants first: bench_har's reference-faithful baseline phase hammers
    # the host-dispatch path and measurably depresses whatever runs next on
    # this tunneled runtime
    import sys

    def note(msg):  # progress to stderr; stdout stays the one JSON line
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    variants = bench_har_variants()
    note(f"variants done {variants}")
    har = bench_har()
    note(f"har done {har['seq_per_sec']:.0f} seq/s, "
         f"{har['vs_baseline']:.1f}x baseline, relay {har['relay_ms']:.1f}ms")
    latency = bench_har_latency_fit()
    note(f"latency fit done {latency}")
    lm = bench_lm(har["chip"])
    note(f"lm done {lm['lm_train_wps']:.0f} wps (B=128 "
         f"{lm['lm_train_wps_b128']:.0f}, B=256 "
         f"{lm['lm_train_wps_b256']:.0f})")
    try:
        ranker = bench_ranker()
        note(f"ranker done {ranker}")
    except Exception as e:  # newest phase must not void the whole artifact
        ranker = {"ranker_sessions_per_sec": None,
                  "ranker_approx_sessions_per_sec": None,
                  "ranker_approx_recall": None,
                  "ranker_train_sessions_per_sec": None}
        note(f"ranker phase failed: {e!r}")

    print(json.dumps({
        "metric": "vmlmf_har_train_throughput",
        "value": round(har["seq_per_sec"], 1),
        "unit": "sequences/sec/chip",
        "vs_baseline": round(har["vs_baseline"], 3),
        "extra": {
            "chip": har["chip"],
            "relay_ms": round(har["relay_ms"], 1),
            "har_mfu": round(har["mfu"], 5),
            "har_fraction_of_roofline": round(har["fraction_of_roofline"], 4),
            "har_bound": har["bound"],
            "har_group_seq_per_sec": round(variants["har_group_seq_per_sec"], 1),
            "gru_seq_per_sec": round(variants["gru_seq_per_sec"], 1),
            "har_us_per_timestep": round(latency["har_us_per_timestep"], 2),
            "har_us_overhead": round(latency["har_us_overhead"], 1),
            "har_serial_fraction": round(latency["har_serial_fraction"], 3),
            "lm_train_wps": round(lm["lm_train_wps"], 1),
            "lm_infer_wps": round(lm["lm_infer_wps"], 1),
            "lm_train_mfu": round(lm["lm_train_mfu"], 5),
            "lm_train_wps_b128": round(lm["lm_train_wps_b128"], 1),
            "lm_train_mfu_b128": round(lm["lm_train_mfu_b128"], 5),
            "lm_train_wps_b256": round(lm["lm_train_wps_b256"], 1),
            "lm_train_mfu_b256": round(lm["lm_train_mfu_b256"], 5),
            "ranker_sessions_per_sec": (
                None if ranker["ranker_sessions_per_sec"] is None
                else round(ranker["ranker_sessions_per_sec"], 1)),
            "ranker_approx_sessions_per_sec": (
                None if ranker["ranker_approx_sessions_per_sec"] is None
                else round(ranker["ranker_approx_sessions_per_sec"], 1)),
            "ranker_approx_recall": (
                None if ranker.get("ranker_approx_recall") is None
                else round(ranker["ranker_approx_recall"], 4)),
            "ranker_train_sessions_per_sec": (
                None if ranker.get("ranker_train_sessions_per_sec") is None
                else round(ranker["ranker_train_sessions_per_sec"], 1)),
        },
    }))


if __name__ == "__main__":
    main()
