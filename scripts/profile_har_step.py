"""Attribute the ~72 us HAR train-step floor with a jax.profiler trace.

Round-4 bounded the answer by elimination (not HBM, not the serial chain,
not op count, not grid-step count — docs/latency.md); this script NAMES it:
capture a device trace around the fused-epoch step (`HARTrainer.fused_steps`,
64 batch-steps per dispatch), parse the Perfetto JSON the profiler emits,
and print device time per batch-step split into

  while.4        — the whole fused batch scan (== the true device step)
  pallas fwd     — the forward fused-scan custom call  (jvp)
  pallas bwd     — the backward custom call            (transpose_jvp)
  glue           — everything else inside the while body: optimizer-update
                   fusions, weight-grad reduces, pad/slice relayout around
                   the kernel, the per-step dynamic-slice from the stacked
                   epoch

Usage: python scripts/profile_har_step.py  (real TPU; ~1 min)
"""
import collections
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from vmlmf_tpu.cells import VMLMFCell
from vmlmf_tpu.nn.models import HARNet
from vmlmf_tpu.train.har import HARTrainer
from vmlmf_tpu.utils.cache import enable_persistent_cache
from vmlmf_tpu.utils.profiling import trace

TRACE_DIR = "/tmp/vmlmf_trace_har"
FUSE, DISPATCHES = 64, 4


def capture():
    enable_persistent_cache()
    model = HARNet(input_size=77, layer_sizes=(180,),
                   cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=8,
                                                       u_rank=6),
                   backend="pallas")
    tr = HARTrainer(model, batch_size=81, fuse_batches=FUSE)
    p, o = tr.init()
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.normal(size=(FUSE, 81, 24, 77)).astype(np.float32))
    ys = jnp.asarray(rng.randint(0, 18, size=(FUSE, 81)).astype(np.int32))
    p, o, losses = tr._fused_steps(p, o, xs, ys)  # compile + warm
    _ = float(losses[-1])                         # drain the queue
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with trace(TRACE_DIR):
        for _ in range(DISPATCHES):
            p, o, losses = tr._fused_steps(p, o, xs, ys)
        _ = float(losses[-1])


def report():
    path = glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz")[0]
    with gzip.open(path, "rt") as f:
        events = json.load(f)["traceEvents"]
    threads = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    ops, cnt = collections.Counter(), collections.Counter()
    for e in events:
        if (e.get("ph") == "X"
                and threads.get((e["pid"], e.get("tid"))) == "XLA Ops"):
            ops[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    steps = FUSE * DISPATCHES
    # events inside the while body occur once per batch-step; the while
    # itself once per dispatch — its duration IS the true device step time
    whiles = {n: d for n, d in ops.items()
              if cnt[n] == DISPATCHES and n.startswith("while")}
    inner = {n: d for n, d in ops.items() if cnt[n] >= steps}
    kern = {n: d for n, d in inner.items() if "jvp" in n}
    glue = {n: d for n, d in inner.items() if "jvp" not in n}
    step_us = sum(whiles.values()) / steps
    fwd = sum(d for n, d in kern.items() if "transpose" not in n) / steps
    bwd = sum(d for n, d in kern.items() if "transpose" in n) / steps
    glue_us = sum(glue.values()) / steps
    print(f"device step (fused batch scan):  {step_us:6.1f} us")
    print(f"  pallas forward custom call:    {fwd:6.1f} us")
    print(f"  pallas backward custom call:   {bwd:6.1f} us")
    print(f"  glue ({len(glue):3d} distinct XLA ops):  {glue_us:6.1f} us")
    big = sorted(glue.items(), key=lambda kv: -kv[1])[:8]
    print("  largest glue items (us/step):")
    for n, d in big:
        print(f"    {d / steps:5.2f}  {n}")
    durs = sorted((d / steps for d in glue.values()), reverse=True)
    print(f"  glue distribution: max {durs[0]:.2f}, "
          f"median {durs[len(durs) // 2]:.2f} us/step")


if __name__ == "__main__":
    capture()
    report()
