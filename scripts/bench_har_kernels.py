"""Compare HAR-family kernel configurations on one chip: x-fused vs hoisted.

Covers the headline recurrent workloads at their reference protocol shapes
(batch 81, T 24, 77 sensors, epoch-fused Adam train steps):
  * VMLMF demo config (layers [180], w8/u6)                — `script/demo.sh:7`
  * group-VMLMF demo config (w8/u[2,4], g2)                — `script/demo.sh:10`
  * legacy rank-9 low-rank GRU [64,64]                     — `test_HAR.sh` grid
  * legacy group-GRU [12,6]                                — `test_HAR.sh` grid

Usage: python scripts/bench_har_kernels.py [xin]   (xin in {0,1}; default both)

Timing protocol per BASELINE.md: chain iterations through (params, opt_state),
close with ONE device-to-host value read, assert the loss moved.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(name, build_model, batch=81, t=24, feats=77, fuse=64, classes=18,
          iters=10):
    import jax

    from vmlmf_tpu.train.har import HARTrainer

    model = build_model()
    tr = HARTrainer(model, learning_rate=2e-3, batch_size=batch,
                    fuse_batches=fuse)
    p, o = tr.init()
    xs = jax.random.normal(jax.random.PRNGKey(0), (fuse, batch, t, feats))
    ys = jax.random.randint(jax.random.PRNGKey(1), (fuse, batch), 0, classes)
    p, o, losses = tr._fused_steps(p, o, xs, ys)  # compile
    l0 = float(losses[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        p, o, losses = tr._fused_steps(p, o, xs, ys)
    l1 = float(losses[-1])  # single D2H read closes the chain
    dt = (time.perf_counter() - t0) / (iters * fuse)
    assert l1 != l0, "training chain did not execute"
    print(f"  {name:22s}: {batch / dt:9.0f} seq/s ({dt * 1e6:5.0f} us/batch)")


def run(xin):
    os.environ["VMLMF_PALLAS_XIN"] = xin
    from vmlmf_tpu.cells import GRUCell, GRUGroupCell, VMLMFCell, VMLMFGroupCell
    from vmlmf_tpu.nn.models import HARNet

    print(f"VMLMF_PALLAS_XIN={xin}")
    bench("vmlmf_180_w8u6", lambda: HARNet(
        input_size=77, layer_sizes=(180,), backend="pallas",
        cell_factory=lambda n, h: VMLMFCell(n, h, w_rank=8, u_rank=6)))
    bench("vmlmf_group_180", lambda: HARNet(
        input_size=77, layer_sizes=(180,), backend="pallas",
        cell_factory=lambda n, h: VMLMFGroupCell(n, h, w_rank=8,
                                                 u_ranks=(2, 4), groups=2)))
    bench("gru_lowrank_64x64", lambda: HARNet(
        input_size=77, layer_sizes=(64, 64), backend="pallas",
        cell_factory=lambda n, h: GRUCell(n, h, w_rank=9, u_rank=9)))
    bench("gru_group_12_6", lambda: HARNet(
        input_size=77, layer_sizes=(64, 64), backend="pallas",
        cell_factory=lambda n, h: GRUGroupCell(n, h, w_rank=9,
                                               u_ranks=(12, 6), groups=2)))


if __name__ == "__main__":
    from vmlmf_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    modes = [sys.argv[1]] if len(sys.argv) > 1 else ["0", "1"]
    for m in modes:
        run(m)
