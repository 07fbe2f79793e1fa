"""Fused Pallas recurrence kernels: the whole LSTM time loop in one kernel.

The hot serial path of every cell in this framework is

    for t in 0..T-1:
        pre_t = gi[t] + h @ U @ V (+ h ⊙ dvec per gate)     # rank-r recurrent
        h, c  = lstm_update(pre_t, c)

XLA's `lax.scan` re-materializes the recurrent factors from HBM on every
iteration and pays per-step loop overhead.  These kernels instead run the
*entire* scan inside one `pallas_call` with a sequential grid over T:

  * U, V, dvec and the (h, c) carry live in VMEM scratch across all steps —
    the factors are read from HBM exactly once per scan,
  * the per-step `gi[t]` block is streamed via the grid BlockSpec, which
    Pallas double-buffers automatically (DMA of step t+1 overlaps compute of
    step t),
  * the gate nonlinearities + state update are VPU epilogue ops fused behind
    the two MXU matmuls,
  * large batches are tiled over an outer grid dimension (the recurrence is
    embarrassingly parallel in batch), keeping VMEM bounded at any B.

A custom VJP pairs it with a reverse-grid backward kernel.  The forward
kernel saves the post-nonlinearity gates and rank-space activations h@U, so
the backward performs ZERO recompute matmuls (down from two dependent MXU ops
per step) and never re-streams gi (dgi == dpre); dU, dV, ddvec accumulate in
VMEM across all grid steps.  This trades O(T·B·(4h + r)) residual memory for
a ~1/3 shorter backward MXU chain — the right side of the trade on TPU, where
the serial recurrence is MXU-stream-bound and HBM capacity is ample at these
sizes (a PTB chunk's gates are ~7 MB/layer).

Covers cells whose recurrence is ``h @ (U V) + h ⊙ dvec``: VMLMFCell
(U=u_h, V=v_hᵀ, dvec=d_h − dcorr_h), low-rank LSTMCell (dvec=0), dense
LSTMCell (V=None → single matmul variant), and DualDiagonalLSTMCell.  Group
cells keep the XLA einsum path.  Reference behavior being replaced: the
per-timestep Python dispatch at
`/root/reference/rnn_compression_factorization_vmlmf/src/models/vmlmf.py:308-310`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pad_to(x, shape):
    pads = [(0, s - d) for d, s in zip(x.shape, shape)]
    if all(p == (0, 0) for p in pads):
        return x
    return jnp.pad(x, pads)


def _pick_time_block(t, cap=8):
    """Timesteps handled per grid step (static inner loop): the largest
    divisor of T up to `cap`.  Amortizes per-grid-step overhead (~tens of µs)
    across several recurrence steps; must divide T so no state-mutating
    padding steps are ever executed."""
    for s in range(min(cap, t), 0, -1):
        if t % s == 0:
            return s
    return 1


def _pick_tiles(t, bp, fourhp, *, live, budget=None, fixed=0, limit=None):
    """Jointly choose (sblk timesteps, bt batch rows) per grid step.

    The static inner loop is unrolled by the compiler, which keeps ~`live`
    [bt, 4h] f32 temporaries per unrolled step on the kernel stack (measured
    empirically), so sblk·bt is VMEM-bounded by ``budget``.  ``fixed`` is
    VMEM residency that does NOT scale with the tile (whole-array weight
    operands, weight gradient outputs/accumulators in multi-layer kernels);
    streamed temporaries + fixed must additionally fit under ``limit``
    (~chip VMEM minus headroom).  Defaults come from the chip-aware table
    (`ops.vmem.vmem_budgets`, env-overridable) — calibrated on v5e where the
    2x650-w300 stack compiles (stream 71M + weights 35M) and the 4x650 stack
    does not.  Among configurations that fit, minimize the number of grid
    steps (bp/bt)·(t/sblk), i.e. maximize sblk·bt; tie-break toward larger
    bt (batch rows amortize matmul issue latency better than unrolled steps
    do).  Returns None when even the minimal tile (sblk=1, bt=8) overflows —
    the caller must fall back."""
    if budget is None or limit is None:
        from vmlmf_tpu.ops.vmem import vmem_budgets

        b = vmem_budgets()
        budget = b["budget"] if budget is None else budget
        limit = b["limit"] if limit is None else limit

    def fits(s, b):
        stream = live * s * b * fourhp * 4
        return stream <= budget and stream + fixed <= limit

    if not fits(1, 8):
        return None
    best = None
    sblk = _pick_time_block(t)
    while True:
        bt = bp
        while bt > 8 and not fits(sblk, bt):
            bt = _round_up(bt // 2, 8)
        if fits(sblk, bt):
            key = (sblk * bt, bt)
            if best is None or key > best[0]:
                best = (key, sblk, bt)
        if sblk == 1:
            return best[1], best[2]
        sblk = _pick_time_block(t, sblk - 1)


def _compiler_params():
    from vmlmf_tpu.ops.vmem import vmem_budgets

    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        # chip VMEM minus headroom (128M - 12M = 116M on v4/v5e/v5p)
        vmem_limit_bytes=vmem_budgets()["compiler_limit"],
    )


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(gi_ref, u_ref, v_ref, dvec_ref, h0_ref, c0_ref,
                *refs, hp, lowrank, bf16, sblk, residuals):
    """Grid (batch_blocks, T // sblk); the minor grid dim walks time, each
    grid step running `sblk` recurrence steps (static inner loop) with the
    (h, c) carry in scratch.

    With ``residuals`` (the autodiff forward), also saves the
    post-nonlinearity gates (and, on the low-rank path, the rank-space
    activations h@U) so the backward kernel needs zero recompute matmuls and
    never re-reads gi.  The no-grad primal (inference/eval) skips those
    outputs entirely — no extra HBM write traffic."""
    if residuals:
        if lowrank:
            ys_ref, cs_ref, gates_ref, hu_ref, h_s, c_s = refs
        else:
            ys_ref, cs_ref, gates_ref, h_s, c_s = refs
            hu_ref = None
    else:
        ys_ref, cs_ref, h_s, c_s = refs
        gates_ref = hu_ref = None
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    h = h_s[:]
    c = c_s[:]
    for st in range(sblk):
        h_mm = h.astype(jnp.bfloat16) if bf16 else h  # u/v refs arrive pre-cast
        if lowrank:
            hu = jnp.dot(h_mm, u_ref[:], preferred_element_type=jnp.float32)
            if hu_ref is not None:
                hu_ref[st] = hu
            hu = hu.astype(jnp.bfloat16) if bf16 else hu
            gr = jnp.dot(hu, v_ref[:], preferred_element_type=jnp.float32)
        else:
            gr = jnp.dot(h_mm, u_ref[:], preferred_element_type=jnp.float32)
        htile = jnp.concatenate([h, h, h, h], axis=-1)
        pre = gi_ref[st] + gr + htile * dvec_ref[:]

        i = jax.nn.sigmoid(pre[:, :hp])
        f = jax.nn.sigmoid(pre[:, hp:2 * hp])
        g = jnp.tanh(pre[:, 2 * hp:3 * hp])
        o = jax.nn.sigmoid(pre[:, 3 * hp:])
        if gates_ref is not None:
            gates_ref[st] = jnp.concatenate([i, f, g, o], axis=-1)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        ys_ref[st] = h
        cs_ref[st] = c

    h_s[:] = h
    c_s[:] = c


def _fwd_call(gi, u, v, dvec, h0, c0, *, lowrank, interpret, bf16,
              residuals):
    t, bp, fourhp = gi.shape
    hp = fourhp // 4
    sblk, bt = _pick_tiles(t, bp, fourhp, live=10 if residuals else 8) or (1, 8)
    nb = bp // bt if bp % bt == 0 else -(-bp // bt)
    gi = _pad_to(gi, (t, nb * bt, fourhp))
    h0 = _pad_to(h0, (nb * bt, hp))
    c0 = _pad_to(c0, (nb * bt, hp))
    if bf16:
        u = u.astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)

    step = lambda b, tt: (tt, b, 0)
    row = lambda b, tt: (b, 0)
    const = lambda b, tt: (0, 0)
    out_specs = [
        pl.BlockSpec((sblk, bt, hp), step, memory_space=pltpu.VMEM),
        pl.BlockSpec((sblk, bt, hp), step, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t, nb * bt, hp), jnp.float32),
        jax.ShapeDtypeStruct((t, nb * bt, hp), jnp.float32),
    ]
    if residuals:
        out_specs.append(
            pl.BlockSpec((sblk, bt, fourhp), step, memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((t, nb * bt, fourhp), jnp.float32))
        if lowrank:
            rp = u.shape[1]
            out_specs.append(
                pl.BlockSpec((sblk, bt, rp), step, memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((t, nb * bt, rp), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, hp=hp, lowrank=lowrank, bf16=bf16,
                          sblk=sblk, residuals=residuals),
        grid=(nb, t // sblk),
        in_specs=[
            pl.BlockSpec((sblk, bt, fourhp), step, memory_space=pltpu.VMEM),
            pl.BlockSpec(u.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(v.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(dvec.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, hp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, hp), row, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bt, hp), jnp.float32),
            pltpu.VMEM((bt, hp), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(gi, u, v, dvec, h0, c0)
    # ys, cs [, gates (post-nonlinearity) [, hu (rank activations)]]
    return tuple(o[:, :bp] for o in out)


# ---------------------------------------------------------------------------
# backward kernel (reverse grid)
# ---------------------------------------------------------------------------

def _bwd_kernel(gates_ref, *refs, hp, lowrank, bf16, sblk):
    """Grid (batch_blocks, T // sblk); grid step k of batch block b processes
    the time block [T - (k+1)·sblk, T - k·sblk) in reverse inside a static
    loop.  dU/dV/ddvec accumulate in scratch across ALL grid steps.

    Zero recompute: the forward kernel saved the post-nonlinearity gates and
    the rank-space activations h@U, so this kernel streams them instead of
    re-deriving them (saves two dependent MXU ops per step and never touches
    gi at all — dgi is just dpre)."""
    if lowrank:
        (hu_ref, u_ref, v_ref, dvec_ref, hprev_ref, cprev_ref, cs_ref,
         dys_ref, dcs_ref,
         dgi_ref, du_ref, dv_ref, ddvec_ref, dh0_ref, dc0_ref,
         dh_s, dc_s, du_s, dv_s, ddvec_s) = refs
    else:
        (u_ref, v_ref, dvec_ref, hprev_ref, cprev_ref, cs_ref,
         dys_ref, dcs_ref,
         dgi_ref, du_ref, dv_ref, ddvec_ref, dh0_ref, dc0_ref,
         dh_s, dc_s, du_s, dv_s, ddvec_s) = refs
        hu_ref = None
    b = pl.program_id(0)
    k = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)

    @pl.when(jnp.logical_and(b == 0, k == 0))
    def _():
        du_s[:] = jnp.zeros_like(du_s)
        dv_s[:] = jnp.zeros_like(dv_s)
        ddvec_s[:] = jnp.zeros_like(ddvec_s)

    @pl.when(k == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)

    dh_carry = dh_s[:]
    dc_carry = dc_s[:]
    du_acc = dv_acc = ddvec_acc = None

    for st in range(sblk - 1, -1, -1):
        h_prev = hprev_ref[st]
        c_prev = cprev_ref[st]
        c_t = cs_ref[st]

        h_mm = h_prev.astype(jnp.bfloat16) if bf16 else h_prev
        gates = gates_ref[st]
        i = gates[:, :hp]
        f = gates[:, hp:2 * hp]
        g = gates[:, 2 * hp:3 * hp]
        o = gates[:, 3 * hp:]
        htile = jnp.concatenate([h_prev] * 4, axis=-1)

        dh = dh_carry + dys_ref[st]
        tanh_c = jnp.tanh(c_t)
        do = dh * tanh_c
        dc = dc_carry + dcs_ref[st] + dh * o * (1.0 - tanh_c * tanh_c)
        di = dc * g
        df = dc * c_prev
        dg = dc * i
        dc_carry = dc * f

        dpre = jnp.concatenate([
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ], axis=-1)

        dgi_ref[st] = dpre

        # dvec path: dh_prev += sum_g dpre_g * dvec_g ; ddvec += sum_b dpre * h
        dv_term = dpre * dvec_ref[:]
        dh_prev = (dv_term[:, :hp] + dv_term[:, hp:2 * hp]
                   + dv_term[:, 2 * hp:3 * hp] + dv_term[:, 3 * hp:])
        dd = jnp.sum(dpre * htile, axis=0, keepdims=True)
        ddvec_acc = dd if ddvec_acc is None else ddvec_acc + dd

        dpre_mm = dpre.astype(jnp.bfloat16) if bf16 else dpre
        if lowrank:
            # dh_prev += (dpre Vᵀ) Uᵀ ; dU += hᵀ (dpre Vᵀ); dV += (hU)ᵀ dpre
            dhu = jnp.dot(dpre_mm, v_ref[:].T, preferred_element_type=jnp.float32)
            dhu_mm = dhu.astype(jnp.bfloat16) if bf16 else dhu
            dh_prev = dh_prev + jnp.dot(dhu_mm, u_ref[:].T,
                                        preferred_element_type=jnp.float32)
            du_t = jnp.dot(h_mm.T, dhu_mm, preferred_element_type=jnp.float32)
            hu = hu_ref[st]
            hu_mm = hu.astype(jnp.bfloat16) if bf16 else hu
            dv_t = jnp.dot(hu_mm.T, dpre_mm, preferred_element_type=jnp.float32)
            dv_acc = dv_t if dv_acc is None else dv_acc + dv_t
        else:
            dh_prev = dh_prev + jnp.dot(dpre_mm, u_ref[:].T,
                                        preferred_element_type=jnp.float32)
            du_t = jnp.dot(h_mm.T, dpre_mm, preferred_element_type=jnp.float32)
        du_acc = du_t if du_acc is None else du_acc + du_t

        dh_carry = dh_prev

    du_s[:] += du_acc
    if dv_acc is not None:
        dv_s[:] += dv_acc
    ddvec_s[:] += ddvec_acc
    dh_s[:] = dh_carry
    dc_s[:] = dc_carry

    @pl.when(k == nt - 1)
    def _():
        dh0_ref[:] = dh_s[:]
        dc0_ref[:] = dc_s[:]

    @pl.when(jnp.logical_and(b == nb - 1, k == nt - 1))
    def _():
        du_ref[:] = du_s[:]
        dv_ref[:] = dv_s[:]
        ddvec_ref[:] = ddvec_s[:]


def _bwd_call(gates, hu, u, v, dvec, hprev, cprev, cs, dys, dcs,
              *, lowrank, interpret, bf16):
    t, bp, fourhp = gates.shape
    hp = fourhp // 4
    sblk, bt = _pick_tiles(t, bp, fourhp, live=16) or (1, 8)
    nb = bp // bt if bp % bt == 0 else -(-bp // bt)
    bpad = nb * bt
    gates = _pad_to(gates, (t, bpad, fourhp))
    hprev = _pad_to(hprev, (t, bpad, hp))
    cprev = _pad_to(cprev, (t, bpad, hp))
    cs = _pad_to(cs, (t, bpad, hp))
    dys = _pad_to(dys, (t, bpad, hp))
    dcs = _pad_to(dcs, (t, bpad, hp))
    if bf16:
        u = u.astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)

    ntb = t // sblk
    rev = lambda b, k: (ntb - 1 - k, b, 0)
    row = lambda b, k: (b, 0)
    const = lambda b, k: (0, 0)
    in_specs = [
        pl.BlockSpec((sblk, bt, fourhp), rev, memory_space=pltpu.VMEM),  # gates
    ]
    operands = [gates]
    if lowrank:
        rp = hu.shape[-1]
        hu = _pad_to(hu, (t, bpad, rp))
        in_specs.append(
            pl.BlockSpec((sblk, bt, rp), rev, memory_space=pltpu.VMEM))  # h@U
        operands.append(hu)
    in_specs += [
        pl.BlockSpec(u.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec(v.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec(dvec.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec((sblk, bt, hp), rev, memory_space=pltpu.VMEM),      # h_{t-1}
        pl.BlockSpec((sblk, bt, hp), rev, memory_space=pltpu.VMEM),      # c_{t-1}
        pl.BlockSpec((sblk, bt, hp), rev, memory_space=pltpu.VMEM),      # c_t
        pl.BlockSpec((sblk, bt, hp), rev, memory_space=pltpu.VMEM),      # dys_t
        pl.BlockSpec((sblk, bt, hp), rev, memory_space=pltpu.VMEM),      # dcs_t
    ]
    operands += [u, v, dvec, hprev, cprev, cs, dys, dcs]
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, hp=hp, lowrank=lowrank, bf16=bf16,
                          sblk=sblk),
        grid=(nb, ntb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((sblk, bt, fourhp), rev, memory_space=pltpu.VMEM),  # dgi
            pl.BlockSpec(u.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(v.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(dvec.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, hp), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, hp), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, bpad, fourhp), jnp.float32),
            jax.ShapeDtypeStruct(u.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
            jax.ShapeDtypeStruct(dvec.shape, jnp.float32),
            jax.ShapeDtypeStruct((bpad, hp), jnp.float32),
            jax.ShapeDtypeStruct((bpad, hp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, hp), jnp.float32),      # dh carry
            pltpu.VMEM((bt, hp), jnp.float32),      # dc carry
            pltpu.VMEM(u.shape, jnp.float32),       # dU accumulator
            pltpu.VMEM(v.shape, jnp.float32),       # dV accumulator
            pltpu.VMEM(dvec.shape, jnp.float32),    # ddvec accumulator
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*operands)
    dgi, du, dv, ddvec, dh0, dc0 = out
    return dgi[:, :bp], du, dv, ddvec, dh0[:bp], dc0[:bp]


# ---------------------------------------------------------------------------
# public entry: padded, differentiable scan
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _scan_core(gi, u, v, dvec, h0, c0, lowrank, interpret, bf16):
    # no-grad primal: residual-free forward (no gates/hu HBM traffic)
    ys, cs = _fwd_call(gi, u, v, dvec, h0, c0, lowrank=lowrank,
                       interpret=interpret, bf16=bf16, residuals=False)
    return ys, cs


def _scan_core_fwd(gi, u, v, dvec, h0, c0, lowrank, interpret, bf16):
    out = _fwd_call(gi, u, v, dvec, h0, c0, lowrank=lowrank,
                    interpret=interpret, bf16=bf16, residuals=True)
    ys, cs, gates = out[:3]
    hu = out[3] if lowrank else None
    # gi is NOT a residual: dgi == dpre and the backward kernel reconstructs
    # everything from the saved gates / rank activations.
    return (ys, cs), (u, v, dvec, h0, c0, ys, cs, gates, hu)


def _scan_core_bwd(lowrank, interpret, bf16, res, cts):
    dys, dcs = cts
    u, v, dvec, h0, c0, ys, cs, gates, hu = res
    hprev = jnp.concatenate([h0[None], ys[:-1]], axis=0)
    cprev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
    dgi, du, dv, ddvec, dh0, dc0 = _bwd_call(
        gates, hu, u, v, dvec, hprev, cprev, cs, dys, dcs,
        lowrank=lowrank, interpret=interpret, bf16=bf16)
    return dgi, du, dv, ddvec, dh0, dc0


_scan_core.defvjp(_scan_core_fwd, _scan_core_bwd)


def lstm_scan_fused(gi, u, v, dvec, h0, c0, *, interpret=False,
                    precision="f32"):
    """Fused LSTM scan.  gi: [T, B, 4h] (input contributions, gate order
    i,f,g,o); u: [h, r] with v: [r, 4h] (low-rank) or u: [h, 4h] with v=None
    (dense); dvec: [4h] elementwise recurrent diagonal (zeros if unused);
    h0, c0: [B, h].  Returns (ys [T, B, h], c_last [B, h]).

    Gradients flow to every input via the paired backward kernel.  Shapes are
    padded to TPU tiles internally (B -> mult of 8, h -> mult of 128, r ->
    mult of 128); zero padding is exact for this recurrence (zero rows/cols
    stay zero through sigmoid gating because c0 pads are zero).
    """
    t, b, fourh = gi.shape
    h = fourh // 4
    lowrank = v is not None
    bp = _round_up(b, 8)
    hp = _round_up(h, 128)

    # re-layout gate blocks to padded positions: [T,B,4,h] -> [T,Bp,4,hp]
    gi4 = _pad_to(gi.reshape(t, b, 4, h), (t, bp, 4, hp)).reshape(t, bp, 4 * hp)
    dvec4 = _pad_to(dvec.reshape(4, h), (4, hp)).reshape(1, 4 * hp)
    h0p = _pad_to(h0, (bp, hp))
    c0p = _pad_to(c0, (bp, hp))
    if lowrank:
        r = u.shape[1]
        rp = _round_up(r, 128)
        up = _pad_to(u, (hp, rp))
        vp = _pad_to(v.reshape(r, 4, h), (rp, 4, hp)).reshape(rp, 4 * hp)
    else:
        up = _pad_to(u.reshape(h, 4, h), (hp, 4, hp)).reshape(hp, 4 * hp)
        vp = jnp.zeros((8, 128), jnp.float32)  # unused placeholder

    bf16 = precision == "bf16"
    ys, cs = _scan_core(gi4, up, vp, dvec4, h0p, c0p, lowrank, interpret, bf16)
    return ys[:, :b, :h], cs[-1, :b, :h]


def vmlmf_rec_inputs(prep, hidden_size):
    """Map a VMLMFCell prep dict onto (u, v, dvec) for the fused kernel."""
    u = prep["u_h"]                      # [h, r]
    v = prep["v_h"].T                    # [r, 4h]
    dvec = (prep["d_h"][None, :] - prep["dcorr_h"]).reshape(-1)  # [4h]
    return u, v, dvec
