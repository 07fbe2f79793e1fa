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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _residual_dtype():
    """Storage dtype of the backward-only residual streams (saved gates and
    rank activations h@U — NOT the primal ys/cs).  VMLMF_PALLAS_RESIDUALS=bf16
    halves the largest HBM stream of the train step ([T,B,4h] gates, written
    fwd + read bwd) at the cost of ~2^-9 relative rounding on the gate values
    entering the backward nonlinearity derivatives — standard mixed-precision
    noise, but not bit-exact vs the XLA scan, so f32 stays the default.  Read
    at trace time; fwd and bwd of one step trace together, so they always
    agree."""
    return (jnp.bfloat16 if os.environ.get("VMLMF_PALLAS_RESIDUALS") == "bf16"
            else jnp.float32)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pad_to(x, shape):
    pads = [(0, s - d) for d, s in zip(x.shape, shape)]
    if all(p == (0, 0) for p in pads):
        return x
    return jnp.pad(x, pads)


def _pick_time_block(t, cap=None):
    """Timesteps handled per grid step (static inner loop): the largest
    divisor of T up to `cap`.  Amortizes per-grid-step overhead (~tens of µs)
    across several recurrence steps; must divide T so no state-mutating
    padding steps are ever executed.

    Default cap 8 balances unrolled-code size/compile time against grid-step
    count; VMLMF_PALLAS_SBLK overrides it (e.g. 24 makes the whole HAR demo
    scan one grid step — an A/B knob for pricing per-grid-step overhead)."""
    if cap is None:
        cap = int(os.environ.get("VMLMF_PALLAS_SBLK", 8))
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


def _padded_nbytes(arrs):
    """Approximate f32 VMEM bytes of weight operands after kernel padding
    (every non-unit axis padded to a 128-lane multiple).  Slightly
    underestimates gate-blocked layouts (which pad 4h per gate block to
    4·hp ≥ round_up(4h, 128)) — fine for a fits check whose job is catching
    catastrophic overflow, not byte-exact accounting."""
    tot = 0
    for a in arrs:
        if a is None:
            continue
        n = 4
        for d in a.shape:
            n *= d if d == 1 else _round_up(d, 128)
        tot += n
    return tot


def fused_scan_fits(t, b, gwidth_p, weight_arrs, *, xin):
    """Would the whole-scan kernels' tile picker find ANY tile for this
    config — forward (with residuals) AND backward?  Mirrors the live/fixed
    models of `_fwd_call`/`_bwd_call` (``gwidth_p`` = padded total gate
    width: 4·hp for the LSTM family, 3·hp for the GRU family;
    ``weight_arrs`` = the VMEM-resident weight operands, padded bytes
    estimated from their shapes).

    `nn.recurrence.scan_layer` consults this before routing to the pallas
    backend; on False it falls back to the XLA scan with a one-time warning
    instead of letting the kernel compile the proven-unfit minimal tile
    (which surfaces as an opaque Mosaic VMEM failure).  Reads the
    VMLMF_PALLAS_SAVED_GATES residual policy at trace time, same as the
    kernels themselves."""
    bp = _round_up(b, 8)
    # gi mode always saves gates; xin saves by default (env '0' = recompute)
    save = (not xin) or os.environ.get("VMLMF_PALLAS_SAVED_GATES", "1") != "0"
    fixed = _padded_nbytes(weight_arrs)
    live_f = (10 if save else 9) + (3 if xin else 0)
    live_b = 16 + (4 if xin else 0) + (0 if save else 8)
    return (
        _pick_tiles(t, bp, gwidth_p, live=live_f, fixed=fixed) is not None
        and _pick_tiles(t, bp, gwidth_p, live=live_b, fixed=2 * fixed)
        is not None
    )


class TileOverflowError(ValueError):
    """No (sblk, bt) tile fits the VMEM budget for this config.

    `fused_scan_fits` approximates the padded weight bytes from UNPADDED
    shapes, while the kernels account the exact padded operands — near the
    VMEM boundary the pre-check can pass where the kernel's own picker
    fails.  A dedicated type lets `nn.recurrence.scan_layer` catch exactly
    this case at trace time and honor its documented XLA-scan fallback
    without masking unrelated ValueErrors."""


def _require_tiles(tiles, what):
    """The tile picker found no fitting (sblk, bt): raise a clear error
    instead of compiling a proven-unfit tile (opaque Mosaic VMEM failure).
    `scan_layer` pre-checks with `fused_scan_fits` and additionally catches
    `TileOverflowError` (the pre-check is approximate — see the class
    docstring); direct kernel callers get the error."""
    if tiles is None:
        from vmlmf_tpu.ops.vmem import vmem_budgets

        raise TileOverflowError(
            f"fused-scan {what}: even the minimal (sblk=1, bt=8) tile "
            f"overflows the VMEM budget {vmem_budgets()!r}; use the XLA scan "
            "backend (nn.recurrence.scan_layer falls back automatically) or "
            "raise VMLMF_VMEM_BYTES")
    return tiles


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

def _fit_width(x2, width):
    """Zero-extend or truncate the trailing dim of a 2-d value to `width`
    (the kernel-side `pad_features`: the x-side elementwise term is defined
    over min(F, h) features)."""
    f = x2.shape[-1]
    if f == width:
        return x2
    if f > width:
        return x2[:, :width]
    return jnp.concatenate(
        [x2, jnp.zeros((x2.shape[0], width - f), x2.dtype)], axis=-1)


def _fwd_kernel(*refs, hp, fp, lowrank, xin, x_lowrank, bf16, sblk,
                residuals, save_gates):
    """Grid (batch_blocks, T // sblk); the minor grid dim walks time, each
    grid step running `sblk` recurrence steps (static inner loop) with the
    (h, c) carry in scratch.

    Two input modes (static `xin` flag):
      * gi mode — the hoisted input projection streams in as gi [sblk,bt,4h];
      * x  mode — the RAW input x [sblk,bt,F] streams in and the projection
        runs here: one batched ([sblk·bt, F] @ Ux [@ Vx]) MXU pair per grid
        step plus the elementwise x-diagonal term and bias, with all x-side
        weights VMEM-resident.  This swaps the dominant [T,B,4h] gi stream
        (3 HBM passes per train step) for an F-wide x stream — the
        HBM-traffic fix for narrow-input models (VERDICT r2 item 1).

    With ``residuals`` (the autodiff forward) and ``save_gates``, also saves
    the post-nonlinearity gates (and, on the low-rank path, the rank-space
    activations h@U) so the backward kernel needs zero recompute matmuls on
    the recurrent path.  With ``save_gates=False`` (x mode only) neither is
    written: the backward recomputes gates/h@U from the streamed x and saved
    h_prev with BATCHED per-time-block matmuls (h_prev is a residual, so the
    recompute is not on the serial chain) — the memory-bound regime's side of
    the trade.  The no-grad primal (inference/eval) skips all residual
    outputs entirely — no extra HBM write traffic."""
    it = iter(refs)
    if xin:
        x_ref = next(it)
        ux_ref = next(it)
        vx_ref = next(it) if x_lowrank else None
        xdvec_ref = next(it)
        bias_ref = next(it)
    else:
        gi_ref = next(it)
    u_ref = next(it)
    v_ref = next(it)
    dvec_ref = next(it)
    h0_ref = next(it)
    c0_ref = next(it)
    ys_ref = next(it)
    cs_ref = next(it)  # residuals: full [sblk,bt,hp] stream; else [bt,hp] c_last
    gates_ref = hu_ref = None
    if residuals and save_gates:
        gates_ref = next(it)
        if lowrank:
            hu_ref = next(it)
    h_s = next(it)
    c_s = next(it)
    assert next(it, None) is None

    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    if xin:
        # batched in-kernel input projection for the whole time block
        xblk = x_ref[:]                                   # [sblk, bt, fp]
        bt = xblk.shape[1]
        x2 = xblk.reshape(sblk * bt, fp)
        x2_mm = x2.astype(jnp.bfloat16) if bf16 else x2   # weights pre-cast
        if x_lowrank:
            xu2 = jnp.dot(x2_mm, ux_ref[:], preferred_element_type=jnp.float32)
            xu2_mm = xu2.astype(jnp.bfloat16) if bf16 else xu2
            gix = jnp.dot(xu2_mm, vx_ref[:], preferred_element_type=jnp.float32)
        else:
            gix = jnp.dot(x2_mm, ux_ref[:], preferred_element_type=jnp.float32)
        xpad = _fit_width(x2, hp)
        gix = gix + jnp.concatenate([xpad] * 4, -1) * xdvec_ref[:] + bias_ref[:]
        gi_blk = gix.reshape(sblk, bt, 4 * hp)

    h = h_s[:]
    c = c_s[:]
    for st in range(sblk):
        h_mm = h.astype(jnp.bfloat16) if bf16 else h  # u/v refs arrive pre-cast
        if lowrank:
            hu = jnp.dot(h_mm, u_ref[:], preferred_element_type=jnp.float32)
            if hu_ref is not None:
                hu_ref[st] = hu.astype(hu_ref.dtype)
            hu = hu.astype(jnp.bfloat16) if bf16 else hu
            gr = jnp.dot(hu, v_ref[:], preferred_element_type=jnp.float32)
        else:
            gr = jnp.dot(h_mm, u_ref[:], preferred_element_type=jnp.float32)
        htile = jnp.concatenate([h, h, h, h], axis=-1)
        gi_t = gi_blk[st] if xin else gi_ref[st]
        pre = gi_t + gr + htile * dvec_ref[:]

        i = jax.nn.sigmoid(pre[:, :hp])
        f = jax.nn.sigmoid(pre[:, hp:2 * hp])
        g = jnp.tanh(pre[:, 2 * hp:3 * hp])
        o = jax.nn.sigmoid(pre[:, 3 * hp:])
        if gates_ref is not None:
            gates_ref[st] = jnp.concatenate(
                [i, f, g, o], axis=-1).astype(gates_ref.dtype)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        ys_ref[st] = h
        if residuals:
            cs_ref[st] = c

    h_s[:] = h
    c_s[:] = c
    if not residuals:
        # no-grad primal only needs the final cell state — one row, written
        # at the last grid step (no [T,B,h] cs HBM stream at inference)
        @pl.when(k == pl.num_programs(1) - 1)
        def _():
            cs_ref[:] = c_s[:]


def _weights_nbytes(*arrs):
    return sum(a.size * a.dtype.itemsize for a in arrs if a is not None)


def _fwd_call(stream, xw, u, v, dvec, h0, c0, *, lowrank, interpret, bf16,
              residuals, save_gates=True):
    """stream: gi [T,Bp,4hp] (xw None) or x [T,Bp,Fp] with
    xw = (ux, vx|None, xdvec, bias) padded x-side weights.
    save_gates=False (x mode only): write no gates/h@U residuals — the
    backward recomputes them batched."""
    xin = xw is not None
    if xin:
        t, bp, fp = stream.shape
        ux, vx, xdvec, bias = xw
        x_lowrank = vx is not None
        fourhp = xdvec.shape[-1]
    else:
        t, bp, fourhp = stream.shape
        fp = fourhp
        ux = vx = xdvec = bias = None
        x_lowrank = False
    hp = fourhp // 4
    if bf16:
        u = u.astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)
        if xin:
            ux = ux.astype(jnp.bfloat16)
            vx = None if vx is None else vx.astype(jnp.bfloat16)
    # residuals without save_gates still streams the double-buffered cs
    # block (hp wide = ¼ of a fourhp unit) on top of the no-grad path's 8
    live = (10 if residuals and save_gates else (9 if residuals else 8)) + (
        3 if xin else 0)
    fixed = _weights_nbytes(u, v, dvec, ux, vx, xdvec, bias)
    sblk, bt = _require_tiles(
        _pick_tiles(t, bp, fourhp, live=live, fixed=fixed), "forward")
    nb = bp // bt if bp % bt == 0 else -(-bp // bt)
    stream = _pad_to(stream, (t, nb * bt, fp))
    h0 = _pad_to(h0, (nb * bt, hp))
    c0 = _pad_to(c0, (nb * bt, hp))

    step = lambda b, tt: (tt, b, 0)
    row = lambda b, tt: (b, 0)
    const = lambda b, tt: (0, 0)

    def blk(shape, idx):
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    operands = [stream]
    in_specs = [blk((sblk, bt, fp), step)]
    if xin:
        for w in (ux, vx, xdvec, bias):
            if w is not None:
                operands.append(w)
                in_specs.append(blk(w.shape, const))
    operands += [u, v, dvec, h0, c0]
    in_specs += [
        blk(u.shape, const),
        blk(v.shape, const),
        blk(dvec.shape, const),
        blk((bt, hp), row),
        blk((bt, hp), row),
    ]
    out_specs = [blk((sblk, bt, hp), step)]
    out_shape = [jax.ShapeDtypeStruct((t, nb * bt, hp), jnp.float32)]
    if residuals:  # full cs stream (backward residual)
        res_dt = _residual_dtype()
        out_specs.append(blk((sblk, bt, hp), step))
        out_shape.append(jax.ShapeDtypeStruct((t, nb * bt, hp), jnp.float32))
        if save_gates:
            out_specs.append(blk((sblk, bt, fourhp), step))
            out_shape.append(jax.ShapeDtypeStruct((t, nb * bt, fourhp), res_dt))
            if lowrank:
                rp = u.shape[1]
                out_specs.append(blk((sblk, bt, rp), step))
                out_shape.append(jax.ShapeDtypeStruct((t, nb * bt, rp), res_dt))
    else:  # c_last row only
        out_specs.append(blk((bt, hp), row))
        out_shape.append(jax.ShapeDtypeStruct((nb * bt, hp), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, hp=hp, fp=fp, lowrank=lowrank,
                          xin=xin, x_lowrank=x_lowrank, bf16=bf16,
                          sblk=sblk, residuals=residuals,
                          save_gates=save_gates),
        grid=(nb, t // sblk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bt, hp), jnp.float32),
            pltpu.VMEM((bt, hp), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*operands)
    # residuals: ys, cs [, gates (post-nonlinearity) [, hu]] (save_gates)
    # no-grad:   ys, c_last
    return tuple(o[:, :bp] if o.ndim == 3 else o[:bp] for o in out)


# ---------------------------------------------------------------------------
# backward kernel (reverse grid)
# ---------------------------------------------------------------------------

def _bwd_kernel(*refs, hp, fp, lowrank, xin, x_lowrank, bf16, sblk,
                save_gates):
    """Grid (batch_blocks, T // sblk); grid step k of batch block b processes
    the time block [T - (k+1)·sblk, T - k·sblk) in reverse inside a static
    loop.  dU/dV/ddvec (and, in x mode, dUx/dVx/dxdvec/dbias) accumulate in
    scratch across ALL grid steps.

    Two residual policies (static `save_gates`):
      * saved — zero recompute on the recurrent path: the forward kernel
        saved the post-nonlinearity gates and the rank-space activations h@U,
        so this kernel streams them instead of re-deriving them.  The right
        trade when the step is latency-bound (LM: wide 4h, rank-300 factors).
      * recompute (x mode only) — neither residual exists; gates and h@U are
        recomputed here from the streamed x and saved h_prev with BATCHED
        per-time-block matmuls (h_prev is a residual, so the recompute never
        extends the serial dh chain).  Removes the [T,B,4h] gates write+read
        and the [T,B,r] h@U write+read — the dominant HBM streams of
        narrow-input train steps (HAR: ~2.2x fewer kernel bytes).

    In gi mode the kernel never touches gi at all (dgi is just dpre); in x
    mode the per-block dpre stack feeds batched x-side gradient matmuls
    (dx, dUx, dVx — xu is recomputed from the streamed x, one cheap batched
    matmul, instead of a [T,B,rx] residual round-trip)."""
    it = iter(refs)
    gates_ref = next(it) if save_gates else None
    hu_ref = next(it) if (lowrank and save_gates) else None
    bias_ref = None
    if xin:
        x_ref = next(it)
        ux_ref = next(it)
        vx_ref = next(it) if x_lowrank else None
        xdvec_ref = next(it)
        if not save_gates:
            bias_ref = next(it)
    u_ref = next(it)
    v_ref = next(it)
    dvec_ref = next(it)
    hprev_ref = next(it)
    cprev_ref = next(it)
    cs_ref = next(it)
    dys_ref = next(it)
    dclast_ref = next(it)  # [bt, hp] — c's only primal output is c_last
    dstream_ref = next(it)  # dgi (gi mode) or dx (x mode)
    du_ref = next(it)
    dv_ref = next(it)
    ddvec_ref = next(it)
    if xin:
        dux_ref = next(it)
        dvx_ref = next(it) if x_lowrank else None
        dxdvec_ref = next(it)
        dbias_ref = next(it)
    dh0_ref = next(it)
    dc0_ref = next(it)
    dh_s = next(it)
    dc_s = next(it)
    du_s = next(it)
    dv_s = next(it)
    ddvec_s = next(it)
    if xin:
        dux_s = next(it)
        dvx_s = next(it) if x_lowrank else None
        dxdvec_s = next(it)
        dbias_s = next(it)
    assert next(it, None) is None

    b = pl.program_id(0)
    k = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)

    @pl.when(jnp.logical_and(b == 0, k == 0))
    def _():
        du_s[:] = jnp.zeros_like(du_s)
        dv_s[:] = jnp.zeros_like(dv_s)
        ddvec_s[:] = jnp.zeros_like(ddvec_s)
        if xin:
            dux_s[:] = jnp.zeros_like(dux_s)
            if dvx_s is not None:
                dvx_s[:] = jnp.zeros_like(dvx_s)
            dxdvec_s[:] = jnp.zeros_like(dxdvec_s)
            dbias_s[:] = jnp.zeros_like(dbias_s)

    @pl.when(k == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = dclast_ref[:]  # dc_last injected at the final timestep

    dh_carry = dh_s[:]
    dc_carry = dc_s[:]
    du_acc = dv_acc = ddvec_acc = None
    dpre_blk = [None] * sblk

    gates_blk = hu_blk = xu2_pre = None
    if not save_gates:
        # batched recompute of the whole block's gates (and h@U): identical
        # op/order to the forward, inputs are residuals, so this never
        # lengthens the serial dh chain.
        btk = dys_ref.shape[1]
        x2r = x_ref[:].reshape(sblk * btk, fp)
        h2r = hprev_ref[:].reshape(sblk * btk, hp)
        x2r_mm = x2r.astype(jnp.bfloat16) if bf16 else x2r
        if x_lowrank:
            xu2_pre = jnp.dot(x2r_mm, ux_ref[:],
                              preferred_element_type=jnp.float32)
            xu2_pre_mm = xu2_pre.astype(jnp.bfloat16) if bf16 else xu2_pre
            gix = jnp.dot(xu2_pre_mm, vx_ref[:],
                          preferred_element_type=jnp.float32)
        else:
            gix = jnp.dot(x2r_mm, ux_ref[:], preferred_element_type=jnp.float32)
        xpad2 = _fit_width(x2r, hp)
        gix = gix + jnp.concatenate([xpad2] * 4, -1) * xdvec_ref[:] + bias_ref[:]
        h2r_mm = h2r.astype(jnp.bfloat16) if bf16 else h2r
        if lowrank:
            hu2 = jnp.dot(h2r_mm, u_ref[:], preferred_element_type=jnp.float32)
            hu2_mm = hu2.astype(jnp.bfloat16) if bf16 else hu2
            gr2 = jnp.dot(hu2_mm, v_ref[:], preferred_element_type=jnp.float32)
            hu_blk = hu2.reshape(sblk, btk, hu2.shape[-1])
        else:
            gr2 = jnp.dot(h2r_mm, u_ref[:], preferred_element_type=jnp.float32)
        htile2 = jnp.concatenate([h2r] * 4, axis=-1)
        pre2 = gix + gr2 + htile2 * dvec_ref[:]
        gates_blk = jnp.concatenate([
            jax.nn.sigmoid(pre2[:, :hp]),
            jax.nn.sigmoid(pre2[:, hp:2 * hp]),
            jnp.tanh(pre2[:, 2 * hp:3 * hp]),
            jax.nn.sigmoid(pre2[:, 3 * hp:]),
        ], axis=-1).reshape(sblk, btk, 4 * hp)

    for st in range(sblk - 1, -1, -1):
        h_prev = hprev_ref[st]
        c_prev = cprev_ref[st]
        c_t = cs_ref[st]

        h_mm = h_prev.astype(jnp.bfloat16) if bf16 else h_prev
        if save_gates:
            gates = gates_ref[st].astype(jnp.float32)  # residual may be bf16
        else:
            gates = gates_blk[st]
        i = gates[:, :hp]
        f = gates[:, hp:2 * hp]
        g = gates[:, 2 * hp:3 * hp]
        o = gates[:, 3 * hp:]
        htile = jnp.concatenate([h_prev] * 4, axis=-1)

        dh = dh_carry + dys_ref[st]
        tanh_c = jnp.tanh(c_t)
        do = dh * tanh_c
        dc = dc_carry + dh * o * (1.0 - tanh_c * tanh_c)
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

        if xin:
            dpre_blk[st] = dpre
        else:
            dstream_ref[st] = dpre

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
            if save_gates:
                hu = hu_ref[st].astype(jnp.float32)  # residual may be bf16
            else:
                hu = hu_blk[st]
            hu_mm = hu.astype(jnp.bfloat16) if bf16 else hu
            dv_t = jnp.dot(hu_mm.T, dpre_mm, preferred_element_type=jnp.float32)
            dv_acc = dv_t if dv_acc is None else dv_acc + dv_t
        else:
            dh_prev = dh_prev + jnp.dot(dpre_mm, u_ref[:].T,
                                        preferred_element_type=jnp.float32)
            du_t = jnp.dot(h_mm.T, dpre_mm, preferred_element_type=jnp.float32)
        du_acc = du_t if du_acc is None else du_acc + du_t

        dh_carry = dh_prev

    if xin:
        # batched x-side gradients for the whole time block
        bt = dpre_blk[0].shape[0]
        dpre2 = jnp.stack(dpre_blk).reshape(sblk * bt, 4 * hp)
        x2 = x_ref[:].reshape(sblk * bt, fp)
        dpre2_mm = dpre2.astype(jnp.bfloat16) if bf16 else dpre2
        x2_mm = x2.astype(jnp.bfloat16) if bf16 else x2
        if x_lowrank:
            dxu = jnp.dot(dpre2_mm, vx_ref[:].T,
                          preferred_element_type=jnp.float32)
            dxu_mm = dxu.astype(jnp.bfloat16) if bf16 else dxu
            dx2 = jnp.dot(dxu_mm, ux_ref[:].T,
                          preferred_element_type=jnp.float32)
            # xu already computed by the gates recompute; else one batched op
            xu2 = xu2_pre if xu2_pre is not None else jnp.dot(
                x2_mm, ux_ref[:], preferred_element_type=jnp.float32)
            xu2_mm = xu2.astype(jnp.bfloat16) if bf16 else xu2
            dux_s[:] += jnp.dot(x2_mm.T, dxu_mm,
                                preferred_element_type=jnp.float32)
            dvx_s[:] += jnp.dot(xu2_mm.T, dpre2_mm,
                                preferred_element_type=jnp.float32)
        else:
            dx2 = jnp.dot(dpre2_mm, ux_ref[:].T,
                          preferred_element_type=jnp.float32)
            dux_s[:] += jnp.dot(x2_mm.T, dpre2_mm,
                                preferred_element_type=jnp.float32)
        # elementwise x-diagonal term: dx += sum_g dpre_g * xdvec_g (over the
        # min(F, h) features the term is defined on)
        dxe = dpre2 * xdvec_ref[:]
        dxe = (dxe[:, :hp] + dxe[:, hp:2 * hp]
               + dxe[:, 2 * hp:3 * hp] + dxe[:, 3 * hp:])
        dx2 = dx2 + _fit_width(dxe, fp)
        xpad = _fit_width(x2, hp)
        dxdvec_s[:] += jnp.sum(dpre2 * jnp.concatenate([xpad] * 4, -1),
                               axis=0, keepdims=True)
        dbias_s[:] += jnp.sum(dpre2, axis=0, keepdims=True)
        dstream_ref[:] = dx2.reshape(sblk, bt, fp)

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
        if xin:
            dux_ref[:] = dux_s[:]
            if dvx_ref is not None:
                dvx_ref[:] = dvx_s[:]
            dxdvec_ref[:] = dxdvec_s[:]
            dbias_ref[:] = dbias_s[:]


def _bwd_call(gates, hu, xres, u, v, dvec, hprev, cprev, cs, dys, dclast,
              *, lowrank, interpret, bf16, save_gates=True):
    """xres: None (gi mode — dgi streams out) or
    (x, ux, vx|None, xdvec, bias|None) padded x-side residuals/weights
    (x mode — dx streams out and the x-side weight gradients come back as
    whole arrays).  save_gates=False (x mode only): gates/hu are None and get
    recomputed inside the kernel (bias required)."""
    t, bp, hp = dys.shape
    fourhp = 4 * hp
    xin = xres is not None
    if xin:
        x, ux, vx, xdvec, bias = xres
        x_lowrank = vx is not None
        fp = x.shape[-1]
    else:
        x = ux = vx = xdvec = bias = None
        x_lowrank = False
        fp = fourhp
    if bf16:
        u = u.astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16)
        if xin:
            ux = ux.astype(jnp.bfloat16)
            vx = None if vx is None else vx.astype(jnp.bfloat16)
    live = 16 + (4 if xin else 0) + (0 if save_gates else 8)
    fixed = 2 * _weights_nbytes(u, v, dvec, ux, vx, xdvec)  # operand + grad acc
    sblk, bt = _require_tiles(
        _pick_tiles(t, bp, fourhp, live=live, fixed=fixed), "backward")
    nb = bp // bt if bp % bt == 0 else -(-bp // bt)
    bpad = nb * bt
    if save_gates:
        gates = _pad_to(gates, (t, bpad, fourhp))
    hprev = _pad_to(hprev, (t, bpad, hp))
    cprev = _pad_to(cprev, (t, bpad, hp))
    cs = _pad_to(cs, (t, bpad, hp))
    dys = _pad_to(dys, (t, bpad, hp))
    dclast = _pad_to(dclast, (bpad, hp))

    ntb = t // sblk
    rev = lambda b, k: (ntb - 1 - k, b, 0)
    row = lambda b, k: (b, 0)
    const = lambda b, k: (0, 0)

    def blk(shape, idx):
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    in_specs = []
    operands = []
    if save_gates:
        in_specs.append(blk((sblk, bt, fourhp), rev))                # gates
        operands.append(gates)
        if lowrank:
            rp = hu.shape[-1]
            hu = _pad_to(hu, (t, bpad, rp))
            in_specs.append(blk((sblk, bt, rp), rev))                # h@U
            operands.append(hu)
    if xin:
        x = _pad_to(x, (t, bpad, fp))
        in_specs.append(blk((sblk, bt, fp), rev))                    # x
        operands.append(x)
        xws = (ux, vx, xdvec) if save_gates else (ux, vx, xdvec, bias)
        for w in xws:
            if w is not None:
                in_specs.append(blk(w.shape, const))
                operands.append(w)
    in_specs += [
        blk(u.shape, const),
        blk(v.shape, const),
        blk(dvec.shape, const),
        blk((sblk, bt, hp), rev),      # h_{t-1}
        blk((sblk, bt, hp), rev),      # c_{t-1}
        blk((sblk, bt, hp), rev),      # c_t
        blk((sblk, bt, hp), rev),      # dys_t
        blk((bt, hp), row),            # dc_last
    ]
    operands += [u, v, dvec, hprev, cprev, cs, dys, dclast]

    f32 = jnp.float32
    out_specs = [
        blk((sblk, bt, fp), rev),      # dgi or dx
        blk(u.shape, const),
        blk(v.shape, const),
        blk(dvec.shape, const),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t, bpad, fp), f32),
        jax.ShapeDtypeStruct(u.shape, f32),
        jax.ShapeDtypeStruct(v.shape, f32),
        jax.ShapeDtypeStruct(dvec.shape, f32),
    ]
    scratch = [
        pltpu.VMEM((bt, hp), f32),      # dh carry
        pltpu.VMEM((bt, hp), f32),      # dc carry
        pltpu.VMEM(u.shape, f32),       # dU accumulator
        pltpu.VMEM(v.shape, f32),       # dV accumulator
        pltpu.VMEM(dvec.shape, f32),    # ddvec accumulator
    ]
    if xin:
        xg_shapes = [ux.shape]                       # dux
        if x_lowrank:
            xg_shapes.append(vx.shape)               # dvx
        xg_shapes += [xdvec.shape, xdvec.shape]      # dxdvec, dbias ([1, 4hp])
        for s in xg_shapes:
            out_specs.append(blk(s, const))
            out_shape.append(jax.ShapeDtypeStruct(s, f32))
            scratch.append(pltpu.VMEM(s, f32))
    out_specs += [blk((bt, hp), row), blk((bt, hp), row)]
    out_shape += [jax.ShapeDtypeStruct((bpad, hp), f32),
                  jax.ShapeDtypeStruct((bpad, hp), f32)]

    out = pl.pallas_call(
        functools.partial(_bwd_kernel, hp=hp, fp=fp, lowrank=lowrank,
                          xin=xin, x_lowrank=x_lowrank, bf16=bf16, sblk=sblk,
                          save_gates=save_gates),
        grid=(nb, ntb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*operands)
    it = iter(out)
    dstream = next(it)[:, :bp]
    du, dv, ddvec = next(it), next(it), next(it)
    if xin:
        dux = next(it)
        dvx = next(it) if x_lowrank else None
        dxdvec, dbias = next(it), next(it)
    else:
        dux = dvx = dxdvec = dbias = None
    dh0, dc0 = next(it)[:bp], next(it)[:bp]
    assert next(it, None) is None
    return dstream, du, dv, ddvec, (dux, dvx, dxdvec, dbias), dh0, dc0


# ---------------------------------------------------------------------------
# public entry: padded, differentiable scan
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _scan_core(gi, u, v, dvec, h0, c0, lowrank, interpret, bf16):
    """-> (ys [T,B,h], c_last [B,h]).  The full cs stream is a backward-only
    residual, never a primal output — so the no-grad primal writes only the
    c_last row (no [T,B,h] cs HBM stream at inference) and the backward
    takes a [B,h] dc_last row instead of streaming a zeros dcs cotangent."""
    ys, c_last = _fwd_call(gi, None, u, v, dvec, h0, c0, lowrank=lowrank,
                           interpret=interpret, bf16=bf16, residuals=False)
    return ys, c_last


def _scan_core_fwd(gi, u, v, dvec, h0, c0, lowrank, interpret, bf16):
    out = _fwd_call(gi, None, u, v, dvec, h0, c0, lowrank=lowrank,
                    interpret=interpret, bf16=bf16, residuals=True)
    ys, cs, gates = out[:3]
    hu = out[3] if lowrank else None
    # gi is NOT a residual: dgi == dpre and the backward kernel reconstructs
    # everything from the saved gates / rank activations.
    return (ys, cs[-1]), (u, v, dvec, h0, c0, ys, cs, gates, hu)


def _scan_core_bwd(lowrank, interpret, bf16, res, cts):
    dys, dclast = cts
    u, v, dvec, h0, c0, ys, cs, gates, hu = res
    hprev = jnp.concatenate([h0[None], ys[:-1]], axis=0)
    cprev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
    dgi, du, dv, ddvec, _, dh0, dc0 = _bwd_call(
        gates, hu, None, u, v, dvec, hprev, cprev, cs, dys, dclast,
        lowrank=lowrank, interpret=interpret, bf16=bf16)
    return dgi, du, dv, ddvec, dh0, dc0


_scan_core.defvjp(_scan_core_fwd, _scan_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def _scan_core_xin(x, ux, vx, xdvec, bias, u, v, dvec, h0, c0,
                   lowrank, x_lowrank, interpret, bf16, save_gates):
    vxx = vx if x_lowrank else None
    ys, c_last = _fwd_call(x, (ux, vxx, xdvec, bias), u, v, dvec, h0, c0,
                           lowrank=lowrank, interpret=interpret, bf16=bf16,
                           residuals=False)
    return ys, c_last


def _scan_core_xin_fwd(x, ux, vx, xdvec, bias, u, v, dvec, h0, c0,
                       lowrank, x_lowrank, interpret, bf16, save_gates):
    vxx = vx if x_lowrank else None
    out = _fwd_call(x, (ux, vxx, xdvec, bias), u, v, dvec, h0, c0,
                    lowrank=lowrank, interpret=interpret, bf16=bf16,
                    residuals=True, save_gates=save_gates)
    ys, cs = out[:2]
    gates = out[2] if save_gates else None
    hu = out[3] if (lowrank and save_gates) else None
    return ((ys, cs[-1]),
            (x, ux, vx, xdvec, bias, u, v, dvec, h0, c0, ys, cs, gates, hu))


def _scan_core_xin_bwd(lowrank, x_lowrank, interpret, bf16, save_gates,
                       res, cts):
    dys, dclast = cts
    x, ux, vx, xdvec, bias, u, v, dvec, h0, c0, ys, cs, gates, hu = res
    hprev = jnp.concatenate([h0[None], ys[:-1]], axis=0)
    cprev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
    vxx = vx if x_lowrank else None
    dx, du, dv, ddvec, (dux, dvx, dxdvec, dbias), dh0, dc0 = _bwd_call(
        gates, hu, (x, ux, vxx, xdvec, bias), u, v, dvec, hprev, cprev, cs,
        dys, dclast, lowrank=lowrank, interpret=interpret, bf16=bf16,
        save_gates=save_gates)
    if dvx is None:
        dvx = jnp.zeros_like(vx)
    return dx, dux, dvx, dxdvec, dbias, du, dv, ddvec, dh0, dc0


_scan_core_xin.defvjp(_scan_core_xin_fwd, _scan_core_xin_bwd)


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
    ys, c_last = _scan_core(gi4, up, vp, dvec4, h0p, c0p, lowrank, interpret,
                            bf16)
    return ys[:, :b, :h], c_last[:b, :h]


def lstm_scan_fused_xin(xs, ux, vx, xdvec, bias, u, v, dvec, h0, c0, *,
                        interpret=False, precision="f32"):
    """Fused LSTM scan with the input projection INSIDE the kernel.

    xs: [T, B, F] raw inputs.  x side (all VMEM-resident):
      ux: [F, rx] with vx: [rx, 4h] (low-rank) or ux: [F, 4h] with vx=None
        (dense) — gate order i,f,g,o;
      xdvec: [4, h] per-gate elementwise coefficient applied to x over the
        first min(F, h) features (VMLMF: pad(d_x) − dcorr_x; zeros if unused);
      bias: [4h] time-invariant gate bias (b_x + b_h).
    h side as `lstm_scan_fused`: u [h, r] / v [r, 4h] (or dense u, v=None),
    dvec [4h]; h0, c0 [B, h].  Returns (ys [T, B, h], c_last [B, h]).

    vs the hoisted-gi path this streams x (F wide) instead of gi (4h wide)
    and never materializes gi or dgi in HBM — per train step it removes
    ~5 HBM passes of [T, B, 4h] (gi write + 2 reads, dgi write + read),
    replacing them with 2 passes of [T, B, F].  The win scales with 4h / F;
    it is the roofline fix for narrow-input models (HAR: F=77, 4h=720).

    Residual policy (round-5 default flip): by default the backward
    STREAMS the saved gates and h@U residuals ([T,B,4h] + [T,B,r] HBM
    round trips, zero recompute) — measured ~11% faster end-to-end at the
    large-batch LM profiles and +3-4% even at B=20/81 once the lse-loss
    fix removed the competing HBM waste; set VMLMF_PALLAS_SAVED_GATES=0
    for the RECOMPUTE policy (gates/h@U rebuilt batched from x + saved
    h_prev), which halves the step's residual HBM footprint for
    memory-constrained configs at that throughput cost.
    NOTE the policy is captured at TRACE time: flipping the env var after a
    step is jitted has no effect — the jit cache keeps the traced policy.
    Re-jit (fresh trainer / `jax.clear_caches()`) to change it, as
    `scripts/bench_residual_policy.py` does.

    Gradients flow to every input via the paired backward kernel, which
    computes dx and the x-side weight gradients with batched per-time-block
    matmuls (xu recomputed from the streamed x — cheaper than a residual
    round-trip).
    """
    t, b, f = xs.shape
    fourh = bias.shape[-1]
    h = fourh // 4
    lowrank = v is not None
    x_lowrank = vx is not None
    bp = _round_up(b, 8)
    hp = _round_up(h, 128)
    fp = _round_up(f, 128)

    xsp = _pad_to(xs, (t, bp, fp))
    # x-side weights re-laid out to padded gate blocks
    if x_lowrank:
        rx = ux.shape[1]
        rxp = _round_up(rx, 128)
        uxp = _pad_to(ux, (fp, rxp))
        vxp = _pad_to(vx.reshape(rx, 4, h), (rxp, 4, hp)).reshape(rxp, 4 * hp)
    else:
        uxp = _pad_to(ux.reshape(f, 4, h), (fp, 4, hp)).reshape(fp, 4 * hp)
        vxp = jnp.zeros((8, 128), jnp.float32)  # unused placeholder
    xdvecp = _pad_to(xdvec, (4, hp)).reshape(1, 4 * hp)
    biasp = _pad_to(bias.reshape(4, h), (4, hp)).reshape(1, 4 * hp)

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
    save_gates = os.environ.get("VMLMF_PALLAS_SAVED_GATES", "1") != "0"
    ys, c_last = _scan_core_xin(xsp, uxp, vxp, xdvecp, biasp, up, vp, dvec4,
                                h0p, c0p, lowrank, x_lowrank, interpret, bf16,
                                save_gates)
    return ys[:, :b, :h], c_last[:b, :h]


def vmlmf_rec_inputs(prep, hidden_size):
    """Map a VMLMFCell prep dict onto (u, v, dvec) for the fused kernel."""
    u = prep["u_h"]                      # [h, r]
    v = prep["v_h"].T                    # [r, 4h]
    dvec = (prep["d_h"][None, :] - prep["dcorr_h"]).reshape(-1)  # [4h]
    return u, v, dvec
