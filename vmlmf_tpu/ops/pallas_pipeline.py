"""Fused multi-layer wavefront Pallas kernel: the whole LSTM *stack* in one
kernel launch.

`ops.pallas_scan` fuses one layer's time loop; a stacked LM still runs L
sequential kernel launches whose serial chains add up (layer l cannot start
until layer l-1 finishes — `nn.recurrence.RNN` semantics).  `ops.pipeline`
showed the wavefront reschedule is exact but unprofitable at the XLA level
(factors re-streamed from HBM every step).  This kernel combines both ideas:

  * grid ``(batch_blocks, T/sblk + L - 1)`` — a *block staircase*: at grid
    step k, layer l processes time block ``k - l``.  Within a grid step the
    layers' computations are mutually independent (layer l consumes the
    y_{l-1} block produced in the **previous** grid step, held in VMEM
    scratch), so Mosaic can overlap their MXU chains — the serial latency of
    the stack drops from ``L · T`` chained matmul pairs to ``T + L - 1``.
  * every layer's recurrent factors (U_h, V_h) *and* inter-layer input
    factors (U_x, V_x) stay VMEM-resident across the whole scan — read from
    HBM exactly once (the XLA wavefront's fatal flaw fixed),
  * layer l ≥ 1's input projection is computed **block-parallel** inside the
    kernel ([sblk·B, h] @ U_x @ V_x — a bigger, better-shaped MXU matmul than
    the per-step recurrence),
  * inter-layer dropout (the LM semantics, `vmlmf_lm.py:433-441`) runs inside
    the kernel via pre-generated scaled masks streamed per time block,
  * a reverse-staircase backward kernel (custom VJP) propagates dy through
    both time (per layer) and depth (dx of layer l feeds dy of layer l-1,
    through the same mask), with zero recompute matmuls on the recurrent path
    (gates and rank activations saved by the forward) and param-gradient
    accumulators resident in VMEM across all grid steps.

Applies to uniform LSTM-family stacks where every layer's recurrence is
``h @ (U V) + h ⊙ dvec`` and every inter-layer input path is
``x @ (U_x V_x) + x ⊙ dxvec + bias`` — i.e. any cell exposing
`pipeline_units` (VMLMFCell, low-rank LSTMCell).  Reference behavior being
replaced: the doubly nested Python loop at
`/root/reference/rnn_compression_factorization_vmlmf/src/models/vmlmf.py:300-310`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vmlmf_tpu.ops.pallas_scan import (
    _compiler_params,
    _pad_to,
    _pick_tiles,
    _round_up,
)


def _split4(x, hp):
    return x[..., :hp], x[..., hp:2 * hp], x[..., 2 * hp:3 * hp], x[..., 3 * hp:]


def _sum4(x, hp):
    a, b, c, d = _split4(x, hp)
    return a + b + c + d


def _tile4(x):
    return jnp.concatenate([x, x, x, x], axis=-1)


def _cast(x, bf16):
    return x.astype(jnp.bfloat16) if bf16 else x


_VMEM_MSG = (
    "pallas_pipelined stack of {L} layers does not fit VMEM: the design "
    "keeps every layer's factors (and, in the backward, their gradient "
    "accumulators) VMEM-resident, which bounds the stack depth at a given "
    "(hidden, rank). Use stack_fits() to pre-check, or the per-layer "
    "'pallas' backend."
)


def _weight_bytes(layers, bf16):
    """VMEM bytes of the whole-array (non-streamed) weight operands."""
    wsize = 2 if bf16 else 4
    total = 0
    for lay in layers:
        for key in ("u", "v", "ux", "vx"):
            if key in lay:
                total += lay[key].size * wsize
        for key in ("dvec", "dxvec", "bias"):
            if key in lay:
                total += lay[key].size * 4
    return total


def stack_fits(layers):
    """True when the fused stack kernel (fwd AND bwd) plausibly fits VMEM;
    callers fall back to the per-layer 'pallas' backend instead of failing
    TPU compilation.

    Deliberately conservative criterion — VMEM-resident weights twice (bwd:
    operand + f32 grad accumulator; grads are always f32, so precision does
    not enter) plus the minimal backward stream tile (time-block 1, 8 batch
    rows — independent of T/B) must fit the chip's stream budget
    (`ops.vmem.vmem_budgets`, env-overridable) — calibrated against
    measurement on v5e (tunneled compiler reports no allocation detail): the
    2x650 w300/u300 stack compiles and runs, the 4x650 stack does not
    compile even at the smallest tile.  The stack kernel's whole design (all
    layers' factors VMEM-resident) bounds its profitable depth; past that
    bound the grouped/per-layer fused kernels are the right tool anyway."""
    if layers is None:
        return False
    from vmlmf_tpu.ops.vmem import vmem_budgets

    h = layers[0]["u"].shape[0]
    hp = _round_up(h, 128)

    def wbytes(wsize):
        total = 0
        for lay in layers:
            for key in ("u", "ux"):
                if key in lay:  # [h, r] -> (hp, rp)
                    total += hp * _round_up(lay[key].shape[1], 128) * wsize
            for key in ("v", "vx"):
                if key in lay:  # [r, 4h] -> (rp, 4hp)
                    total += _round_up(lay[key].shape[0], 128) * 4 * hp * wsize
        return total

    min_stream = 18 * len(layers) * 8 * 4 * hp * 4
    total = 2 * wbytes(4) + min_stream
    budget = vmem_budgets()["budget"]
    if len(layers) <= 2:
        return total <= budget
    # Deeper stacks under-model the real Mosaic frame: a 3x650-w300 group
    # whose model total (96M incl. picked tiles) sits BELOW the 2x650's
    # (106M) still overflows on-chip (measured 119.3M scoped frame vs the
    # 116M limit) — per-layer stream buffers and unrolled spills grow faster
    # than the linear model.  Demand 2x margin past two resident layers.
    return total <= budget // 2


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _mlfwd_kernel(*refs, L, hp, sblk, nt, bf16, residuals, has_mask):
    """See module docstring.  Ref layout is built by `_mlfwd_call` and
    unpacked here in the same order."""
    it = iter(refs)
    gi0 = next(it)
    u = [next(it) for _ in range(L)]
    v = [next(it) for _ in range(L)]
    dvec = [next(it) for _ in range(L)]
    ux = [None] + [next(it) for _ in range(L - 1)]
    vx = [None] + [next(it) for _ in range(L - 1)]
    dxvec = [None] + [next(it) for _ in range(L - 1)]
    bias = [None] + [next(it) for _ in range(L - 1)]
    mask = [None] + ([next(it) for _ in range(L - 1)] if has_mask else [None] * (L - 1))
    h0 = [next(it) for _ in range(L)]
    c0 = [next(it) for _ in range(L)]
    # outputs
    ys_last = next(it)
    hlast = [next(it) for _ in range(L)]
    clast = [next(it) for _ in range(L)]
    if residuals:
        ys_res = [next(it) for _ in range(L - 1)]
        cs_res = [next(it) for _ in range(L)]
        gates_res = [next(it) for _ in range(L)]
        hu_res = [next(it) for _ in range(L)]
        xu_res = [None] + [next(it) for _ in range(L - 1)]
    # scratch
    h_s = [next(it) for _ in range(L)]
    c_s = [next(it) for _ in range(L)]
    xbuf = [None] + [next(it) for _ in range(L - 1)]
    assert next(it, None) is None

    k = pl.program_id(1)

    # descending layer order: layer l reads xbuf[l] (previous grid step's
    # y_{l-1} block) BEFORE layer l-1 overwrites it with this step's block.
    for l in range(L - 1, -1, -1):
        @pl.when(jnp.logical_and(k >= l, k < nt + l))
        def _(l=l):
            @pl.when(k == l)
            def _():
                h_s[l][:] = h0[l][:]
                c_s[l][:] = c0[l][:]

            h = h_s[l][:]
            c = c_s[l][:]
            if l > 0:
                # block-parallel input projection from the buffered y_{l-1}
                xblk = xbuf[l][:]                       # [sblk, bt, hp]
                bt = xblk.shape[1]
                x2 = xblk.reshape(sblk * bt, hp)
                xu2 = jnp.dot(_cast(x2, bf16), ux[l][:],
                              preferred_element_type=jnp.float32)
                if residuals:
                    xu_res[l][:] = xu2.reshape(sblk, bt, -1)
                gix = jnp.dot(_cast(xu2, bf16), vx[l][:],
                              preferred_element_type=jnp.float32)
                gix = gix + _tile4(x2) * dxvec[l][:] + bias[l][:]
                gix = gix.reshape(sblk, bt, 4 * hp)

            ys_blk = []
            for st in range(sblk):
                gi_t = gi0[st] if l == 0 else gix[st]
                hu = jnp.dot(_cast(h, bf16), u[l][:],
                             preferred_element_type=jnp.float32)
                if residuals:
                    hu_res[l][st] = hu
                gr = jnp.dot(_cast(hu, bf16), v[l][:],
                             preferred_element_type=jnp.float32)
                pre = gi_t + gr + _tile4(h) * dvec[l][:]
                i, f, g, o = _split4(pre, hp)
                i = jax.nn.sigmoid(i)
                f = jax.nn.sigmoid(f)
                g = jnp.tanh(g)
                o = jax.nn.sigmoid(o)
                if residuals:
                    gates_res[l][st] = jnp.concatenate([i, f, g, o], axis=-1)
                c = f * c + i * g
                h = o * jnp.tanh(c)
                if residuals:
                    cs_res[l][st] = c
                if l == L - 1:
                    ys_last[st] = h
                elif residuals:
                    ys_res[l][st] = h
                ys_blk.append(h)

            h_s[l][:] = h
            c_s[l][:] = c
            if l < L - 1:
                yb = jnp.stack(ys_blk)                  # [sblk, bt, hp]
                if has_mask:
                    yb = yb * mask[l + 1][:]
                xbuf[l + 1][:] = yb

        @pl.when(k == nt - 1 + l)
        def _(l=l):
            hlast[l][:] = h_s[l][:]
            clast[l][:] = c_s[l][:]


def _mlfwd_call(gi0, layers, h0s, c0s, masks, *, interpret, bf16, residuals):
    """All inputs pre-padded: gi0 [T, Bp, 4hp]; per-layer dicts of padded
    factors; h0s/c0s lists of [Bp, hp]; masks list of [T, Bp, hp] or None."""
    L = len(layers)
    t, bp, fourhp = gi0.shape
    hp = fourhp // 4
    has_mask = masks is not None
    live = (12 if residuals else 9) * L
    tiles = _pick_tiles(t, bp, fourhp, live=live,
                        fixed=_weight_bytes(layers, bf16))
    if tiles is None:
        raise ValueError(_VMEM_MSG.format(L=L))
    sblk, bt = tiles
    nb = -(-bp // bt)
    nt = t // sblk
    gi0 = _pad_to(gi0, (t, nb * bt, fourhp))
    h0s = [_pad_to(h, (nb * bt, hp)) for h in h0s]
    c0s = [_pad_to(c, (nb * bt, hp)) for c in c0s]
    if has_mask:
        masks = [_pad_to(m, (t, nb * bt, hp)) for m in masks]

    def stair(l):
        return lambda b, k: (jnp.clip(k - l, 0, nt - 1), b, 0)

    row = lambda b, k: (b, 0)
    const = lambda b, k: (0, 0)

    def blk(shape, idx):
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    cast_w = lambda w: w.astype(jnp.bfloat16) if bf16 else w

    operands, in_specs = [gi0], [blk((sblk, bt, fourhp), stair(0))]
    for key in ("u", "v", "dvec"):
        for lay in layers:
            w = cast_w(lay[key]) if key in ("u", "v") else lay[key]
            operands.append(w)
            in_specs.append(blk(w.shape, const))
    for key in ("ux", "vx", "dxvec", "bias"):
        for lay in layers[1:]:
            w = cast_w(lay[key]) if key in ("ux", "vx") else lay[key]
            operands.append(w)
            in_specs.append(blk(w.shape, const))
    if has_mask:
        for l in range(1, L):
            operands.append(masks[l - 1])
            # consumed at production time by layer l-1 (its time block k-(l-1))
            in_specs.append(blk((sblk, bt, hp), stair(l - 1)))
    for arr in (*h0s, *c0s):
        operands.append(arr)
        in_specs.append(blk((bt, hp), row))

    out_specs = [blk((sblk, bt, hp), stair(L - 1))]          # ys_last
    out_shape = [jax.ShapeDtypeStruct((t, nb * bt, hp), jnp.float32)]
    for _ in range(2 * L):                                    # hlast, clast
        out_specs.append(blk((bt, hp), row))
        out_shape.append(jax.ShapeDtypeStruct((nb * bt, hp), jnp.float32))
    if residuals:
        rhs = [lay["u"].shape[1] for lay in layers]
        rxs = [lay["ux"].shape[1] for lay in layers[1:]]
        for l in range(L - 1):                                # ys_res
            out_specs.append(blk((sblk, bt, hp), stair(l)))
            out_shape.append(jax.ShapeDtypeStruct((t, nb * bt, hp), jnp.float32))
        for l in range(L):                                    # cs_res
            out_specs.append(blk((sblk, bt, hp), stair(l)))
            out_shape.append(jax.ShapeDtypeStruct((t, nb * bt, hp), jnp.float32))
        for l in range(L):                                    # gates_res
            out_specs.append(blk((sblk, bt, fourhp), stair(l)))
            out_shape.append(jax.ShapeDtypeStruct((t, nb * bt, fourhp), jnp.float32))
        for l in range(L):                                    # hu_res
            out_specs.append(blk((sblk, bt, rhs[l]), stair(l)))
            out_shape.append(jax.ShapeDtypeStruct((t, nb * bt, rhs[l]), jnp.float32))
        for l in range(1, L):                                 # xu_res
            out_specs.append(blk((sblk, bt, rxs[l - 1]), stair(l)))
            out_shape.append(jax.ShapeDtypeStruct((t, nb * bt, rxs[l - 1]), jnp.float32))

    scratch = [pltpu.VMEM((bt, hp), jnp.float32) for _ in range(2 * L)]
    scratch += [pltpu.VMEM((sblk, bt, hp), jnp.float32) for _ in range(L - 1)]

    out = pl.pallas_call(
        functools.partial(_mlfwd_kernel, L=L, hp=hp, sblk=sblk, nt=nt,
                          bf16=bf16, residuals=residuals, has_mask=has_mask),
        grid=(nb, nt + L - 1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*operands)
    return tuple(o[:, :bp] if o.ndim == 3 else o[:bp] for o in out)


# ---------------------------------------------------------------------------
# backward kernel (reverse staircase)
# ---------------------------------------------------------------------------

def _mlbwd_kernel(*refs, L, hp, sblk, nt, bf16, has_mask):
    """At grid step j, layer l processes the reverse time block
    ``nt - 1 - j + (L - 1 - l)``.  dx of layer l (produced at step j) feeds
    dy of layer l-1 (consumed at step j+1) through the dybuf scratch —
    the exact mirror of the forward staircase."""
    it = iter(refs)
    dys = next(it)
    dhlast = [next(it) for _ in range(L)]
    dclast = [next(it) for _ in range(L)]
    u = [next(it) for _ in range(L)]
    v = [next(it) for _ in range(L)]
    dvec = [next(it) for _ in range(L)]
    ux = [None] + [next(it) for _ in range(L - 1)]
    vx = [None] + [next(it) for _ in range(L - 1)]
    dxvec = [None] + [next(it) for _ in range(L - 1)]
    gates = [next(it) for _ in range(L)]
    hu = [next(it) for _ in range(L)]
    hprev = [next(it) for _ in range(L)]
    cprev = [next(it) for _ in range(L)]
    cs = [next(it) for _ in range(L)]
    xu = [None] + [next(it) for _ in range(L - 1)]
    ysrc = [None] + [next(it) for _ in range(L - 1)]
    mask = [None] + ([next(it) for _ in range(L - 1)] if has_mask else [None] * (L - 1))
    # outputs
    dgi0 = next(it)
    du = [next(it) for _ in range(L)]
    dv = [next(it) for _ in range(L)]
    ddvec = [next(it) for _ in range(L)]
    dux = [None] + [next(it) for _ in range(L - 1)]
    dvx = [None] + [next(it) for _ in range(L - 1)]
    ddxvec = [None] + [next(it) for _ in range(L - 1)]
    dbias = [None] + [next(it) for _ in range(L - 1)]
    dh0 = [next(it) for _ in range(L)]
    dc0 = [next(it) for _ in range(L)]
    # scratch
    dh_s = [next(it) for _ in range(L)]
    dc_s = [next(it) for _ in range(L)]
    du_s = [next(it) for _ in range(L)]
    dv_s = [next(it) for _ in range(L)]
    ddvec_s = [next(it) for _ in range(L)]
    dux_s = [None] + [next(it) for _ in range(L - 1)]
    dvx_s = [None] + [next(it) for _ in range(L - 1)]
    ddxvec_s = [None] + [next(it) for _ in range(L - 1)]
    dbias_s = [None] + [next(it) for _ in range(L - 1)]
    dybuf = [next(it) for _ in range(L - 1)]
    assert next(it, None) is None

    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(0)

    # ascending layer order: layer l reads dybuf[l] (layer l+1's dx from the
    # previous grid step) BEFORE layer l+1 overwrites it this step.
    for l in range(L):
        first = L - 1 - l          # j of this layer's first (t = T-1) block
        last = nt - 1 + L - 1 - l  # j of its final (t = 0) block

        @pl.when(jnp.logical_and(b == 0, j == first))
        def _(l=l):
            du_s[l][:] = jnp.zeros_like(du_s[l])
            dv_s[l][:] = jnp.zeros_like(dv_s[l])
            ddvec_s[l][:] = jnp.zeros_like(ddvec_s[l])
            if l > 0:
                dux_s[l][:] = jnp.zeros_like(dux_s[l])
                dvx_s[l][:] = jnp.zeros_like(dvx_s[l])
                ddxvec_s[l][:] = jnp.zeros_like(ddxvec_s[l])
                dbias_s[l][:] = jnp.zeros_like(dbias_s[l])

        @pl.when(jnp.logical_and(j >= first, j <= last))
        def _(l=l, first=first):
            @pl.when(j == first)
            def _():
                dh_s[l][:] = dhlast[l][:]
                dc_s[l][:] = dclast[l][:]

            dh_c = dh_s[l][:]
            dc_c = dc_s[l][:]
            du_acc = dv_acc = ddvec_acc = None
            dpre_blk = [None] * sblk
            for st in range(sblk - 1, -1, -1):
                h_prev = hprev[l][st]
                c_prev = cprev[l][st]
                c_t = cs[l][st]
                gt = gates[l][st]
                i, f, g, o = _split4(gt, hp)

                dy = dys[st] if l == L - 1 else dybuf[l][st]
                dh = dh_c + dy
                tanh_c = jnp.tanh(c_t)
                do = dh * tanh_c
                dc = dc_c + dh * o * (1.0 - tanh_c * tanh_c)
                di = dc * g
                df = dc * c_prev
                dg = dc * i
                dc_c = dc * f

                dpre = jnp.concatenate([
                    di * i * (1.0 - i),
                    df * f * (1.0 - f),
                    dg * (1.0 - g * g),
                    do * o * (1.0 - o),
                ], axis=-1)
                dpre_blk[st] = dpre
                if l == 0:
                    dgi0[st] = dpre

                dh_prev = _sum4(dpre * dvec[l][:], hp)
                dd = jnp.sum(dpre * _tile4(h_prev), axis=0, keepdims=True)
                ddvec_acc = dd if ddvec_acc is None else ddvec_acc + dd

                dpre_mm = _cast(dpre, bf16)
                dhu = jnp.dot(dpre_mm, v[l][:].T,
                              preferred_element_type=jnp.float32)
                dhu_mm = _cast(dhu, bf16)
                dh_prev = dh_prev + jnp.dot(dhu_mm, u[l][:].T,
                                            preferred_element_type=jnp.float32)
                du_t = jnp.dot(_cast(h_prev, bf16).T, dhu_mm,
                               preferred_element_type=jnp.float32)
                dv_t = jnp.dot(_cast(hu[l][st], bf16).T, dpre_mm,
                               preferred_element_type=jnp.float32)
                du_acc = du_t if du_acc is None else du_acc + du_t
                dv_acc = dv_t if dv_acc is None else dv_acc + dv_t
                dh_c = dh_prev

            du_s[l][:] += du_acc
            dv_s[l][:] += dv_acc
            ddvec_s[l][:] += ddvec_acc
            dh_s[l][:] = dh_c
            dc_s[l][:] = dc_c

            if l > 0:
                # block-parallel input-path gradients
                bt = dpre_blk[0].shape[0]
                dpre2 = jnp.stack(dpre_blk).reshape(sblk * bt, 4 * hp)
                x2 = ysrc[l][:]
                if has_mask:
                    x2 = x2 * mask[l][:]
                x2 = x2.reshape(sblk * bt, hp)
                xu2 = xu[l][:].reshape(sblk * bt, -1)
                dpre2_mm = _cast(dpre2, bf16)
                dxu = jnp.dot(dpre2_mm, vx[l][:].T,
                              preferred_element_type=jnp.float32)
                dxu_mm = _cast(dxu, bf16)
                dx2 = (jnp.dot(dxu_mm, ux[l][:].T,
                               preferred_element_type=jnp.float32)
                       + _sum4(dpre2 * dxvec[l][:], hp))
                dux_s[l][:] += jnp.dot(_cast(x2, bf16).T, dxu_mm,
                                       preferred_element_type=jnp.float32)
                dvx_s[l][:] += jnp.dot(_cast(xu2, bf16).T, dpre2_mm,
                                       preferred_element_type=jnp.float32)
                ddxvec_s[l][:] += jnp.sum(dpre2 * _tile4(x2), axis=0,
                                          keepdims=True)
                dbias_s[l][:] += jnp.sum(dpre2, axis=0, keepdims=True)
                dx = dx2.reshape(sblk, bt, hp)
                if has_mask:
                    dx = dx * mask[l][:]
                dybuf[l - 1][:] = dx

        @pl.when(j == last)
        def _(l=l):
            dh0[l][:] = dh_s[l][:]
            dc0[l][:] = dc_s[l][:]

        @pl.when(jnp.logical_and(b == nb - 1, j == last))
        def _(l=l):
            du[l][:] = du_s[l][:]
            dv[l][:] = dv_s[l][:]
            ddvec[l][:] = ddvec_s[l][:]
            if l > 0:
                dux[l][:] = dux_s[l][:]
                dvx[l][:] = dvx_s[l][:]
                ddxvec[l][:] = ddxvec_s[l][:]
                dbias[l][:] = dbias_s[l][:]


def _mlbwd_call(dys, dhlasts, dclasts, layers, res, masks,
                *, interpret, bf16):
    """res: dict with per-layer lists ys (full, incl. last layer), cs, gates,
    hu, xu (l>=1), plus h0s/c0s — all padded.  Returns gradients for gi0 and
    every layer factor."""
    L = len(layers)
    t, bp, hp = dys.shape
    fourhp = 4 * hp
    has_mask = masks is not None
    # weights are VMEM-resident ~2x in the backward: constant operands +
    # f32 gradient accumulators (the grad outputs alias the accumulators)
    fixed = _weight_bytes(layers, bf16) + _weight_bytes(layers, False)
    tiles = _pick_tiles(t, bp, fourhp, live=18 * L, fixed=fixed)
    if tiles is None:
        raise ValueError(_VMEM_MSG.format(L=L))
    sblk, bt = tiles
    nb = -(-bp // bt)
    nt = t // sblk
    bpad = nb * bt

    pad3 = lambda a: _pad_to(a, (t, bpad, a.shape[-1]))
    pad2 = lambda a: _pad_to(a, (bpad, hp))
    dys = pad3(dys)
    dhlasts = [pad2(a) for a in dhlasts]
    dclasts = [pad2(a) for a in dclasts]
    hprev = [pad3(jnp.concatenate([res["h0s"][l][None], res["ys"][l][:-1]], 0))
             for l in range(L)]
    cprev = [pad3(jnp.concatenate([res["c0s"][l][None], res["cs"][l][:-1]], 0))
             for l in range(L)]
    gates = [pad3(a) for a in res["gates"]]
    hu = [pad3(a) for a in res["hu"]]
    cs = [pad3(a) for a in res["cs"]]
    xu = [pad3(a) for a in res["xu"]]
    ysrc = [pad3(res["ys"][l - 1]) for l in range(1, L)]
    if has_mask:
        masks = [pad3(m) for m in masks]

    def rstair(l):
        return lambda b, j: (jnp.clip(nt - 1 - j + (L - 1 - l), 0, nt - 1), b, 0)

    row = lambda b, j: (b, 0)
    const = lambda b, j: (0, 0)

    def blk(shape, idx):
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    cast_w = lambda w: w.astype(jnp.bfloat16) if bf16 else w

    operands, in_specs = [dys], [blk((sblk, bt, hp), rstair(L - 1))]
    for arrs in (dhlasts, dclasts):
        for a in arrs:
            operands.append(a)
            in_specs.append(blk((bt, hp), row))
    for key in ("u", "v", "dvec"):
        for lay in layers:
            w = cast_w(lay[key]) if key in ("u", "v") else lay[key]
            operands.append(w)
            in_specs.append(blk(w.shape, const))
    for key in ("ux", "vx", "dxvec"):
        for lay in layers[1:]:
            w = cast_w(lay[key]) if key in ("ux", "vx") else lay[key]
            operands.append(w)
            in_specs.append(blk(w.shape, const))
    for arrs in (gates, hu, hprev, cprev, cs):
        for l, a in enumerate(arrs):
            operands.append(a)
            in_specs.append(blk((sblk, bt, a.shape[-1]), rstair(l)))
    for l in range(1, L):
        operands.append(xu[l - 1])
        in_specs.append(blk((sblk, bt, xu[l - 1].shape[-1]), rstair(l)))
    for l in range(1, L):
        operands.append(ysrc[l - 1])
        in_specs.append(blk((sblk, bt, hp), rstair(l)))
    if has_mask:
        for l in range(1, L):
            operands.append(masks[l - 1])
            in_specs.append(blk((sblk, bt, hp), rstair(l)))

    out_specs = [blk((sblk, bt, fourhp), rstair(0))]
    out_shape = [jax.ShapeDtypeStruct((t, bpad, fourhp), jnp.float32)]
    for key in ("u", "v", "dvec"):
        for lay in layers:
            out_specs.append(blk(lay[key].shape, const))
            out_shape.append(jax.ShapeDtypeStruct(lay[key].shape, jnp.float32))
    for key in ("ux", "vx", "dxvec", "bias"):
        for lay in layers[1:]:
            out_specs.append(blk(lay[key].shape, const))
            out_shape.append(jax.ShapeDtypeStruct(lay[key].shape, jnp.float32))
    for _ in range(2 * L):
        out_specs.append(blk((bt, hp), row))
        out_shape.append(jax.ShapeDtypeStruct((bpad, hp), jnp.float32))

    scratch = [pltpu.VMEM((bt, hp), jnp.float32) for _ in range(2 * L)]
    for key in ("u", "v", "dvec"):
        scratch += [pltpu.VMEM(lay[key].shape, jnp.float32) for lay in layers]
    for key in ("ux", "vx", "dxvec", "bias"):
        scratch += [pltpu.VMEM(lay[key].shape, jnp.float32) for lay in layers[1:]]
    scratch += [pltpu.VMEM((sblk, bt, hp), jnp.float32) for _ in range(L - 1)]

    out = pl.pallas_call(
        functools.partial(_mlbwd_kernel, L=L, hp=hp, sblk=sblk, nt=nt,
                          bf16=bf16, has_mask=has_mask),
        grid=(nb, nt + L - 1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*operands)

    it = iter(out)
    dgi0 = next(it)[:, :bp]
    g = {"du": [next(it) for _ in range(L)],
         "dv": [next(it) for _ in range(L)],
         "ddvec": [next(it) for _ in range(L)],
         "dux": [next(it) for _ in range(L - 1)],
         "dvx": [next(it) for _ in range(L - 1)],
         "ddxvec": [next(it) for _ in range(L - 1)],
         "dbias": [next(it) for _ in range(L - 1)],
         "dh0": [next(it)[:bp] for _ in range(L)],
         "dc0": [next(it)[:bp] for _ in range(L)]}
    assert next(it, None) is None
    return dgi0, g


# ---------------------------------------------------------------------------
# public entry: padded, differentiable stack scan
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _stack_core(gi0, layers, h0s, c0s, masks, interpret, bf16):
    out = _mlfwd_call(gi0, layers, h0s, c0s, masks,
                      interpret=interpret, bf16=bf16, residuals=False)
    L = len(layers)
    return out[0], tuple(out[1:1 + L]), tuple(out[1 + L:1 + 2 * L])


def _stack_core_fwd(gi0, layers, h0s, c0s, masks, interpret, bf16):
    out = _mlfwd_call(gi0, layers, h0s, c0s, masks,
                      interpret=interpret, bf16=bf16, residuals=True)
    L = len(layers)
    it = iter(out)
    ys_last = next(it)
    hlast = tuple(next(it) for _ in range(L))
    clast = tuple(next(it) for _ in range(L))
    ys = [next(it) for _ in range(L - 1)] + [ys_last]
    res = {
        "ys": ys,
        "cs": [next(it) for _ in range(L)],
        "gates": [next(it) for _ in range(L)],
        "hu": [next(it) for _ in range(L)],
        "xu": [next(it) for _ in range(L - 1)],
        "h0s": list(h0s),
        "c0s": list(c0s),
    }
    assert next(it, None) is None
    return (ys_last, hlast, clast), (layers, res, masks)


def _stack_core_bwd(interpret, bf16, resids, cts):
    layers, res, masks = resids
    dys, dhlast, dclast = cts
    dgi0, g = _mlbwd_call(dys, list(dhlast), list(dclast), layers, res, masks,
                          interpret=interpret, bf16=bf16)
    dlayers = []
    for l in range(len(layers)):
        d = {"u": g["du"][l], "v": g["dv"][l], "dvec": g["ddvec"][l]}
        if l > 0:
            d.update(ux=g["dux"][l - 1], vx=g["dvx"][l - 1],
                     dxvec=g["ddxvec"][l - 1], bias=g["dbias"][l - 1])
        dlayers.append(d)
    dmasks = None if masks is None else jax.tree.map(jnp.zeros_like, masks)
    return dgi0, dlayers, g["dh0"], g["dc0"], dmasks


_stack_core.defvjp(_stack_core_fwd, _stack_core_bwd)


def lstm_stack_scan_fused(gi0, layers, h0s, c0s, masks=None, *,
                          interpret=False, precision="f32"):
    """Fused multi-layer wavefront LSTM stack scan.

    gi0: [T, B, 4h] — layer 0's hoisted input contribution (gate order
    i,f,g,o; biases and x-side diagonal terms folded in, `Cell.inp` output).
    layers: list of per-layer dicts —
      layers[0]:    {u: [h,r], v: [r,4h], dvec: [4h]}
      layers[l>=1]: + {ux: [h,rx], vx: [rx,4h], dxvec: [4h], bias: [4h]}
      (the `pipeline_units` mapping: gi_l = x@ux@vx + tile4(x)*dxvec + bias,
       recurrence = h@u@v + tile4(h)*dvec).
    h0s, c0s: per-layer [B, h].  masks: optional per-interface list (length
    L-1) of [T, B, h] pre-scaled dropout masks applied to layer l's input
    (i.e. to y_{l-1}) — inter-layer dropout inside the kernel.

    Returns (ys_last [T, B, h], hlast list of [B, h], clast list of [B, h]).
    Differentiable w.r.t. gi0, every layer factor, and the initial states.
    """
    t, b, fourh = gi0.shape
    h = fourh // 4
    L = len(layers)
    bp = _round_up(b, 8)
    hp = _round_up(h, 128)

    def relayout_gates(a, lead):
        # [lead, 4h] -> [leadp?, 4hp] keeping per-gate blocks aligned
        return _pad_to(a.reshape(-1, 4, h), (a.shape[0], 4, hp)).reshape(-1, 4 * hp)

    gi0p = _pad_to(gi0.reshape(t, b, 4, h), (t, bp, 4, hp)).reshape(t, bp, 4 * hp)
    h0p = [_pad_to(a, (bp, hp)) for a in h0s]
    c0p = [_pad_to(a, (bp, hp)) for a in c0s]
    maskp = None
    if masks is not None:
        maskp = [_pad_to(m, (t, bp, hp)) for m in masks]

    padded = []
    for l, lay in enumerate(layers):
        r = lay["u"].shape[1]
        rp = _round_up(r, 128)
        d = {
            "u": _pad_to(lay["u"], (hp, rp)),
            "v": relayout_gates(_pad_to(lay["v"], (rp, 4 * h)), rp),
            "dvec": _pad_to(lay["dvec"].reshape(4, h), (4, hp)).reshape(1, 4 * hp),
        }
        if l > 0:
            rx = lay["ux"].shape[1]
            rxp = _round_up(rx, 128)
            d.update(
                ux=_pad_to(lay["ux"], (hp, rxp)),
                vx=relayout_gates(_pad_to(lay["vx"], (rxp, 4 * h)), rxp),
                dxvec=_pad_to(lay["dxvec"].reshape(4, h), (4, hp)).reshape(1, 4 * hp),
                bias=_pad_to(lay["bias"].reshape(4, h), (4, hp)).reshape(1, 4 * hp),
            )
        padded.append(d)

    bf16 = precision == "bf16"
    ys_last, hlast, clast = _stack_core(gi0p, padded, h0p, c0p, maskp,
                                        interpret, bf16)
    return (ys_last[:, :b, :h],
            [a[:b, :h] for a in hlast],
            [a[:b, :h] for a in clast])


def stack_groups(layers):
    """Partition the stack into maximal contiguous groups of layers whose
    factors (+ gradient accumulators) fit VMEM together (`stack_fits`).

    Lifts the all-factors-resident design's depth bound: a 4x650 w300/u300
    stack (which does not compile as one resident kernel on v5e) runs as two
    chained 2-layer wavefront kernels — each group's serial chain is
    T/sblk + group_size - 1 blocks instead of group_size * T/sblk, and
    inter-group handoff is one [T, B, h] array.  Returns a list of
    (start, end) half-open index pairs; singleton groups run the per-layer
    fused kernel (with its x-fused input projection)."""
    groups, i, n = [], 0, len(layers)
    while i < n:
        j = n
        while j - i >= 2 and not stack_fits(layers[i:j]):
            j -= 1
        groups.append((i, max(j, i + 1)))
        i = max(j, i + 1)
    return groups


def _group_layers(layers, start, end):
    """Slice group layers; the group's first layer consumes gi0, so its
    x-side factors are dropped (they are applied by the caller's `inp` or by
    the per-layer kernel of the previous group's boundary)."""
    out = []
    for idx in range(start, end):
        lay = layers[idx]
        if idx == start:
            lay = {k: lay[k] for k in ("u", "v", "dvec")}
        out.append(lay)
    return out


def run_stack_grouped(cells, preps, xs, states, masks=None, *,
                      interpret=False, precision="f32"):
    """Execute a uniform LSTM-family stack through VMEM-resident wavefront
    groups (`stack_groups`), falling back to the per-layer fused kernel for
    singleton groups and non-uniform stacks.

    xs: time-major [T, B, n]; states: per-layer (h0, c0); masks: optional
    per-interface (length L-1) pre-scaled dropout masks — within-group
    interfaces run inside the kernel, group-boundary masks are applied to
    the handoff array.  -> (ys [T, B, h], new_states list)."""
    from vmlmf_tpu.nn.recurrence import scan_layer

    layers = stack_units(cells, preps)
    finals = [None] * len(cells)
    x = xs
    if layers is None:
        from vmlmf_tpu.ops.pipeline import warn_fallback

        warn_fallback(cells)
        for i, (cell, prep) in enumerate(zip(cells, preps)):
            x, finals[i] = scan_layer(cell, prep, x, states[i],
                                      backend="pallas", precision=precision)
            if masks is not None and i < len(cells) - 1:
                x = x * masks[i]
        return x, finals
    for start, end in stack_groups(layers):
        if end - start == 1:
            x, finals[start] = scan_layer(
                cells[start], preps[start], x, states[start],
                backend="pallas", precision=precision)
        else:
            gi0 = cells[start].inp(preps[start], x)
            h0s = [states[i][0] for i in range(start, end)]
            c0s = [states[i][1] for i in range(start, end)]
            gmasks = None
            if masks is not None and end - start > 1:
                gmasks = [masks[i] for i in range(start, end - 1)]
            x, hl, cl = lstm_stack_scan_fused(
                gi0, _group_layers(layers, start, end), h0s, c0s, gmasks,
                interpret=interpret, precision=precision)
            for i in range(start, end):
                finals[i] = (hl[i - start], cl[i - start])
        if masks is not None and end - 1 < len(cells) - 1:
            x = x * masks[end - 1]  # group-boundary inter-layer dropout
    return x, finals


def stack_units(cells, preps):
    """Map `pipeline_units` dicts onto the layer-dict format of
    `lstm_stack_scan_fused`.  Returns None if any cell can't provide units
    (caller falls back to the sequential schedule)."""
    if len(cells) < 2:
        return None
    h = cells[0].hidden_size
    for c in cells[1:]:
        if c.hidden_size != h or c.input_size != h:
            return None
    layers = []
    for l, (cell, prep) in enumerate(zip(cells, preps)):
        if getattr(cell, "num_gates", None) != 4:
            return None
        fn = getattr(cell, "pipeline_units", None)
        if fn is None:
            return None
        un = fn(prep)
        if un is None:
            return None
        d = {"u": un["u_h"], "v": un["v_h"], "dvec": un["d_h"].reshape(-1)}
        if l > 0:
            d.update(ux=un["u_x"], vx=un["v_x"],
                     dxvec=un["d_x"].reshape(-1), bias=un["bias"])
        layers.append(d)
    return layers
