"""Fused Pallas GRU scan: the whole time loop in one kernel (+ custom VJP).

Covers `vmlmf_tpu.cells.gru.GRUCell` — the legacy compressed-GRU semantics
(`/root/reference/rnn_compression_factorization/src/module/compressed_gru.py:22-117`):
gates (r, z) from ``h @ U_rz``, candidate from ``(r ⊙ h) @ U_n`` (reset applied
*before* the matmul), with the low-rank variant sharing one factor
``U_f [h, rank]`` across both recurrent projections:

    hu   = h @ U_f                       (low-rank) or   rz = h @ U_rz (dense)
    rz   = hu @ P_rz                     P_rz [rank, 2h]
    r, z = σ(gi_rz + rz)
    rhu  = (r ⊙ h) @ U_f                 or   nn = (r ⊙ h) @ U_n
    n    = tanh(gi_n + rhu @ P_n)        P_n [rank, h]
    h'   = z ⊙ h + (1 − z) ⊙ n

Same execution design as `pallas_scan`: factors + carry resident in VMEM,
per-step gate inputs streamed with double buffering, (time-block × batch-tile)
grid chosen against the VMEM stack model, reverse-grid backward kernel that
accumulates parameter grads in VMEM.  Two residual policies, as in
`pallas_scan`: in gi mode the forward saves the gate activations (r, z, n)
and the rank-space products h@U_f, (r⊙h)@U_f so the backward performs zero
recompute matmuls and never re-streams gi; in x mode (default) the backward
RECOMPUTES them from the streamed x and saved h_prev with batched
per-time-block matmuls — h_prev is a residual, so the recompute is off the
serial chain, and the [T,B,3h] gates + 2×[T,B,r] rank streams never touch
HBM at all (saved is the round-5 DEFAULT — measured faster once the
lse-loss fix removed competing HBM waste; VMLMF_PALLAS_SAVED_GATES=0
selects the recompute policy).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vmlmf_tpu.ops.pallas_scan import (
    _compiler_params,
    _pad_to,
    _pick_tiles,
    _require_tiles,
    _round_up,
    _weights_nbytes,
)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, hp, fp, lowrank, xin, x_lowrank, sblk, residuals, post,
                save_gates):
    it = iter(refs)
    if xin:
        x_ref = next(it)
        ux_ref = next(it)
        vx_ref = next(it) if x_lowrank else None
        bias_ref = next(it)
    else:
        gi_ref = next(it)
    uf_ref = next(it)
    prz_ref = next(it)
    pn_ref = next(it)
    h0_ref = next(it)
    ys_ref = next(it)
    gates_ref = hu_ref = rhu_ref = recn_ref = None
    if residuals and save_gates:
        gates_ref = next(it)
        if lowrank:
            hu_ref = next(it)
            rhu_ref = next(it)
        elif post:
            recn_ref = next(it)
    h_s = next(it)
    assert next(it, None) is None
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        h_s[:] = h0_ref[:]

    if xin:
        # batched in-kernel input projection for the whole time block
        xblk = x_ref[:]                                    # [sblk, bt, fp]
        bt = xblk.shape[1]
        x2 = xblk.reshape(sblk * bt, fp)
        if x_lowrank:
            xu2 = jnp.dot(x2, ux_ref[:], preferred_element_type=jnp.float32)
            gix = jnp.dot(xu2, vx_ref[:], preferred_element_type=jnp.float32)
        else:
            gix = jnp.dot(x2, ux_ref[:], preferred_element_type=jnp.float32)
        gi_blk = (gix + bias_ref[:]).reshape(sblk, bt, 3 * hp)

    h = h_s[:]
    for st in range(sblk):
        gi_t = gi_blk[st] if xin else gi_ref[st]
        if lowrank:
            hu = jnp.dot(h, uf_ref[:], preferred_element_type=jnp.float32)
            if hu_ref is not None:
                hu_ref[st] = hu
            rz = jnp.dot(hu, prz_ref[:], preferred_element_type=jnp.float32)
        else:
            rz = jnp.dot(h, prz_ref[:], preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(gi_t[:, :hp] + rz[:, :hp])
        z = jax.nn.sigmoid(gi_t[:, hp:2 * hp] + rz[:, hp:])
        if post:
            # group-GRU form: reset gate scales the candidate matmul *output*
            # (`compressed_gru.py:245`) — one h-matmul per step, no (r·h) pass
            recn = jnp.dot(h, pn_ref[:], preferred_element_type=jnp.float32)
            if recn_ref is not None:
                recn_ref[st] = recn
            n = jnp.tanh(gi_t[:, 2 * hp:] + r * recn)
        else:
            rh = r * h
            if lowrank:
                rhu = jnp.dot(rh, uf_ref[:], preferred_element_type=jnp.float32)
                if rhu_ref is not None:
                    rhu_ref[st] = rhu
                nn = jnp.dot(rhu, pn_ref[:], preferred_element_type=jnp.float32)
            else:
                nn = jnp.dot(rh, pn_ref[:], preferred_element_type=jnp.float32)
            n = jnp.tanh(gi_t[:, 2 * hp:] + nn)
        if gates_ref is not None:
            gates_ref[st] = jnp.concatenate([r, z, n], axis=-1)
        h = z * h + (1.0 - z) * n
        ys_ref[st] = h
    h_s[:] = h


def _fwd_call(stream, xw, uf, prz, pn, h0, *, lowrank, interpret, residuals,
              post=False, save_gates=True):
    """stream: gi [T,Bp,3hp] (xw None) or x [T,Bp,Fp] with
    xw = (ux, vx|None, bias) padded x-side weights.  save_gates=False
    (x mode only): write no residuals beyond ys — the backward recomputes
    gates/hu/rhu/recn batched."""
    xin = xw is not None
    if xin:
        t, bp, fp = stream.shape
        ux, vx, bias = xw
        x_lowrank = vx is not None
        threehp = bias.shape[-1]
    else:
        t, bp, threehp = stream.shape
        fp = threehp
        ux = vx = bias = None
        x_lowrank = False
    hp = threehp // 3
    live = (10 if residuals and save_gates else 8) + (3 if xin else 0)
    fixed = _weights_nbytes(uf, prz, pn, ux, vx, bias)
    sblk, bt = _require_tiles(
        _pick_tiles(t, bp, threehp, live=live, fixed=fixed), "GRU forward")
    nb = bp // bt if bp % bt == 0 else -(-bp // bt)
    stream = _pad_to(stream, (t, nb * bt, fp))
    h0 = _pad_to(h0, (nb * bt, hp))

    step = lambda b, k: (k, b, 0)
    row = lambda b, k: (b, 0)
    const = lambda b, k: (0, 0)

    def blk(shape, idx):
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    operands = [stream]
    in_specs = [blk((sblk, bt, fp), step)]
    if xin:
        for w in (ux, vx, bias):
            if w is not None:
                operands.append(w)
                in_specs.append(blk(w.shape, const))
    operands += [uf, prz, pn, h0]
    in_specs += [
        blk(uf.shape, const),
        blk(prz.shape, const),
        blk(pn.shape, const),
        blk((bt, hp), row),
    ]
    out_specs = [blk((sblk, bt, hp), step)]
    out_shape = [jax.ShapeDtypeStruct((t, nb * bt, hp), jnp.float32)]
    if residuals and save_gates:
        out_specs.append(blk((sblk, bt, threehp), step))
        out_shape.append(jax.ShapeDtypeStruct((t, nb * bt, threehp), jnp.float32))
        if lowrank:
            rp = uf.shape[1]
            for _ in range(2):  # hu, rhu
                out_specs.append(blk((sblk, bt, rp), step))
                out_shape.append(
                    jax.ShapeDtypeStruct((t, nb * bt, rp), jnp.float32))
        elif post:
            out_specs.append(  # rec_n (pre-reset candidate recurrent term)
                blk((sblk, bt, hp), step))
            out_shape.append(jax.ShapeDtypeStruct((t, nb * bt, hp), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, hp=hp, fp=fp, lowrank=lowrank,
                          xin=xin, x_lowrank=x_lowrank, sblk=sblk,
                          residuals=residuals, post=post,
                          save_gates=save_gates),
        grid=(nb, t // sblk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bt, hp), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*operands)
    # ys [, gates (r,z,n) [, hu, rhu | recn]]
    return tuple(o[:, :bp] for o in out)


# ---------------------------------------------------------------------------
# backward (reverse grid)
# ---------------------------------------------------------------------------

def _bwd_kernel(*refs, hp, fp, lowrank, xin, x_lowrank, sblk, post,
                save_gates):
    it = iter(refs)
    gates_ref = next(it) if save_gates else None
    hu_ref = rhu_ref = recn_ref = bias_ref = None
    if save_gates:
        if lowrank:
            hu_ref = next(it)
            rhu_ref = next(it)
        elif post:
            recn_ref = next(it)
    if xin:
        x_ref = next(it)
        ux_ref = next(it)
        vx_ref = next(it) if x_lowrank else None
        if not save_gates:
            bias_ref = next(it)
    uf_ref = next(it)
    prz_ref = next(it)
    pn_ref = next(it)
    hprev_ref = next(it)
    dys_ref = next(it)
    dstream_ref = next(it)  # dgi (gi mode) or dx (x mode)
    duf_ref = next(it)
    dprz_ref = next(it)
    dpn_ref = next(it)
    if xin:
        dux_ref = next(it)
        dvx_ref = next(it) if x_lowrank else None
        dbias_ref = next(it)
    dh0_ref = next(it)
    dh_s = next(it)
    duf_s = next(it)
    dprz_s = next(it)
    dpn_s = next(it)
    if xin:
        dux_s = next(it)
        dvx_s = next(it) if x_lowrank else None
        dbias_s = next(it)
    assert next(it, None) is None
    b = pl.program_id(0)
    k = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)

    @pl.when(jnp.logical_and(b == 0, k == 0))
    def _():
        duf_s[:] = jnp.zeros_like(duf_s)
        dprz_s[:] = jnp.zeros_like(dprz_s)
        dpn_s[:] = jnp.zeros_like(dpn_s)
        if xin:
            dux_s[:] = jnp.zeros_like(dux_s)
            if dvx_s is not None:
                dvx_s[:] = jnp.zeros_like(dvx_s)
            dbias_s[:] = jnp.zeros_like(dbias_s)

    @pl.when(k == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)

    dh_carry = dh_s[:]
    duf_acc = dprz_acc = dpn_acc = None
    dpre_blk = [None] * sblk

    gates_blk = hu_blk = rhu_blk = recn_blk = xu2_pre = None
    if not save_gates:
        # batched recompute of the whole block's activations — identical
        # op/order to the forward; inputs are residuals, so this never
        # lengthens the serial dh chain.
        btk = dys_ref.shape[1]
        x2r = x_ref[:].reshape(sblk * btk, fp)
        h2r = hprev_ref[:].reshape(sblk * btk, hp)
        if x_lowrank:
            xu2_pre = jnp.dot(x2r, ux_ref[:], preferred_element_type=jnp.float32)
            gi2 = jnp.dot(xu2_pre, vx_ref[:], preferred_element_type=jnp.float32)
        else:
            gi2 = jnp.dot(x2r, ux_ref[:], preferred_element_type=jnp.float32)
        gi2 = gi2 + bias_ref[:]
        if lowrank:
            hu2 = jnp.dot(h2r, uf_ref[:], preferred_element_type=jnp.float32)
            rz2 = jnp.dot(hu2, prz_ref[:], preferred_element_type=jnp.float32)
            hu_blk = hu2.reshape(sblk, btk, hu2.shape[-1])
        else:
            rz2 = jnp.dot(h2r, prz_ref[:], preferred_element_type=jnp.float32)
        r2 = jax.nn.sigmoid(gi2[:, :hp] + rz2[:, :hp])
        z2 = jax.nn.sigmoid(gi2[:, hp:2 * hp] + rz2[:, hp:])
        if post:
            recn2 = jnp.dot(h2r, pn_ref[:], preferred_element_type=jnp.float32)
            n2 = jnp.tanh(gi2[:, 2 * hp:] + r2 * recn2)
            recn_blk = recn2.reshape(sblk, btk, hp)
        else:
            rh2 = r2 * h2r
            if lowrank:
                rhu2 = jnp.dot(rh2, uf_ref[:], preferred_element_type=jnp.float32)
                nn2 = jnp.dot(rhu2, pn_ref[:], preferred_element_type=jnp.float32)
                rhu_blk = rhu2.reshape(sblk, btk, rhu2.shape[-1])
            else:
                nn2 = jnp.dot(rh2, pn_ref[:], preferred_element_type=jnp.float32)
            n2 = jnp.tanh(gi2[:, 2 * hp:] + nn2)
        gates_blk = jnp.concatenate([r2, z2, n2],
                                    axis=-1).reshape(sblk, btk, 3 * hp)

    for st in range(sblk - 1, -1, -1):
        h_prev = hprev_ref[st]

        # forward activations: saved (zero recompute) or batch-recomputed
        gates = gates_ref[st] if save_gates else gates_blk[st]
        r = gates[:, :hp]
        z = gates[:, hp:2 * hp]
        n = gates[:, 2 * hp:]
        rh = r * h_prev

        dh = dh_carry + dys_ref[st]
        dz = dh * (h_prev - n)
        dn = dh * (1.0 - z)
        dh_prev = dh * z

        dn_pre = dn * (1.0 - n * n)                      # d gi_n
        if post:
            # n_pre = gi_n + r · rec_n, rec_n = h_prev @ P_n
            recn = recn_ref[st] if save_gates else recn_blk[st]
            drecn = dn_pre * r
            dr = dn_pre * recn
            dpn_t = jnp.dot(h_prev.T, drecn, preferred_element_type=jnp.float32)
            dh_prev = dh_prev + jnp.dot(drecn, pn_ref[:].T,
                                        preferred_element_type=jnp.float32)
        elif lowrank:
            drhu = jnp.dot(dn_pre, pn_ref[:].T, preferred_element_type=jnp.float32)
            rhu_st = rhu_ref[st] if save_gates else rhu_blk[st]
            dpn_t = jnp.dot(rhu_st.T, dn_pre, preferred_element_type=jnp.float32)
            drh = jnp.dot(drhu, uf_ref[:].T, preferred_element_type=jnp.float32)
            duf_t = jnp.dot(rh.T, drhu, preferred_element_type=jnp.float32)
        else:
            drh = jnp.dot(dn_pre, pn_ref[:].T, preferred_element_type=jnp.float32)
            dpn_t = jnp.dot(rh.T, dn_pre, preferred_element_type=jnp.float32)
        if not post:
            dr = drh * h_prev
            dh_prev = dh_prev + drh * r

        dr_pre = dr * r * (1.0 - r)                      # d gi_r
        dz_pre = dz * z * (1.0 - z)                      # d gi_z
        drz = jnp.concatenate([dr_pre, dz_pre], axis=-1)
        if lowrank:
            dhu = jnp.dot(drz, prz_ref[:].T, preferred_element_type=jnp.float32)
            hu_st = hu_ref[st] if save_gates else hu_blk[st]
            dprz_t = jnp.dot(hu_st.T, drz, preferred_element_type=jnp.float32)
            dh_prev = dh_prev + jnp.dot(dhu, uf_ref[:].T,
                                        preferred_element_type=jnp.float32)
            duf_t = duf_t + jnp.dot(h_prev.T, dhu, preferred_element_type=jnp.float32)
            duf_acc = duf_t if duf_acc is None else duf_acc + duf_t
        else:
            dprz_t = jnp.dot(h_prev.T, drz, preferred_element_type=jnp.float32)
            dh_prev = dh_prev + jnp.dot(drz, prz_ref[:].T,
                                        preferred_element_type=jnp.float32)

        dpre = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
        if xin:
            dpre_blk[st] = dpre
        else:
            dstream_ref[st] = dpre
        dprz_acc = dprz_t if dprz_acc is None else dprz_acc + dprz_t
        dpn_acc = dpn_t if dpn_acc is None else dpn_acc + dpn_t
        dh_carry = dh_prev

    if xin:
        # batched x-side gradients for the whole time block
        bt = dpre_blk[0].shape[0]
        dpre2 = jnp.stack(dpre_blk).reshape(sblk * bt, 3 * hp)
        x2 = x_ref[:].reshape(sblk * bt, fp)
        if x_lowrank:
            dxu = jnp.dot(dpre2, vx_ref[:].T, preferred_element_type=jnp.float32)
            dx2 = jnp.dot(dxu, ux_ref[:].T, preferred_element_type=jnp.float32)
            # xu already computed by the recompute pass; else one batched op
            xu2 = xu2_pre if xu2_pre is not None else jnp.dot(
                x2, ux_ref[:], preferred_element_type=jnp.float32)
            dux_s[:] += jnp.dot(x2.T, dxu, preferred_element_type=jnp.float32)
            dvx_s[:] += jnp.dot(xu2.T, dpre2, preferred_element_type=jnp.float32)
        else:
            dx2 = jnp.dot(dpre2, ux_ref[:].T, preferred_element_type=jnp.float32)
            dux_s[:] += jnp.dot(x2.T, dpre2, preferred_element_type=jnp.float32)
        dbias_s[:] += jnp.sum(dpre2, axis=0, keepdims=True)
        dstream_ref[:] = dx2.reshape(sblk, bt, fp)

    if duf_acc is not None:
        duf_s[:] += duf_acc
    dprz_s[:] += dprz_acc
    dpn_s[:] += dpn_acc
    dh_s[:] = dh_carry

    @pl.when(k == nt - 1)
    def _():
        dh0_ref[:] = dh_s[:]

    @pl.when(jnp.logical_and(b == nb - 1, k == nt - 1))
    def _():
        duf_ref[:] = duf_s[:]
        dprz_ref[:] = dprz_s[:]
        dpn_ref[:] = dpn_s[:]
        if xin:
            dux_ref[:] = dux_s[:]
            if dvx_ref is not None:
                dvx_ref[:] = dvx_s[:]
            dbias_ref[:] = dbias_s[:]


def _bwd_call(gates, hu, rhu, xres, uf, prz, pn, hprev, dys, *, lowrank,
              interpret, post=False, recn=None, save_gates=True):
    """xres: None (gi mode) or (x, ux, vx|None, bias|None) padded x-side
    residuals.  save_gates=False (x mode only): gates/hu/rhu/recn are None
    and get recomputed inside the kernel (bias required)."""
    t, bp, hp = dys.shape
    threehp = 3 * hp
    xin = xres is not None
    if xin:
        x, ux, vx, bias = xres
        x_lowrank = vx is not None
        fp = x.shape[-1]
    else:
        x = ux = vx = bias = None
        x_lowrank = False
        fp = threehp
    live = 16 + (4 if xin else 0) + (0 if save_gates else 8)
    fixed = 2 * _weights_nbytes(uf, prz, pn, ux, vx)
    sblk, bt = _require_tiles(
        _pick_tiles(t, bp, threehp, live=live, fixed=fixed), "GRU backward")
    nb = bp // bt if bp % bt == 0 else -(-bp // bt)
    bpad = nb * bt
    if save_gates:
        gates = _pad_to(gates, (t, bpad, threehp))
    hprev = _pad_to(hprev, (t, bpad, hp))
    dys = _pad_to(dys, (t, bpad, hp))

    ntb = t // sblk
    rev = lambda b, k: (ntb - 1 - k, b, 0)
    row = lambda b, k: (b, 0)
    const = lambda b, k: (0, 0)

    def blk(shape, idx):
        return pl.BlockSpec(shape, idx, memory_space=pltpu.VMEM)

    in_specs = []
    operands = []
    if save_gates:
        in_specs.append(blk((sblk, bt, threehp), rev))             # gates
        operands.append(gates)
        if lowrank:
            rp = hu.shape[-1]
            hu = _pad_to(hu, (t, bpad, rp))
            rhu = _pad_to(rhu, (t, bpad, rp))
            in_specs += [
                blk((sblk, bt, rp), rev),   # h@Uf
                blk((sblk, bt, rp), rev),   # (r h)@Uf
            ]
            operands += [hu, rhu]
        elif post:
            recn = _pad_to(recn, (t, bpad, hp))
            in_specs += [blk((sblk, bt, hp), rev)]                 # rec_n
            operands += [recn]
    if xin:
        x = _pad_to(x, (t, bpad, fp))
        in_specs.append(blk((sblk, bt, fp), rev))                  # x
        operands.append(x)
        xws = (ux, vx) if save_gates else (ux, vx, bias)
        for w in xws:
            if w is not None:
                in_specs.append(blk(w.shape, const))
                operands.append(w)
    in_specs += [
        blk(uf.shape, const),
        blk(prz.shape, const),
        blk(pn.shape, const),
        blk((sblk, bt, hp), rev),
        blk((sblk, bt, hp), rev),
    ]
    operands += [uf, prz, pn, hprev, dys]

    f32 = jnp.float32
    out_specs = [
        blk((sblk, bt, fp), rev),      # dgi or dx
        blk(uf.shape, const),
        blk(prz.shape, const),
        blk(pn.shape, const),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t, bpad, fp), f32),
        jax.ShapeDtypeStruct(uf.shape, f32),
        jax.ShapeDtypeStruct(prz.shape, f32),
        jax.ShapeDtypeStruct(pn.shape, f32),
    ]
    scratch = [
        pltpu.VMEM((bt, hp), f32),      # dh carry
        pltpu.VMEM(uf.shape, f32),      # dU_f accumulator
        pltpu.VMEM(prz.shape, f32),     # dP_rz accumulator
        pltpu.VMEM(pn.shape, f32),      # dP_n accumulator
    ]
    if xin:
        xg_shapes = [ux.shape]                             # dux
        if x_lowrank:
            xg_shapes.append(vx.shape)                     # dvx
        xg_shapes.append((1, threehp))                     # dbias
        for s in xg_shapes:
            out_specs.append(blk(s, const))
            out_shape.append(jax.ShapeDtypeStruct(s, f32))
            scratch.append(pltpu.VMEM(s, f32))
    out_specs.append(blk((bt, hp), row))
    out_shape.append(jax.ShapeDtypeStruct((bpad, hp), f32))

    out = pl.pallas_call(
        functools.partial(_bwd_kernel, hp=hp, fp=fp, lowrank=lowrank,
                          xin=xin, x_lowrank=x_lowrank, sblk=sblk, post=post,
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
    duf, dprz, dpn = next(it), next(it), next(it)
    if xin:
        dux = next(it)
        dvx = next(it) if x_lowrank else None
        dbias = next(it)
    else:
        dux = dvx = dbias = None
    dh0 = next(it)[:bp]
    assert next(it, None) is None
    return dstream, duf, dprz, dpn, (dux, dvx, dbias), dh0


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _scan_core(gi, uf, prz, pn, h0, lowrank, interpret, post):
    # no-grad primal: residual-free forward (no gates/hu/rhu HBM traffic)
    (ys,) = _fwd_call(gi, None, uf, prz, pn, h0, lowrank=lowrank,
                      interpret=interpret, residuals=False, post=post)
    return ys


def _scan_core_fwd(gi, uf, prz, pn, h0, lowrank, interpret, post):
    out = _fwd_call(gi, None, uf, prz, pn, h0, lowrank=lowrank,
                    interpret=interpret, residuals=True, post=post)
    ys, gates = out[:2]
    hu = rhu = recn = None
    if lowrank:
        hu, rhu = out[2], out[3]
    elif post:
        recn = out[2]
    # gi is not a residual: dgi is the concatenated gate pre-grads and the
    # backward reconstructs everything from the saved activations.
    return ys, (uf, prz, pn, h0, ys, gates, hu, rhu, recn)


def _scan_core_bwd(lowrank, interpret, post, res, dys):
    uf, prz, pn, h0, ys, gates, hu, rhu, recn = res
    hprev = jnp.concatenate([h0[None], ys[:-1]], axis=0)
    dgi, duf, dprz, dpn, _, dh0 = _bwd_call(
        gates, hu, rhu, None, uf, prz, pn, hprev, dys,
        lowrank=lowrank, interpret=interpret, post=post, recn=recn)
    return dgi, duf, dprz, dpn, dh0


_scan_core.defvjp(_scan_core_fwd, _scan_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _scan_core_xin(x, ux, vx, bias, uf, prz, pn, h0,
                   lowrank, x_lowrank, interpret, post, save_gates):
    vxx = vx if x_lowrank else None
    (ys,) = _fwd_call(x, (ux, vxx, bias), uf, prz, pn, h0, lowrank=lowrank,
                      interpret=interpret, residuals=False, post=post)
    return ys


def _scan_core_xin_fwd(x, ux, vx, bias, uf, prz, pn, h0,
                       lowrank, x_lowrank, interpret, post, save_gates):
    vxx = vx if x_lowrank else None
    out = _fwd_call(x, (ux, vxx, bias), uf, prz, pn, h0, lowrank=lowrank,
                    interpret=interpret, residuals=True, post=post,
                    save_gates=save_gates)
    ys = out[0]
    gates = hu = rhu = recn = None
    if save_gates:
        gates = out[1]
        if lowrank:
            hu, rhu = out[2], out[3]
        elif post:
            recn = out[2]
    return ys, (x, ux, vx, bias, uf, prz, pn, h0, ys, gates, hu, rhu, recn)


def _scan_core_xin_bwd(lowrank, x_lowrank, interpret, post, save_gates,
                       res, dys):
    x, ux, vx, bias, uf, prz, pn, h0, ys, gates, hu, rhu, recn = res
    hprev = jnp.concatenate([h0[None], ys[:-1]], axis=0)
    vxx = vx if x_lowrank else None
    dx, duf, dprz, dpn, (dux, dvx, dbias), dh0 = _bwd_call(
        gates, hu, rhu, (x, ux, vxx, bias), uf, prz, pn, hprev, dys,
        lowrank=lowrank, interpret=interpret, post=post, recn=recn,
        save_gates=save_gates)
    if dvx is None:
        dvx = jnp.zeros_like(vx)
    return dx, dux, dvx, dbias, duf, dprz, dpn, dh0


_scan_core_xin.defvjp(_scan_core_xin_fwd, _scan_core_xin_bwd)


def gru_scan_fused(gi, uf, prz, pn, h0, *, mode="pre", interpret=False):
    """Fused GRU scan.  gi: [T, B, 3h] input contributions in (r, z, n) gate
    order; low-rank: uf [h, rank], prz [rank, 2h], pn [rank, h]; dense:
    uf=None, prz [h, 2h], pn [h, h].  h0: [B, h].  Returns ys [T, B, h].

    mode="pre" (vanilla/shared-low-rank GRU): candidate term is
    ``(r ⊙ h) @ U_n`` — reset applied before the matmul.
    mode="post" (group-GRU semantics, `compressed_gru.py:245`): candidate term
    is ``r ⊙ (h @ U_n)`` — reset scales the matmul output; dense-only (the
    group factors are materialized to [h, 3h] outside the scan).

    Zero padding is exact: padded h rows/cols start at 0 and stay 0 — padded
    r,z,n columns see zero gi and zero recurrent input, so σ(0)=0.5 gates mix
    0-valued h and tanh(0)=0 candidates, keeping pads at 0.
    """
    t, b, threeh = gi.shape
    h = threeh // 3
    lowrank = uf is not None
    post = mode == "post"
    if post and lowrank:
        raise ValueError("mode='post' is dense-only (uf must be None)")
    bp = _round_up(b, 8)
    hp = _round_up(h, 128)

    gi3 = _pad_to(gi.reshape(t, b, 3, h), (t, bp, 3, hp)).reshape(t, bp, 3 * hp)
    h0p = _pad_to(h0, (bp, hp))
    if lowrank:
        r = uf.shape[1]
        rp = _round_up(r, 128)
        ufp = _pad_to(uf, (hp, rp))
        przp = _pad_to(prz.reshape(r, 2, h), (rp, 2, hp)).reshape(rp, 2 * hp)
        pnp = _pad_to(pn, (rp, hp))
    else:
        ufp = jnp.zeros((8, 128), jnp.float32)  # unused placeholder
        przp = _pad_to(prz.reshape(h, 2, h), (hp, 2, hp)).reshape(hp, 2 * hp)
        pnp = _pad_to(pn, (hp, hp))

    ys = _scan_core(gi3, ufp, przp, pnp, h0p, lowrank, interpret, post)
    return ys[:, :b, :h]


def gru_scan_fused_xin(xs, ux, vx, bias, uf, prz, pn, h0, *, mode="pre",
                       interpret=False):
    """Fused GRU scan with the input projection INSIDE the kernel.

    xs: [T, B, F] raw inputs; x side (VMEM-resident): ux [F, rx] with
    vx [rx, 3h] (low-rank) or ux [F, 3h] with vx=None (dense), bias [3h] —
    gate order (r, z, n).  h side as `gru_scan_fused`.  Returns ys [T, B, h].

    Streams x (F wide) instead of gi (3h wide) and never materializes gi/dgi
    in HBM — the same traffic fix as the LSTM kernel's xin mode (measured 2x
    on the HAR demo there); the GRU x-path has no elementwise term, so only
    the projection + bias move into the kernel.

    The VMLMF_PALLAS_SAVED_GATES residual policy is captured at TRACE time:
    flipping the env var after a step is jitted has no effect (the jit cache
    keeps the traced policy) — re-jit to change it.
    """
    t, b, f = xs.shape
    threeh = bias.shape[-1]
    h = threeh // 3
    lowrank = uf is not None
    x_lowrank = vx is not None
    post = mode == "post"
    if post and lowrank:
        raise ValueError("mode='post' is dense-only (uf must be None)")
    bp = _round_up(b, 8)
    hp = _round_up(h, 128)
    fp = _round_up(f, 128)

    xsp = _pad_to(xs, (t, bp, fp))
    if x_lowrank:
        rx = ux.shape[1]
        rxp = _round_up(rx, 128)
        uxp = _pad_to(ux, (fp, rxp))
        vxp = _pad_to(vx.reshape(rx, 3, h), (rxp, 3, hp)).reshape(rxp, 3 * hp)
    else:
        uxp = _pad_to(ux.reshape(f, 3, h), (fp, 3, hp)).reshape(fp, 3 * hp)
        vxp = jnp.zeros((8, 128), jnp.float32)  # unused placeholder
    biasp = _pad_to(bias.reshape(3, h), (3, hp)).reshape(1, 3 * hp)

    h0p = _pad_to(h0, (bp, hp))
    if lowrank:
        r = uf.shape[1]
        rp = _round_up(r, 128)
        ufp = _pad_to(uf, (hp, rp))
        przp = _pad_to(prz.reshape(r, 2, h), (rp, 2, hp)).reshape(rp, 2 * hp)
        pnp = _pad_to(pn, (rp, hp))
    else:
        ufp = jnp.zeros((8, 128), jnp.float32)  # unused placeholder
        przp = _pad_to(prz.reshape(h, 2, h), (hp, 2, hp)).reshape(hp, 2 * hp)
        pnp = _pad_to(pn, (hp, hp))

    save_gates = os.environ.get("VMLMF_PALLAS_SAVED_GATES", "1") != "0"
    ys = _scan_core_xin(xsp, uxp, vxp, biasp, ufp, przp, pnp, h0p,
                        lowrank, x_lowrank, interpret, post, save_gates)
    return ys[:, :b, :h]
