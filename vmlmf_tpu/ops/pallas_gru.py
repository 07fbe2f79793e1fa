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
accumulates parameter grads in VMEM.  Like the LSTM kernel, the forward saves
the gate activations (r, z, n) and the rank-space products h@U_f, (r⊙h)@U_f,
so the backward performs zero recompute matmuls (down from four per step) and
never re-streams gi.
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


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(gi_ref, uf_ref, prz_ref, pn_ref, h0_ref,
                *refs, hp, lowrank, sblk, residuals, post):
    if residuals:
        if lowrank:
            ys_ref, gates_ref, hu_ref, rhu_ref, h_s = refs
            recn_ref = None
        elif post:
            ys_ref, gates_ref, recn_ref, h_s = refs
            hu_ref = rhu_ref = None
        else:
            ys_ref, gates_ref, h_s = refs
            hu_ref = rhu_ref = recn_ref = None
    else:
        ys_ref, h_s = refs
        gates_ref = hu_ref = rhu_ref = recn_ref = None
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        h_s[:] = h0_ref[:]

    h = h_s[:]
    for st in range(sblk):
        if lowrank:
            hu = jnp.dot(h, uf_ref[:], preferred_element_type=jnp.float32)
            if hu_ref is not None:
                hu_ref[st] = hu
            rz = jnp.dot(hu, prz_ref[:], preferred_element_type=jnp.float32)
        else:
            rz = jnp.dot(h, prz_ref[:], preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(gi_ref[st, :, :hp] + rz[:, :hp])
        z = jax.nn.sigmoid(gi_ref[st, :, hp:2 * hp] + rz[:, hp:])
        if post:
            # group-GRU form: reset gate scales the candidate matmul *output*
            # (`compressed_gru.py:245`) — one h-matmul per step, no (r·h) pass
            recn = jnp.dot(h, pn_ref[:], preferred_element_type=jnp.float32)
            if recn_ref is not None:
                recn_ref[st] = recn
            n = jnp.tanh(gi_ref[st, :, 2 * hp:] + r * recn)
        else:
            rh = r * h
            if lowrank:
                rhu = jnp.dot(rh, uf_ref[:], preferred_element_type=jnp.float32)
                if rhu_ref is not None:
                    rhu_ref[st] = rhu
                nn = jnp.dot(rhu, pn_ref[:], preferred_element_type=jnp.float32)
            else:
                nn = jnp.dot(rh, pn_ref[:], preferred_element_type=jnp.float32)
            n = jnp.tanh(gi_ref[st, :, 2 * hp:] + nn)
        if gates_ref is not None:
            gates_ref[st] = jnp.concatenate([r, z, n], axis=-1)
        h = z * h + (1.0 - z) * n
        ys_ref[st] = h
    h_s[:] = h


def _fwd_call(gi, uf, prz, pn, h0, *, lowrank, interpret, residuals, post=False):
    t, bp, threehp = gi.shape
    hp = threehp // 3
    sblk, bt = _pick_tiles(t, bp, threehp, live=10 if residuals else 8) or (1, 8)
    nb = bp // bt if bp % bt == 0 else -(-bp // bt)
    gi = _pad_to(gi, (t, nb * bt, threehp))
    h0 = _pad_to(h0, (nb * bt, hp))

    step = lambda b, k: (k, b, 0)
    row = lambda b, k: (b, 0)
    const = lambda b, k: (0, 0)
    out_specs = [pl.BlockSpec((sblk, bt, hp), step, memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((t, nb * bt, hp), jnp.float32)]
    if residuals:
        out_specs.append(
            pl.BlockSpec((sblk, bt, threehp), step, memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((t, nb * bt, threehp), jnp.float32))
        if lowrank:
            rp = uf.shape[1]
            for _ in range(2):  # hu, rhu
                out_specs.append(
                    pl.BlockSpec((sblk, bt, rp), step, memory_space=pltpu.VMEM))
                out_shape.append(
                    jax.ShapeDtypeStruct((t, nb * bt, rp), jnp.float32))
        elif post:
            out_specs.append(  # rec_n (pre-reset candidate recurrent term)
                pl.BlockSpec((sblk, bt, hp), step, memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((t, nb * bt, hp), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, hp=hp, lowrank=lowrank, sblk=sblk,
                          residuals=residuals, post=post),
        grid=(nb, t // sblk),
        in_specs=[
            pl.BlockSpec((sblk, bt, threehp), step, memory_space=pltpu.VMEM),
            pl.BlockSpec(uf.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(prz.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(pn.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, hp), row, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bt, hp), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(gi, uf, prz, pn, h0)
    # ys [, gates (r,z,n) [, hu, rhu]]
    return tuple(o[:, :bp] for o in out)


# ---------------------------------------------------------------------------
# backward (reverse grid)
# ---------------------------------------------------------------------------

def _bwd_kernel(gates_ref, *refs, hp, lowrank, sblk, post):
    if lowrank:
        (hu_ref, rhu_ref, uf_ref, prz_ref, pn_ref, hprev_ref, dys_ref,
         dgi_ref, duf_ref, dprz_ref, dpn_ref, dh0_ref,
         dh_s, duf_s, dprz_s, dpn_s) = refs
        recn_ref = None
    elif post:
        (recn_ref, uf_ref, prz_ref, pn_ref, hprev_ref, dys_ref,
         dgi_ref, duf_ref, dprz_ref, dpn_ref, dh0_ref,
         dh_s, duf_s, dprz_s, dpn_s) = refs
        hu_ref = rhu_ref = None
    else:
        (uf_ref, prz_ref, pn_ref, hprev_ref, dys_ref,
         dgi_ref, duf_ref, dprz_ref, dpn_ref, dh0_ref,
         dh_s, duf_s, dprz_s, dpn_s) = refs
        hu_ref = rhu_ref = recn_ref = None
    b = pl.program_id(0)
    k = pl.program_id(1)
    nb = pl.num_programs(0)
    nt = pl.num_programs(1)

    @pl.when(jnp.logical_and(b == 0, k == 0))
    def _():
        duf_s[:] = jnp.zeros_like(duf_s)
        dprz_s[:] = jnp.zeros_like(dprz_s)
        dpn_s[:] = jnp.zeros_like(dpn_s)

    @pl.when(k == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)

    dh_carry = dh_s[:]
    duf_acc = dprz_acc = dpn_acc = None

    for st in range(sblk - 1, -1, -1):
        h_prev = hprev_ref[st]

        # saved forward activations — zero recompute
        gates = gates_ref[st]
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
            recn = recn_ref[st]
            drecn = dn_pre * r
            dr = dn_pre * recn
            dpn_t = jnp.dot(h_prev.T, drecn, preferred_element_type=jnp.float32)
            dh_prev = dh_prev + jnp.dot(drecn, pn_ref[:].T,
                                        preferred_element_type=jnp.float32)
        elif lowrank:
            drhu = jnp.dot(dn_pre, pn_ref[:].T, preferred_element_type=jnp.float32)
            dpn_t = jnp.dot(rhu_ref[st].T, dn_pre, preferred_element_type=jnp.float32)
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
            dprz_t = jnp.dot(hu_ref[st].T, drz, preferred_element_type=jnp.float32)
            dh_prev = dh_prev + jnp.dot(dhu, uf_ref[:].T,
                                        preferred_element_type=jnp.float32)
            duf_t = duf_t + jnp.dot(h_prev.T, dhu, preferred_element_type=jnp.float32)
            duf_acc = duf_t if duf_acc is None else duf_acc + duf_t
        else:
            dprz_t = jnp.dot(h_prev.T, drz, preferred_element_type=jnp.float32)
            dh_prev = dh_prev + jnp.dot(drz, prz_ref[:].T,
                                        preferred_element_type=jnp.float32)

        dgi_ref[st] = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
        dprz_acc = dprz_t if dprz_acc is None else dprz_acc + dprz_t
        dpn_acc = dpn_t if dpn_acc is None else dpn_acc + dpn_t
        dh_carry = dh_prev

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


def _bwd_call(gates, hu, rhu, uf, prz, pn, hprev, dys, *, lowrank, interpret,
              post=False, recn=None):
    t, bp, threehp = gates.shape
    hp = threehp // 3
    sblk, bt = _pick_tiles(t, bp, threehp, live=16) or (1, 8)
    nb = bp // bt if bp % bt == 0 else -(-bp // bt)
    bpad = nb * bt
    gates = _pad_to(gates, (t, bpad, threehp))
    hprev = _pad_to(hprev, (t, bpad, hp))
    dys = _pad_to(dys, (t, bpad, hp))

    ntb = t // sblk
    rev = lambda b, k: (ntb - 1 - k, b, 0)
    row = lambda b, k: (b, 0)
    const = lambda b, k: (0, 0)
    in_specs = [
        pl.BlockSpec((sblk, bt, threehp), rev, memory_space=pltpu.VMEM),  # gates
    ]
    operands = [gates]
    if lowrank:
        rp = hu.shape[-1]
        hu = _pad_to(hu, (t, bpad, rp))
        rhu = _pad_to(rhu, (t, bpad, rp))
        in_specs += [
            pl.BlockSpec((sblk, bt, rp), rev, memory_space=pltpu.VMEM),   # h@Uf
            pl.BlockSpec((sblk, bt, rp), rev, memory_space=pltpu.VMEM),   # (r h)@Uf
        ]
        operands += [hu, rhu]
    elif post:
        recn = _pad_to(recn, (t, bpad, hp))
        in_specs += [
            pl.BlockSpec((sblk, bt, hp), rev, memory_space=pltpu.VMEM),   # rec_n
        ]
        operands += [recn]
    in_specs += [
        pl.BlockSpec(uf.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec(prz.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec(pn.shape, const, memory_space=pltpu.VMEM),
        pl.BlockSpec((sblk, bt, hp), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((sblk, bt, hp), rev, memory_space=pltpu.VMEM),
    ]
    operands += [uf, prz, pn, hprev, dys]
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, hp=hp, lowrank=lowrank, sblk=sblk,
                          post=post),
        grid=(nb, ntb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((sblk, bt, threehp), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec(uf.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(prz.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(pn.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, hp), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, bpad, threehp), jnp.float32),
            jax.ShapeDtypeStruct(uf.shape, jnp.float32),
            jax.ShapeDtypeStruct(prz.shape, jnp.float32),
            jax.ShapeDtypeStruct(pn.shape, jnp.float32),
            jax.ShapeDtypeStruct((bpad, hp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, hp), jnp.float32),      # dh carry
            pltpu.VMEM(uf.shape, jnp.float32),      # dU_f accumulator
            pltpu.VMEM(prz.shape, jnp.float32),     # dP_rz accumulator
            pltpu.VMEM(pn.shape, jnp.float32),      # dP_n accumulator
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*operands)
    dgi, duf, dprz, dpn, dh0 = out
    return dgi[:, :bp], duf, dprz, dpn, dh0[:bp]


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _scan_core(gi, uf, prz, pn, h0, lowrank, interpret, post):
    # no-grad primal: residual-free forward (no gates/hu/rhu HBM traffic)
    (ys,) = _fwd_call(gi, uf, prz, pn, h0, lowrank=lowrank,
                      interpret=interpret, residuals=False, post=post)
    return ys


def _scan_core_fwd(gi, uf, prz, pn, h0, lowrank, interpret, post):
    out = _fwd_call(gi, uf, prz, pn, h0, lowrank=lowrank,
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
    dgi, duf, dprz, dpn, dh0 = _bwd_call(
        gates, hu, rhu, uf, prz, pn, hprev, dys,
        lowrank=lowrank, interpret=interpret, post=post, recn=recn)
    return dgi, duf, dprz, dpn, dh0


_scan_core.defvjp(_scan_core_fwd, _scan_core_bwd)


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
