"""Compression analytics: parameter counts and the closed-form FLOP model.

Parity with
`/root/reference/rnn_compression_factorization_vmlmf/src/utils/compression_cal.py:33-145`:
`lstm_cell_flops` reproduces `_count_lstm_cell`'s formula term by term
(low-rank matmuls + diagonal ops + correction additions, ×4 gates, plus the
state-update elementwise ops), and `model_flops` the per-layer × seq_len ×
batch accumulation of `count_lstm` + `count_linear`.  These numbers are the
reference's own compression metric; they are reported alongside measured
wall-clock throughput (which the reference never reports — see BASELINE.md).
"""

from __future__ import annotations

import jax


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def lstm_cell_flops(input_size, hidden_size, w_rank=None, u_rank=None, *,
                    vm=True, bias=True) -> int:
    """FLOPs of one timestep of one cell (`compression_cal.py:72-113`).

    ``vm=False`` gives the vanilla-LSTM count; with ranks set it counts the
    factorized matmuls, the diagonal (vm) multiplies, and the correction adds.
    """
    if isinstance(u_rank, (list, tuple)):
        u_rank = u_rank[0]
    isvm = vm and w_rank is not None

    if isvm:
        input_ops = (2 * input_size - 1) * w_rank + (2 * w_rank - 1) * hidden_size
        hidden_ops = (2 * hidden_size - 1) * u_rank + (2 * u_rank - 1) * hidden_size
        input_dia = input_size
        hidden_dia = hidden_size
        input_add = (2 * w_rank - 1) * input_size + hidden_size
        hidden_add = (2 * u_rank - 1) * hidden_size + hidden_size
        state_ops = (input_ops + hidden_ops + input_dia + hidden_dia
                     + hidden_size * 3 + input_add + hidden_add)
    else:
        input_ops = (2 * input_size - 1) * hidden_size
        hidden_ops = (2 * hidden_size - 1) * hidden_size
        state_ops = input_ops + hidden_ops + hidden_size
    if bias:
        state_ops += hidden_size
    total = state_ops * 4
    total += hidden_size * 3  # f*c + i*g
    total += hidden_size      # o * tanh(c')
    return total


def model_flops(input_size, layer_sizes, seq_len, batch_size, *,
                w_rank=None, u_rank=None, vm=True, num_classes=18) -> int:
    """Whole-model analytic FLOPs (`count_lstm` + `count_linear`)."""
    total = 0
    in_size = input_size
    for h in layer_sizes:
        total += lstm_cell_flops(in_size, h, w_rank, u_rank, vm=vm)
        in_size = h
    total *= seq_len * batch_size
    total += layer_sizes[-1] * num_classes * 2  # classifier head
    return total


def compression_report(baseline_params, compressed_params, *,
                       baseline_flops=None, compressed_flops=None) -> dict:
    rep = {
        "params_baseline_K": baseline_params / 1e3,
        "params_compressed_K": compressed_params / 1e3,
        "compression_ratio": baseline_params / max(compressed_params, 1),
    }
    if baseline_flops is not None and compressed_flops is not None:
        rep["flops_baseline_M"] = baseline_flops / 1e6
        rep["flops_compressed_M"] = compressed_flops / 1e6
        rep["flops_ratio"] = baseline_flops / max(compressed_flops, 1)
    return rep


def vmlmf_hw_flops(input_size, hidden_size, w_rank, u_rank, num_gates=4) -> int:
    """FLOPs one VMLMF cell timestep actually EXECUTES per sample.

    Distinct from `lstm_cell_flops` (the reference's compression metric,
    `compression_cal.py:72-113`), which counts every gate's low-rank chain
    separately — the implementation shares the x@U_x / h@U_h factor products
    across all gates, so the executed count is ~4x lower.  Use THIS for
    MFU/roofline; use `lstm_cell_flops` to reproduce the reference's reports.

    Counted: the four matmuls (2mn FLOPs each) + the diagonal/vm elementwise
    epilogue + the state update.
    """
    g = num_gates
    mm = 2 * (input_size * w_rank + w_rank * g * hidden_size
              + hidden_size * u_rank + u_rank * g * hidden_size)
    epilogue = 4 * g * hidden_size + 2 * (input_size + hidden_size)
    state = 4 * hidden_size
    return mm + epilogue + state


# -- roofline --------------------------------------------------------------

# Peak numbers per chip generation (compute in FLOP/s for the given matmul
# dtype, HBM bandwidth in bytes/s).  Sources: public TPU spec sheets; f32 is
# the multi-pass bf16 MXU rate (~peak/4 on every generation that documents
# it).  Override for unlisted parts: VMLMF_TPU_PEAKS="bf16:2e14,f32:5e13,
# hbm_bw:8e11" (any subset; unspecified keys fall back to the detected chip).
TPU_PEAKS = {
    "v5e": {"bf16": 197e12, "f32": 49e12, "hbm_bw": 819e9},
    "v4": {"bf16": 275e12, "f32": 69e12, "hbm_bw": 1228e9},
    "v5p": {"bf16": 459e12, "f32": 115e12, "hbm_bw": 2765e9},
    # Trillium (public: 918 bf16 TFLOP/s, 1.64 TB/s HBM)
    "v6e": {"bf16": 918e12, "f32": 230e12, "hbm_bw": 1640e9},
    # Ironwood (public: 4614 fp8 TFLOP/s -> ~2307 bf16, 7.37 TB/s HBM)
    "v7": {"bf16": 2307e12, "f32": 577e12, "hbm_bw": 7370e9},
}

_warned_unknown_chip: set = set()


def _warn_unknown_chip(kind):
    """MFU/roofline numbers must never be silently wrong on new hardware —
    an unrecognized device kind logs loudly before the v5e fallback."""
    import warnings

    if kind not in _warned_unknown_chip:
        _warned_unknown_chip.add(kind)
        warnings.warn(
            f"unrecognized TPU device kind {kind!r}: falling back to v5e "
            "peaks/VMEM — MFU, roofline fractions, and kernel tile budgets "
            "may be wrong.  Set VMLMF_TPU_PEAKS / VMLMF_VMEM_BYTES for this "
            "part (utils/analytics.py TPU_PEAKS has the format).",
            stacklevel=3)


def detect_chip(kind=None):
    """Chip generation key into `TPU_PEAKS` (and the VMEM table, `ops.vmem`).
    Non-TPU backends report the conservative v5e quietly; a TPU whose device
    kind matches no table entry warns loudly first (see `_warn_unknown_chip`).
    ``kind`` overrides the probed `device_kind` (for tests)."""
    if kind is None:
        try:
            dev = jax.devices()[0]
            if dev.platform != "tpu":
                return "v5e"
            kind = dev.device_kind
        except Exception:
            return "v5e"
    kind = kind.lower()
    for key in ("v5p", "v5e", "v6e", "v7", "v4"):
        # device kinds appear both fused ("tpu v5e") and spaced ("tpu v5 p")
        if key in kind or f"{key[:2]} {key[2:]}".strip() == kind.removeprefix("tpu ").strip():
            return key
    if "v5 lite" in kind or "v5lite" in kind:
        return "v5e"
    if "v6 lite" in kind or "v6lite" in kind or "trillium" in kind or "v6" in kind:
        return "v6e"
    if "ironwood" in kind or "tpu7" in kind:
        return "v7"
    _warn_unknown_chip(kind)
    return "v5e"


def chip_peaks(chip=None):
    """-> {bf16, f32, hbm_bw} for ``chip`` (default: detected), with any
    VMLMF_TPU_PEAKS="key:value,..." env overrides applied on top."""
    import os

    peaks = dict(TPU_PEAKS[chip or detect_chip()])
    env = os.environ.get("VMLMF_TPU_PEAKS")
    if env:
        for item in env.split(","):
            k, _, val = item.partition(":")
            k = k.strip()
            if k not in ("bf16", "f32", "hbm_bw"):
                raise ValueError(
                    f"VMLMF_TPU_PEAKS key {k!r} not in (bf16, f32, hbm_bw)")
            peaks[k] = float(val)
    return peaks


def roofline_report(flops, hbm_bytes, seconds, *, chip="v5e", dtype="f32") -> dict:
    """Achieved-vs-roofline for a measured region (SURVEY.md §5: keep the
    analytic FLOP model and report achieved fraction of the roofline).

    flops: analytic FLOP count of the region (e.g. `model_flops(...)`);
    hbm_bytes: bytes moved to/from HBM; seconds: measured wall-clock.
    Returns achieved FLOP/s and bandwidth, arithmetic intensity, the
    roofline-permitted time, and which resource bounds the region.
    """
    peaks = chip_peaks(chip)
    peak_flops, peak_bw = peaks[dtype], peaks["hbm_bw"]
    intensity = flops / max(hbm_bytes, 1)
    ridge = peak_flops / peak_bw
    bound = "compute" if intensity >= ridge else "memory"
    t_roofline = max(flops / peak_flops, hbm_bytes / peak_bw)
    return {
        "achieved_flops_per_s": flops / seconds,
        "achieved_bw_bytes_per_s": hbm_bytes / seconds,
        "arithmetic_intensity": intensity,
        "ridge_intensity": ridge,
        "bound": bound,
        "roofline_seconds": t_roofline,
        "fraction_of_roofline": t_roofline / seconds,
    }
