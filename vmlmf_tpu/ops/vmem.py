"""Chip-aware VMEM budgets for the fused Pallas kernels.

The fused scan kernels (`ops.pallas_scan`, `ops.pallas_pipeline`,
`ops.pallas_gru`) bound their streamed tiles and VMEM-resident weights by the
chip's vector memory.  Round 2 hardcoded v5e constants; this module derives
them from the detected chip generation (`utils.analytics.detect_chip`) with
an env override, so other TPU parts get correctly scaled tile pickers.

The margins reproduce the empirically calibrated v5e values exactly
(budget 80 MiB / limit 110 MiB / compiler limit 116 MiB out of 128 MiB
physical — the point where the 2x650-w300 stack kernel compiles, stream
71 MiB + weights 35 MiB, and the 4x650 stack does not).

Env override: ``VMLMF_VMEM_BYTES=<int>`` forces the physical VMEM size —
useful for new chips and for testing the tile picker's fallback paths.
"""

from __future__ import annotations

import os

from vmlmf_tpu.utils.analytics import detect_chip

# Physical VMEM per TensorCore.  v4 / v5e / v5p / v6e all ship 128 MiB of
# vector memory (public TPU system-architecture docs); Ironwood's VMEM is not
# published — kept at the conservative 128 MiB (override with
# VMLMF_VMEM_BYTES).  Unknown chips fall back to the v5e entry, loudly
# (`analytics.detect_chip` warns on unrecognized TPU device kinds).
VMEM_BYTES = {
    "v4": 128 << 20,
    "v5e": 128 << 20,
    "v5p": 128 << 20,
    "v6e": 128 << 20,
    "v7": 128 << 20,
}

_HEADROOM = 18 << 20         # limit = vmem - headroom (Mosaic stack, DMA slots)
_STREAM_MARGIN = 30 << 20    # budget = limit - margin (double-buffered streams)
_COMPILER_MARGIN = 12 << 20  # vmem_limit_bytes = vmem - margin


def chip_vmem_bytes(chip: str | None = None) -> int:
    env = os.environ.get("VMLMF_VMEM_BYTES")
    if env:
        return int(env)
    return VMEM_BYTES.get(chip or detect_chip(), VMEM_BYTES["v5e"])


def vmem_budgets(chip: str | None = None) -> dict:
    """-> {budget, limit, compiler_limit} in bytes for the tile pickers.

    ``budget``: cap on the per-grid-step streamed temporaries (the unrolled
    inner loop's live [bt, 4h] values); ``limit``: cap on streamed + fixed
    (whole-array weights, gradient accumulators); ``compiler_limit``: the
    Mosaic `vmem_limit_bytes` passed to `pallas_call`.
    """
    vmem = chip_vmem_bytes(chip)
    limit = max(vmem - _HEADROOM, vmem // 2)
    return {
        "budget": max(limit - _STREAM_MARGIN, vmem // 4),
        "limit": limit,
        "compiler_limit": max(vmem - _COMPILER_MARGIN, vmem // 2),
    }
