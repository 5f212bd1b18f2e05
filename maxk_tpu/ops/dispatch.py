"""Kernel implementation selection + graceful fallback.

Role of the reference's `--kernel_mode {auto,maxk,cusparse,dgl}` flag and
its try/except fallback chain (MaxK kernel → cuSPARSE → torch.sparse,
`maxk_spgemm_function.py:96-130`; `utils/config.py:62-67`). On TPU the
chain is: Pallas tile kernel → tile-schedule XLA → segment-sum XLA.
Selection happens at trace time (static), not per-call at runtime —
everything under jit must be shape/branch static.
"""

from __future__ import annotations

import enum

import jax


class KernelMode(str, enum.Enum):
    AUTO = "auto"
    HYBRID = "hybrid"  # degree-sorted symmetric-strip MXU decomposition
    # hybrid with per-column int8-quantized features on the strip
    # matmuls (int8×int8 MXU, measured 1.61× the bf16 rate). LOSSY
    # (~0.5% feature quant error) — explicit opt-in only, AUTO never
    # selects it; requires an int8 strip; single-chip (the sharded
    # path ignores it and stays exact)
    HYBRID_INT8 = "hybrid_int8"
    PALLAS = "pallas"  # Pallas block-dense brick kernel (TPU)
    TILES_XLA = "tiles_xla"  # XLA over the tile schedule (one-shot)
    TILES_SCAN = "tiles_scan"  # XLA tile schedule, memory-bounded scan
    SEGSUM = "segsum"  # gather + segment_sum oracle


def resolve_mode(
    mode: str | KernelMode, has_tiles: bool, has_hybrid: bool = False
) -> KernelMode:
    mode = KernelMode(mode)
    if mode != KernelMode.AUTO:
        return mode
    if has_hybrid:
        # the production path when a strip schedule exists (undirected
        # graphs): ~93% of edges on dense MXU matmuls
        return KernelMode.HYBRID
    if jax.default_backend() == "tpu" and has_tiles:
        return KernelMode.TILES_SCAN
    return KernelMode.SEGSUM
