"""Pure-XLA sparse aggregation ops — the validation oracle / fallback path.

These play the role cuSPARSE plays in the reference: a trusted, simple
implementation used as (a) numerical ground truth for kernel validation
(`kernels/main.cu:19-48` `check_err`, `direct_kernel_interface.py:221-372`
`validate_against_cusparse`) and (b) the baseline arm of the speedup
benchmarks (`kernels/spmm_cusparse.cu`). They are also the CPU-runnable
path for tests, like the reference's torch.sparse fallback chain
(`maxk_spgemm_function.py:96-130`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from maxk_tpu.sparse.csr import CSRGraph
from maxk_tpu.sparse.meta import EdgeTiles


def spmm_segsum(g: CSRGraph, x: jax.Array) -> jax.Array:
    """Exact CSR SpMM: y = A @ x via gather + segment_sum.

    O(E·D) intermediate — oracle for tests and small graphs. Fully
    differentiable (segment_sum transposes to a gather, gather to a
    scatter-add), so baselines built on it need no custom_vjp.
    """
    gathered = x[g.indices] * g.values[:, None].astype(x.dtype)
    return jax.ops.segment_sum(
        gathered, g.row_ids(), num_segments=g.num_nodes, indices_are_sorted=True
    )


def spmm_tiles_xla(tiles: EdgeTiles, x: jax.Array) -> jax.Array:
    """CSR SpMM over the edge-tile schedule, in plain XLA.

    Computes exactly what the Pallas kernel computes — per-tile
    (T,D) gather, edge-weighting, one-hot local-row contraction to (R,D),
    tile→row-block reduction — so it doubles as the tile-table validator.
    O(NT·R·D) partials; use on small/medium graphs.
    """
    r = tiles.row_block
    nb = tiles.num_row_blocks
    gathered = x[tiles.cols]  # (NT, T, D)
    weighted = gathered * tiles.vals[..., None].astype(x.dtype)
    onehot = jax.nn.one_hot(tiles.localrow, r, dtype=x.dtype)  # (NT, T, R)
    partial = jnp.einsum("ntr,ntd->nrd", onehot, weighted, precision="highest")
    out = jax.ops.segment_sum(
        partial, tiles.block, num_segments=nb, indices_are_sorted=True
    )
    return out.reshape(nb * r, -1)[: tiles.num_nodes]


def spmm_dense(g: CSRGraph, x: jax.Array) -> jax.Array:
    """Densified A @ x — brute-force oracle for tiny test graphs only."""
    v = g.num_nodes
    a = jnp.zeros((v, v), dtype=x.dtype)
    a = a.at[g.row_ids(), g.indices].add(g.values.astype(x.dtype))
    return jnp.dot(a, x, precision="highest")
