"""Row-partitioned graph sharding for multi-chip aggregation.

New capability over the single-GPU reference (SURVEY §2.3). Partitioning
scheme (the TPU-native scaling analog of warp-level row chunking):

  - adjacency rows are block-partitioned over the mesh axis: device i owns
    rows [i·Vs, (i+1)·Vs) of A and of the node features;
  - **forward**: each device `all_gather`s the *compressed* CBSR features
    (V·k values + selectors — 8× less ICI traffic than dense at k=32/256,
    the TPU-native payoff of MaxK compression), densifies locally, and
    aggregates its row block: no halo bookkeeping, no atomics;
  - **backward**: each device runs its transposed block A_i^T (V rows,
    local columns) over its local dY partial, then `psum_scatter` reduces
    partials and re-partitions rows in one collective; sampling at the
    local selectors yields the compact (Vs, k) gradient.

Edges are padded per shard to the max shard nnz (col 0, value 0 — inert).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from maxk_tpu.parallel.mesh import GRAPH_AXIS
from maxk_tpu.sparse.csr import CSRGraph, with_norm


@struct.dataclass
class ShardedGraph:
    """Stacked per-shard CSR blocks; leading axis is the mesh axis.

    fwd_*: A row block     — (n, Vs+1) / (n, Em): local rows, global cols
    bwd_*: A_i^T           — (n, Vp+1) / (n, Em): global rows, local cols
    *_tiles: optional stacked edge-tile schedules per shard (production
    kernel path; see `sparse/meta.EdgeTiles`), padded with inert tiles.
    """

    fwd_indptr: jax.Array
    fwd_indices: jax.Array
    fwd_values: jax.Array
    bwd_indptr: jax.Array
    bwd_indices: jax.Array
    bwd_values: jax.Array
    fwd_tiles: Optional[dict] = None  # {block, cols, vals, localrow} stacked
    bwd_tiles: Optional[dict] = None
    axis: str = struct.field(pytree_node=False, default=GRAPH_AXIS)
    num_shards: int = struct.field(pytree_node=False, default=1)
    num_nodes: int = struct.field(pytree_node=False, default=0)
    padded_nodes: int = struct.field(pytree_node=False, default=0)
    row_block: int = struct.field(pytree_node=False, default=8)

    @property
    def shard_nodes(self) -> int:
        return self.padded_nodes // self.num_shards

    def local_fwd(self) -> CSRGraph:
        """Local row-block CSR as seen inside shard_map (leading axis 1)."""
        return CSRGraph(
            indptr=self.fwd_indptr.reshape(-1),
            indices=self.fwd_indices.reshape(-1),
            values=self.fwd_values.reshape(-1),
        )

    def local_bwd(self) -> CSRGraph:
        return CSRGraph(
            indptr=self.bwd_indptr.reshape(-1),
            indices=self.bwd_indices.reshape(-1),
            values=self.bwd_values.reshape(-1),
        )

    def _local_tiles(self, stacked: dict, num_rows: int):
        from maxk_tpu.sparse.meta import EdgeTiles

        nt, t = stacked["cols"].shape[-2:]
        return EdgeTiles(
            block=stacked["block"].reshape(nt),
            cols=stacked["cols"].reshape(nt, t),
            vals=stacked["vals"].reshape(nt, t),
            localrow=stacked["localrow"].reshape(nt, t),
            row_block=self.row_block,
            num_row_blocks=-(-num_rows // self.row_block),
            num_nodes=num_rows,
        )

    def local_fwd_tiles(self):
        return self._local_tiles(self.fwd_tiles, self.shard_nodes)

    def local_bwd_tiles(self):
        return self._local_tiles(self.bwd_tiles, self.padded_nodes)


def _pad_to(x: np.ndarray, n: int, fill=0) -> np.ndarray:
    if x.shape[0] == n:
        return x
    pad = np.full((n - x.shape[0],) + x.shape[1:], fill, dtype=x.dtype)
    return np.concatenate([x, pad])


def build_sharded_graph(
    csr: CSRGraph,
    num_shards: int,
    norm: str = "none",
    build_tiles: bool = False,
    row_block: int = 8,
    edge_tile: int = 256,
) -> ShardedGraph:
    """Host-side partition of a (normalized) CSR over `num_shards` devices.

    With `build_tiles`, per-shard edge-tile schedules are built for both
    the local row block and its transpose, so the sharded path runs the
    same production tile kernels as single-chip (`ops/spgemm`)."""
    import scipy.sparse as sp

    g = with_norm(csr, norm)
    v = g.num_nodes
    vs = -(-v // num_shards)
    vp = vs * num_shards
    indptr = _pad_to(np.asarray(g.indptr, dtype=np.int64), vp + 1, fill=int(g.nnz))
    m = sp.csr_matrix(
        (np.asarray(g.values), np.asarray(g.indices), indptr), shape=(vp, vp)
    )

    fwd_blocks, bwd_blocks = [], []
    for i in range(num_shards):
        blk = m[i * vs : (i + 1) * vs]  # (Vs, Vp) local rows, global cols
        fwd_blocks.append(blk)
        bwd_blocks.append(blk.T.tocsr())  # (Vp, Vs) global rows, local cols

    em = max(max(b.nnz for b in fwd_blocks), 1)

    def stack(blocks, rows):
        ip = np.stack(
            [_pad_to(b.indptr.astype(np.int32), rows + 1, fill=b.nnz) for b in blocks]
        )
        ix = np.stack([_pad_to(b.indices.astype(np.int32), em) for b in blocks])
        vl = np.stack([_pad_to(b.data.astype(np.float32), em) for b in blocks])
        return ip, ix, vl

    fip, fix, fvl = stack(fwd_blocks, vs)
    bip, bix, bvl = stack(bwd_blocks, vp)

    fwd_tiles = bwd_tiles = None
    if build_tiles:
        from maxk_tpu.sparse.meta import build_edge_tiles

        def stack_tiles(blocks, rows):
            tiles = []
            for b in blocks:
                gb = CSRGraph(
                    indptr=jnp.asarray(b.indptr.astype(np.int32)),
                    indices=jnp.asarray(b.indices.astype(np.int32)),
                    values=jnp.asarray(b.data.astype(np.float32)),
                )
                tiles.append(build_edge_tiles(gb, row_block, edge_tile))
            ntm = max(t.num_tiles for t in tiles)
            nb = -(-rows // row_block)

            def padt(t):
                pad = ntm - t.num_tiles
                return {
                    "block": np.pad(
                        np.asarray(t.block), (0, pad), constant_values=nb - 1
                    ),
                    "cols": np.pad(np.asarray(t.cols), ((0, pad), (0, 0))),
                    "vals": np.pad(np.asarray(t.vals), ((0, pad), (0, 0))),
                    "localrow": np.pad(
                        np.asarray(t.localrow), ((0, pad), (0, 0))
                    ),
                }

            stacked = [padt(t) for t in tiles]
            return {
                k: jnp.asarray(np.stack([s[k] for s in stacked]))
                for k in stacked[0]
            }

        fwd_tiles = stack_tiles(fwd_blocks, vs)
        bwd_tiles = stack_tiles(bwd_blocks, vp)

    return ShardedGraph(
        fwd_indptr=jnp.asarray(fip),
        fwd_indices=jnp.asarray(fix),
        fwd_values=jnp.asarray(fvl),
        bwd_indptr=jnp.asarray(bip),
        bwd_indices=jnp.asarray(bix),
        bwd_values=jnp.asarray(bvl),
        fwd_tiles=fwd_tiles,
        bwd_tiles=bwd_tiles,
        axis=GRAPH_AXIS,
        num_shards=num_shards,
        num_nodes=v,
        padded_nodes=vp,
        row_block=row_block,
    )


def shard_rows(x: np.ndarray, num_shards: int, fill=0) -> np.ndarray:
    """Pad a per-node array to the sharded row count (Vp)."""
    v = x.shape[0]
    vs = -(-v // num_shards)
    return _pad_to(np.asarray(x), vs * num_shards, fill=fill)
