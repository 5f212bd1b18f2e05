"""Brick schedules — the MXU-native SpMM decomposition (round-2 kernel).

The reference's forward kernel streams edges and scatters per-lane into a
shared-memory accumulator (`/root/reference/kernels/spmm_maxk.cu:17-106`).
A TPU has no per-lane scatter, and XLA's row gather is issue-rate-bound at
~7 ns/row (docs/PERF.md) — so the round-2 kernel reformulates SpMM as
**on-the-fly block densification + dense brick matmuls on the MXU**:

  - A is cut into (WB x WIN) *bricks* (128x128 by default);
  - each brick's edges are densified in VMEM with two one-hot compare
    matmuls (exact; ~21 ns per 128-edge subtile on a 197 TFLOP/s MXU);
  - the dense brick multiplies a VMEM-resident X window:
    Y[rb] += A_brick @ X[win]  (~43 ns per brick at D=256);
  - empty bricks are skipped entirely (only occupied bricks appear in the
    schedule), which is what makes this cheaper than the full dense
    matmul (V^2*D*2 flops ~= 141 ms for reddit on this chip).

Layout (consumed by `maxk_tpu.ops.spmm_bricks`):

  - output rows grouped into *supergroups* of SG rows (the Y VMEM block);
  - source rows grouped into *panels* of PANEL rows (the X VMEM block);
  - a supergroup x panel *cell* owns the bricks inside it; bricks are
    streamed as fixed 128-edge-slot *subtiles* (per-brick padded), and
    subtiles are packed CH per *chunk* = one Pallas grid step;
  - chunks are sorted by (supergroup, panel) so the Y block is revisited
    consecutively (accumulate in VMEM, written once) and the X panel is
    re-fetched only on panel switches.

This file builds the schedule twice: vectorized numpy (host, tests/CPU)
and pure-jnp on device (`build_bricks_device`) because host->device
uploads run ~2 MB/s through the axon tunnel (docs/PERF.md).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from maxk_tpu.sparse.csr import CSRGraph, rows_from_indptr

# Defaults. WB/WIN are the brick (MXU) dims; SG/PANEL the VMEM residency
# dims; T the edge-slot subtile; CH subtiles per grid step.
SUPERGROUP = 512
PANEL = 4096
BRICK_ROWS = 128
BRICK_COLS = 128
SLOTS = 128
CHUNK = 32


@struct.dataclass
class BrickSchedule:
    """Flattened brick/subtile stream for the Pallas brick SpMM kernel.

    chunk_panel:   (NC,)        int32  X panel id per chunk (scalar prefetch)
    chunk_sgroup:  (NC,)        int32  Y supergroup id per chunk (prefetch)
    meta:          (NC, 1, CH)  int32  per-subtile packed meta:
                                       bits 0-5 win, 6-8 rb, 9 first, 10 end
    idx:           (NC, CH, T)  int32  per-slot packed (lr << 7) | lc
    val:           (NC, CH, T)  f32    per-slot edge weight (0 = padding)
    """

    chunk_panel: jax.Array
    chunk_sgroup: jax.Array
    meta: jax.Array
    idx: jax.Array
    val: jax.Array
    num_nodes: int = struct.field(pytree_node=False, default=0)
    num_cols: int = struct.field(pytree_node=False, default=0)
    sg: int = struct.field(pytree_node=False, default=SUPERGROUP)
    panel: int = struct.field(pytree_node=False, default=PANEL)
    wb: int = struct.field(pytree_node=False, default=BRICK_ROWS)
    win: int = struct.field(pytree_node=False, default=BRICK_COLS)

    @property
    def num_chunks(self) -> int:
        return self.meta.shape[0]

    @property
    def ch(self) -> int:
        return self.meta.shape[2]

    @property
    def slots(self) -> int:
        return self.idx.shape[2]

    @property
    def num_sgroups(self) -> int:
        return -(-self.num_nodes // self.sg)

    @property
    def num_panels(self) -> int:
        return -(-self.num_cols // self.panel)


def _check_dims(sg, panel, wb, win, t, ch):
    assert sg % wb == 0 and panel % win == 0
    assert sg // wb <= 8, "rb field is 3 bits"
    assert panel // win <= 64, "win field is 6 bits"
    assert wb <= 512 and win <= 128, "lr/lc pack into 7+N bits"
    assert t % 8 == 0 and ch >= 1


def build_bricks(
    g: CSRGraph,
    sg: int = SUPERGROUP,
    panel: int = PANEL,
    wb: int = BRICK_ROWS,
    win: int = BRICK_COLS,
    t: int = SLOTS,
    ch: int = CHUNK,
) -> BrickSchedule:
    """Host (numpy) schedule build — reference implementation and CPU path.

    Role of `kernels/generate_meta.py` for the brick kernel: a pure
    function of the graph structure, built once per graph per direction.
    """
    _check_dims(sg, panel, wb, win, t, ch)
    indptr = np.asarray(g.indptr, dtype=np.int64)
    nnz = int(indptr[-1])  # live edges (excludes inert dedup tail)
    cols = np.asarray(g.indices, dtype=np.int64)[:nnz]
    vals = np.asarray(g.values, dtype=np.float32)[:nnz]
    v = indptr.shape[0] - 1
    rows = np.repeat(np.arange(v, dtype=np.int64), np.diff(indptr))

    ns = -(-v // sg)
    npan = -(-v // panel)
    rbs = sg // wb
    wins = panel // win

    s = rows // sg
    rb = (rows % sg) // wb
    lr = rows % wb
    p = cols // panel
    w = (cols % panel) // win
    lc = cols % win
    cell = s * npan + p
    brick = (cell * rbs + rb) * wins + w

    order = np.argsort(brick, kind="stable")
    brick_s = brick[order]
    packed = ((lr[order] << 7) | lc[order]).astype(np.int32)
    val_s = vals[order]

    nbricks = ns * npan * rbs * wins
    cnt = np.bincount(brick_s, minlength=nbricks).astype(np.int64)
    st_per_brick = -(-cnt // t)  # 0 for empty bricks
    brick_edge_off = np.cumsum(cnt) - cnt
    brick_st_cum = np.cumsum(st_per_brick)

    ncells = ns * npan
    cell_st = np.bincount(
        np.arange(nbricks) // (rbs * wins), weights=st_per_brick, minlength=ncells
    ).astype(np.int64)
    cell_chunks = -(-cell_st // ch)
    # every supergroup needs >= 1 chunk so its Y block is zeroed+written
    per_sg = cell_chunks.reshape(ns, npan).sum(axis=1)
    empty_sg = np.nonzero(per_sg == 0)[0]
    cell_chunks[empty_sg * npan] = 1

    nc = int(cell_chunks.sum())
    chunk_cell = np.repeat(np.arange(ncells, dtype=np.int64), cell_chunks)
    chunk_panel = (chunk_cell % npan).astype(np.int32)
    chunk_sgroup = (chunk_cell // npan).astype(np.int32)

    # global padded-subtile index -> (brick, within-brick subtile)
    cell_pad_off = np.cumsum(cell_chunks * ch) - cell_chunks * ch
    cell_real_off = np.cumsum(cell_st) - cell_st
    st = np.arange(nc * ch, dtype=np.int64)
    st_cell = chunk_cell[st // ch]
    jj = st - cell_pad_off[st_cell]
    real = jj < cell_st[st_cell]
    rst = np.minimum(cell_real_off[st_cell] + jj, max(brick_st_cum[-1] - 1, 0))
    bk = np.searchsorted(brick_st_cum, rst, side="right")
    k = rst - (brick_st_cum[bk] - st_per_brick[bk])

    m_win = bk % wins
    m_rb = (bk // wins) % rbs
    m_first = (k == 0).astype(np.int64)
    m_end = (k == st_per_brick[bk] - 1).astype(np.int64)
    meta = np.where(
        real, m_win | (m_rb << 6) | (m_first << 9) | (m_end << 10), 0
    ).astype(np.int32)

    e = brick_edge_off[bk][:, None] + (k[:, None] * t + np.arange(t)[None, :])
    valid = real[:, None] & (
        e < (brick_edge_off[bk] + cnt[bk])[:, None]
    )
    ec = np.clip(e, 0, max(nnz - 1, 0))
    idx = np.where(valid, packed[ec], 0).astype(np.int32)
    val = np.where(valid, val_s[ec], 0.0).astype(np.float32)

    return BrickSchedule(
        chunk_panel=jnp.asarray(chunk_panel),
        chunk_sgroup=jnp.asarray(chunk_sgroup),
        meta=jnp.asarray(meta.reshape(nc, 1, ch)),
        idx=jnp.asarray(idx.reshape(nc, ch, t)),
        val=jnp.asarray(val.reshape(nc, ch, t)),
        num_nodes=v,
        num_cols=v,
        sg=sg,
        panel=panel,
        wb=wb,
        win=win,
    )


def build_bricks_device(
    g: CSRGraph,
    sg: int = SUPERGROUP,
    panel: int = PANEL,
    wb: int = BRICK_ROWS,
    win: int = BRICK_COLS,
    t: int = SLOTS,
    ch: int = CHUNK,
) -> BrickSchedule:
    """On-device schedule build (two jitted phases + one scalar fetch).

    Needed because benchmark graphs are generated on device and the
    tunnel uploads at ~2 MB/s — a reddit-scale schedule is ~1 GB.
    Phase 1 computes the (data-dependent) chunk count; phase 2 fills the
    statically-shaped stream. Mirrors `build_bricks` exactly.
    """
    _check_dims(sg, panel, wb, win, t, ch)
    v = g.num_nodes
    nnz = int(np.asarray(g.indptr[-1]))  # one scalar fetch
    ns = -(-v // sg)
    npan = -(-v // panel)
    rbs = sg // wb
    wins = panel // win
    nbricks = ns * npan * rbs * wins
    ncells = ns * npan

    @jax.jit
    def phase1(indptr, cols):
        # scan form, not searchsorted-over-nnz-needles: the latter
        # crashes the TPU worker at ogbn-products scale (see
        # csr.rows_from_indptr)
        rows = rows_from_indptr(indptr, nnz, v)
        c = cols[:nnz].astype(jnp.int32)
        s = rows // sg
        rb = (rows % sg) // wb
        p = c // panel
        w = (c % panel) // win
        cell = s * npan + p
        brick = (cell * rbs + rb) * wins + w
        order = jnp.argsort(brick, stable=True)
        brick_s = brick[order]
        cnt = jax.ops.segment_sum(
            jnp.ones((nnz,), jnp.int32), brick_s, num_segments=nbricks
        )
        st_per_brick = -(-cnt // t)
        cell_st = jnp.sum(st_per_brick.reshape(ncells, rbs * wins), axis=1)
        cell_chunks = -(-cell_st // ch)
        per_sg = jnp.sum(cell_chunks.reshape(ns, npan), axis=1)
        bump = jnp.zeros((ncells,), jnp.int32).at[
            jnp.arange(ns) * npan
        ].add((per_sg == 0).astype(jnp.int32))
        cell_chunks = cell_chunks + bump
        lrlc = ((rows % wb) << 7) | (c % win)
        return (
            order,
            brick_s,
            lrlc[order].astype(jnp.int32),
            cnt,
            st_per_brick,
            cell_st,
            cell_chunks,
            jnp.sum(cell_chunks),
        )

    (order, brick_s, packed, cnt, st_per_brick, cell_st, cell_chunks, nc_dev) = (
        phase1(g.indptr, g.indices)
    )
    nc = int(np.asarray(nc_dev))  # one scalar fetch

    @jax.jit
    def phase2(order, brick_s, packed, cnt, st_per_brick, cell_st, cell_chunks, vals):
        val_s = vals[:nnz].astype(jnp.float32)[order]
        brick_edge_off = jnp.cumsum(cnt) - cnt
        brick_st_cum = jnp.cumsum(st_per_brick)
        cell_pad = cell_chunks * ch
        cell_pad_off = jnp.cumsum(cell_pad) - cell_pad
        cell_real_off = jnp.cumsum(cell_st) - cell_st

        chunk_cell = jnp.repeat(
            jnp.arange(ncells, dtype=jnp.int32), cell_chunks, total_repeat_length=nc
        )
        chunk_panel = chunk_cell % npan
        chunk_sgroup = chunk_cell // npan

        st_ix = jnp.arange(nc * ch, dtype=jnp.int32)
        st_cell = chunk_cell[st_ix // ch]
        jj = st_ix - cell_pad_off[st_cell]
        real = jj < cell_st[st_cell]
        total_st = brick_st_cum[-1]
        rst = jnp.minimum(
            cell_real_off[st_cell] + jj, jnp.maximum(total_st - 1, 0)
        )
        bk = jnp.searchsorted(brick_st_cum, rst, side="right").astype(jnp.int32)
        k = rst - (brick_st_cum[bk] - st_per_brick[bk])
        meta = jnp.where(
            real,
            (bk % wins)
            | (((bk // wins) % rbs) << 6)
            | ((k == 0).astype(jnp.int32) << 9)
            | ((k == st_per_brick[bk] - 1).astype(jnp.int32) << 10),
            0,
        ).astype(jnp.int32)

        e = brick_edge_off[bk][:, None] + (
            k[:, None] * t + jnp.arange(t, dtype=jnp.int32)[None, :]
        )
        valid = real[:, None] & (e < (brick_edge_off[bk] + cnt[bk])[:, None])
        ec = jnp.clip(e, 0, max(nnz - 1, 0))
        idx = jnp.where(valid, packed[ec], 0).astype(jnp.int32)
        val = jnp.where(valid, val_s[ec], 0.0)
        return (
            chunk_panel,
            chunk_sgroup,
            meta.reshape(nc, 1, ch),
            idx.reshape(nc, ch, t),
            val.reshape(nc, ch, t),
        )

    cp, cs, meta, idx, val = phase2(
        order, brick_s, packed, cnt, st_per_brick, cell_st, cell_chunks, g.values
    )
    return BrickSchedule(
        chunk_panel=cp,
        chunk_sgroup=cs,
        meta=meta,
        idx=idx,
        val=val,
        num_nodes=v,
        num_cols=v,
        sg=sg,
        panel=panel,
        wb=wb,
        win=win,
    )


def bricks_stats(sched: BrickSchedule) -> dict:
    """Occupancy diagnostics (host): slot fill rate, chunks, flop estimate."""
    val = np.asarray(sched.val)
    meta = np.asarray(sched.meta)
    live = int((val != 0).sum())
    slots = val.size
    flushes = int(((meta >> 10) & 1).sum())
    return {
        "chunks": sched.num_chunks,
        "subtiles": meta.size,
        "slots": slots,
        "live_edges": live,
        "fill": live / max(slots, 1),
        "bricks": flushes,
        "densify_tflop": meta.size * sched.slots * sched.wb * sched.win * 2 / 1e12,
        "flush_tflop": flushes * sched.wb * sched.win * 256 * 2 / 1e12,
    }
