"""Pallas brick SpMM — the TPU-native production aggregation kernel.

Computes Y = A @ X over a `BrickSchedule` (see `maxk_tpu.sparse.bricks`).
This is the round-2 replacement for the XLA `spmm_tiles_scan` path, which
is pinned at the ~7 ns/row XLA gather wall (docs/PERF.md): instead of
gathering X rows per edge, each 128-edge subtile is densified into a
(WB, WIN) brick with two exact one-hot compare matmuls, and each finished
brick multiplies a VMEM-resident X window on the MXU:

    A_brick += OHr(WB,T) . contract_T . (OHc * val)(WIN,T)
    Y[rb*WB :] += A_brick @ X[win*WIN :]        (on brick end)

Role of the reference's `spmm_kernel_opt2_sparse_v3`
(`/root/reference/kernels/spmm_maxk.cu:17-106`): same streaming-edges,
accumulate-into-fast-memory, flush-on-boundary structure, but the
per-lane shared-memory scatter + atomicAdd flush become MXU contractions
and sequential VMEM revisiting (grid steps of one core run in order).

Grid: one step per chunk (CH subtiles). The Y supergroup block is
revisited consecutively (accumulates in VMEM, written once per
supergroup); the X panel is re-fetched only when the schedule crosses a
panel boundary. Per-subtile metadata rides in SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maxk_tpu.sparse.bricks import BrickSchedule


def _brick_kernel(
    ch: int,
    t: int,
    wb: int,
    win: int,
    precision,
    cp_ref,
    cs_ref,
    meta_ref,
    idx_ref,
    val_ref,
    x_ref,
    y_ref,
    brick_ref,
):
    i = pl.program_id(0)
    prev_sg = cs_ref[jnp.maximum(i - 1, 0)]
    first_visit = jnp.logical_or(i == 0, cs_ref[i] != prev_sg)

    @pl.when(first_visit)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (wb, t), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (win, t), 0)

    for j in range(ch):  # static unroll: all slices below are static
        m = meta_ref[0, 0, j]
        sl = idx_ref[0, j : j + 1, :]  # (1, T) int32
        v = val_ref[0, j : j + 1, :]  # (1, T) f32
        lr = sl >> 7
        lc = sl & 0x7F
        ohr = (row_iota == lr).astype(jnp.float32)  # (WB, T)
        wohc = jnp.where(col_iota == lc, v, 0.0)  # (WIN, T)
        contrib = jax.lax.dot_general(
            ohr,
            wohc,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # (WB, WIN)

        first = (m >> 9) & 1
        end = (m >> 10) & 1

        @pl.when(first == 1)
        def _():
            brick_ref[:] = contrib

        @pl.when(first == 0)
        def _():
            brick_ref[:] = brick_ref[:] + contrib

        @pl.when(end == 1)
        def _():
            rb = (m >> 6) & 7
            w = m & 0x3F
            xw = x_ref[pl.ds(pl.multiple_of(w * win, win), win), :]
            yb = jnp.dot(
                brick_ref[:].astype(xw.dtype),
                xw,
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            r0 = pl.multiple_of(rb * wb, wb)
            y_ref[pl.ds(r0, wb), :] += yb


@functools.partial(jax.jit, static_argnums=(2,))
def _spmm_bricks_raw(sched: BrickSchedule, x: jax.Array, interpret: bool):
    v, d = x.shape
    assert v == sched.num_cols, (v, sched.num_cols)
    npan = sched.num_panels
    nsg = sched.num_sgroups
    panel, sg, wb, win = sched.panel, sched.sg, sched.wb, sched.win
    ch, t = sched.ch, sched.slots
    nc = sched.num_chunks

    # f32 x => full-precision MXU passes (the cuSPARSE-parity arm, matches
    # the reference's float kernels); bf16 x => single-pass MXU (the
    # TPU-native production arm; one-hots stay exact, values round ~2^-8)
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    )
    xp = jnp.pad(x, ((0, npan * panel - v), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, ch), lambda i, cp, cs: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, ch, t), lambda i, cp, cs: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, ch, t), lambda i, cp, cs: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (panel, d), lambda i, cp, cs: (cp[i], 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (sg, d), lambda i, cp, cs: (cs[i], 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((wb, win), jnp.float32)],
    )
    y = pl.pallas_call(
        functools.partial(_brick_kernel, ch, t, wb, win, precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsg * sg, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nc * ch * t * wb * win,
            bytes_accessed=nc * ch * t * 8 + nsg * sg * d * 4 + v * d * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(sched.chunk_panel, sched.chunk_sgroup, sched.meta, sched.idx, sched.val, xp)
    return y[: sched.num_nodes].astype(x.dtype)


def spmm_bricks(
    sched: BrickSchedule, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """Y = A @ x via the brick kernel. f32 accumulation, returns x.dtype.

    `x` may be f32 or bf16; the one-hot densification is exact in either
    (one-hots are 0/1), edge values ride at schedule precision (f32) and
    the brick->window matmul runs at x.dtype with f32 accumulation.
    """
    return _spmm_bricks_raw(sched, x, interpret)
