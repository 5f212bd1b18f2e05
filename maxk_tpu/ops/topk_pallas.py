"""Pallas row-wise top-k → CBSR kernel (role of `kernels/maxk_kernel.cu`).

The reference runs a warp-per-row 8-iteration binary search on a uint8
threshold with shfl reductions, then ballot/popc compaction
(`maxk_kernel.cu:37-88`) — lossy (float→uint8) and broken for k<19
(`test_bug.py`). The TPU version is exact f32 and fully vectorized:

  1. order-preserving bit transform f32 → uint32 (radix trick);
  2. 32-iteration vectorized binary search on the threshold ACROSS a
     row-block: each iteration is one (RB, D) compare + lane-sum;
  3. tie-aware selection mask (first (k − #greater) elements equal to the
     threshold, matching `jax.lax.top_k` count semantics);
  4. compaction WITHOUT scatter: in-row ranks via a lane cumsum, then a
     one-hot contraction (RB·D·k MACs on the MXU) writes values and
     column indices into the (RB, k) CBSR pair.

Cost/row ≈ 32·D compares + D·k MACs → memory-bound at the (V, D) read,
~10× faster than `lax.top_k`'s sort-based lowering at D=256.

Output order is by column index (like the reference kernel), not by
value; CBSR consumers (densify/sample/spgemm) are order-agnostic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from maxk_tpu.sparse.cbsr import CBSR

ROWS_PER_BLOCK = 256


def _topk_kernel(k: int, x_ref, vals_ref, sel_ref):
    x = x_ref[:]
    rb, d = x.shape
    # order-preserving f32 -> uint32: flip sign bit for positives,
    # all bits for negatives
    bits = pltpu.bitcast(x, jnp.uint32)
    neg = bits >> 31 == 1
    keys = jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))

    # vectorized 32-step binary search for the k-th key per row
    thr = jnp.zeros((rb, 1), jnp.uint32)
    for b in range(31, -1, -1):
        cand = thr | jnp.uint32(1 << b)
        cnt = jnp.sum((keys >= cand).astype(jnp.int32), axis=1, keepdims=True)
        thr = jnp.where(cnt >= k, cand, thr)

    gt = keys > thr
    eq = keys == thr
    n_gt = jnp.sum(gt.astype(jnp.int32), axis=1, keepdims=True)
    # Mosaic has no cumsum lowering: exclusive lane prefix-sums as a
    # matmul against a strictly-lower-triangular ones matrix (MXU)
    ci = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    tri = (ci < cj).astype(jnp.float32)  # tri[c', c] = 1 iff c' < c

    def excl_cumsum(m):
        return jax.lax.dot(m, tri, preferred_element_type=jnp.float32)

    eq_f = eq.astype(jnp.float32)
    eq_ex = excl_cumsum(eq_f)
    take = gt | (eq & (eq_ex < (k - n_gt).astype(jnp.float32)))

    # compaction: rank within row, then k masked row-sums (batched
    # dot_general trips a Mosaic attr-parse bug on this toolchain, so the
    # extraction stays on the VPU: 2·k (rb, d) select+reduce passes)
    take_i = take.astype(jnp.float32)
    rank = excl_cumsum(take_i)  # exclusive, in [0, k)
    rank_i = rank.astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rb, d), 1).astype(jnp.float32)
    xm = x * take_i
    cm = cols * take_i
    for j in range(k):
        m = ((rank_i == j) & take).astype(jnp.float32)
        vals_ref[:, j] = jnp.sum(xm * m, axis=1)
        sel_ref[:, j] = jnp.sum(cm * m, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _topk_pallas_raw(x: jax.Array, k: int, interpret: bool = False):
    v, d = x.shape
    rb = min(ROWS_PER_BLOCK, v)
    pad = (-v) % rb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)), constant_values=-np.inf)
    vp = v + pad
    vals, sel = pl.pallas_call(
        functools.partial(_topk_kernel, k),
        grid=(vp // rb,),
        in_specs=[
            pl.BlockSpec((rb, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((rb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((vp, k), jnp.float32),
            jax.ShapeDtypeStruct((vp, k), jnp.int32),
        ),
        interpret=interpret,
    )(x)
    return vals[:v], sel[:v]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def topk_cbsr_pallas(x: jax.Array, k: int):
    """(vals, sel) CBSR pair; differentiable like lax.top_k (cotangent
    scatters to the selected positions)."""
    return _topk_pallas_raw(x, k)


def _topk_fwd(x, k):
    vals, sel = _topk_pallas_raw(x, k)
    return (vals, sel), (sel, x.shape[1])


def _topk_bwd(k, res, cts):
    sel, d = res
    g_vals, _ = cts
    # scatter-free expansion back to (V, D) — cbsr_densify IS this
    # contraction, blocked so no (V, k, D) one-hot materializes at once
    from maxk_tpu.sparse.cbsr import cbsr_densify

    gx = cbsr_densify(CBSR(values=g_vals, selector=sel), d)
    return (gx,)


topk_cbsr_pallas.defvjp(_topk_fwd, _topk_bwd)


def maxk_cbsr_fast(x: jax.Array, k: int) -> CBSR:
    """CBSR via the Pallas kernel on TPU, lax.top_k elsewhere.

    MAXK_TPU_DISABLE_PALLAS=1 forces the lax.top_k path — needed when
    tracing for non-TPU devices while the default backend is TPU (e.g.
    the virtual-CPU-mesh dry run)."""
    import os

    if (
        jax.default_backend() == "tpu"
        and x.ndim == 2
        and not os.environ.get("MAXK_TPU_DISABLE_PALLAS")
    ):
        vals, sel = topk_cbsr_pallas(x, k)
        return CBSR(values=vals, selector=sel)
    from maxk_tpu.sparse.cbsr import maxk_cbsr

    return maxk_cbsr(x, k)
