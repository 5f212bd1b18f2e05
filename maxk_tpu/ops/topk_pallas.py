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


def _take_mask(k: int, x):
    """Tie-aware top-k selection mask for one row block (shared by the
    CBSR kernel and the mask-only kernel): exact-f32 radix threshold
    search + first-(k−#greater) tie resolution in column order. bf16
    inputs are upcast in VMEM (exact); the threshold search runs on the
    f32 bit pattern either way."""
    if x.dtype != jnp.float32:
        x = x.astype(jnp.float32)
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
    return take, excl_cumsum


def _topk_kernel(k: int, x_ref, vals_ref, sel_ref):
    x = x_ref[:]
    rb, d = x.shape
    take, excl_cumsum = _take_mask(k, x)

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


def _mask_kernel(k: int, x_ref, out_ref, take_ref):
    x = x_ref[:]
    take, _ = _take_mask(k, x)
    take_f = take.astype(jnp.float32)
    # output dtype follows the input (bf16 in → bf16 out): at
    # ogbn-products scale the f32 (V, D) in/out pair alone is 5 GB and
    # OOMs next to the hybrid strip (r3 suite, kernel_bench masked arm)
    out_ref[:] = (x.astype(jnp.float32) * take_f).astype(out_ref.dtype)
    # 0/1 is exact in bf16; halves the mask residual's HBM traffic
    take_ref[:] = take_f.astype(jnp.bfloat16)


MASK_ROWS_PER_BLOCK = 512  # no per-j extraction state → bigger blocks fit


@functools.partial(jax.jit, static_argnums=(1, 2))
def _mask_pallas_raw(x: jax.Array, k: int, interpret: bool = False):
    v, d = x.shape
    rb = min(MASK_ROWS_PER_BLOCK, v)
    pad = (-v) % rb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)), constant_values=-np.inf)
    vp = v + pad
    out, take = pl.pallas_call(
        functools.partial(_mask_kernel, k),
        grid=(vp // rb,),
        in_specs=[
            pl.BlockSpec((rb, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((rb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((vp, d), x.dtype),
            jax.ShapeDtypeStruct((vp, d), jnp.bfloat16),
        ),
        interpret=interpret,
    )(x)
    return out[:v], take[:v]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def maxk_mask_pallas(x: jax.Array, k: int) -> jax.Array:
    """MaxK activation `x * topk_mask(x)` — threshold-only Pallas kernel.

    The production single-chip path: `densify(topk_cbsr(x)) ≡ x ⊙ mask`,
    so when no compact CBSR is needed (hybrid/dense aggregation, no
    cross-chip collectives) the per-slot compaction loop — ~2/3 of the
    CBSR kernel's VPU work — is skipped entirely. Tie semantics match
    `topk_cbsr_pallas` (exactly k survivors per row). Role of the
    reference's `MaxK(Function)` (`maxk_models_integrated.py:28-43`)."""
    return _mask_pallas_raw(x, k)[0]


def _mask_fwd(x, k):
    y, take = _mask_pallas_raw(x, k)
    return y, take


def _mask_bwd(k, take, g):
    return (g * take.astype(g.dtype),)


maxk_mask_pallas.defvjp(_mask_fwd, _mask_bwd)


def maxk_mask_fast(x: jax.Array, k: int) -> jax.Array:
    """Masked MaxK via the Pallas threshold kernel on TPU, lax.top_k
    elsewhere (see `maxk_cbsr_fast` for the dispatch rationale)."""
    import os

    if (
        jax.default_backend() == "tpu"
        and x.ndim == 2
        and not os.environ.get("MAXK_TPU_DISABLE_PALLAS")
    ):
        return maxk_mask_pallas(x, k)
    from maxk_tpu.sparse.cbsr import CBSR, cbsr_densify, maxk_cbsr

    c = maxk_cbsr(x, k)
    return cbsr_densify(c, x.shape[-1])


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
