"""CBSR — Compressed Balanced Sparse Row feature format.

The reference stores the output of the MaxK nonlinearity as a `(V, k)`
value matrix plus a `(V, k)` uint8 column-selector matrix
(`kernels/maxk_kernel.cu:23-96` builds it on device; the uint8 index is a
known defect — lossy float→uint8 quantization and an illegal-memory-access
bug for k<19, `test_bug.py`). The TPU design keeps float32/bfloat16 values
and an int32 selector (int8 packing is a bandwidth optimization applied
only inside kernels).

On TPU there is no cheap per-lane scatter, so the two conversion
primitives are expressed as *one-hot contractions* that run on the
MXU/VPU over row blocks:

  densify: X[v, sel[v,l]] = vals[v,l]      (V·k·D work, done once per layer)
  sample:  out[v, l] = Z[v, sel[v,l]]      (backward sampling, V·k·D work)

Both cost O(V·k·D) — *independent of E* — which is the scheduling insight
that makes the dense-gather MXU SpMM + compact sampling design beat
per-edge scatter emulation (E·k·D) on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CBSR:
    """values: (V, k) float; selector: (V, k) int32 in [0, D)."""

    values: jax.Array
    selector: jax.Array

    @property
    def k(self) -> int:
        return self.values.shape[-1]

    @property
    def num_rows(self) -> int:
        return self.values.shape[0]


def maxk_cbsr(x: jax.Array, k: int) -> CBSR:
    """Top-k per row → CBSR (role of `kernels/maxk_kernel.cu` `topk`).

    `lax.top_k` is differentiable (its VJP scatters the cotangent back to
    the selected positions), so gradient flows to `x` automatically — this
    is the fused "precomputed-topk" design the reference converged on
    (`spgemmfunction.py:18-136`, `mode_v2.py:21-46`) that avoids a double
    top-k per layer.
    """
    vals, sel = jax.lax.top_k(x, k)
    return CBSR(values=vals, selector=sel.astype(jnp.int32))


def maxk_mask(x: jax.Array, k: int) -> jax.Array:
    """Plain MaxK activation: keep top-k per row, zero the rest.

    Role of `MaxK(Function)` (`maxk_models_integrated.py:28-43`): fwd
    builds a 0/1 mask from top-k, bwd multiplies the gradient by the same
    mask — which is exactly the VJP JAX derives for this composition.
    """
    kth = jax.lax.top_k(x, k)[0][..., -1:]
    return jnp.where(x >= kth, x, jnp.zeros_like(x))


def _onehot_f(sel: jax.Array, dim: int, dtype) -> jax.Array:
    # (..., k) int32 -> (..., k, dim) one-hot, built by iota compare
    iota = jax.lax.broadcasted_iota(jnp.int32, sel.shape + (dim,), sel.ndim)
    return (sel[..., None] == iota).astype(dtype)


def cbsr_densify(
    cbsr: CBSR, dim: int, block_rows: int = 4096, onehot_dtype=None
) -> jax.Array:
    """CBSR → dense (V, dim). Scatter-free: blocked one-hot contraction.

    Equivalent of `prepare_cbsr_format_maxk`'s inverse / the densified
    copy the reference builds for its cuSPARSE baseline
    (`kernels/main.cu:135-146`). The (block, k, dim) one-hot is the
    traffic; `onehot_dtype=jnp.bfloat16` halves it (0/1 values are exact
    in bf16; the contraction still accumulates in the values dtype).
    """
    v = cbsr.num_rows
    from maxk_tpu.ops.cbsr_pallas import densify_pallas, pallas_cbsr_available

    if pallas_cbsr_available():
        # fused VMEM kernel: no (block, k, dim) one-hot HBM round trip
        return densify_pallas(cbsr.values, cbsr.selector, dim)
    odt = onehot_dtype or cbsr.values.dtype
    prec = "highest" if odt == cbsr.values.dtype else None

    def contract(bv, bs):
        oh = _onehot_f(bs, dim, odt)
        return jnp.einsum("vk,vkd->vd", bv.astype(odt), oh, precision=prec).astype(
            cbsr.values.dtype
        )

    if v <= block_rows:
        return contract(cbsr.values, cbsr.selector)
    # pad rows to a multiple of block_rows, scan over blocks
    nb = -(-v // block_rows)
    pad = nb * block_rows - v
    vals = jnp.pad(cbsr.values, ((0, pad), (0, 0)))
    sel = jnp.pad(cbsr.selector, ((0, pad), (0, 0)))
    vals = vals.reshape(nb, block_rows, -1)
    sel = sel.reshape(nb, block_rows, -1)
    out = jax.lax.map(lambda a: contract(*a), (vals, sel))
    return out.reshape(nb * block_rows, dim)[:v]


def cbsr_sample(z: jax.Array, selector: jax.Array) -> jax.Array:
    """Sample dense rows at selector coordinates: out[v,l] = z[v, sel[v,l]].

    Backward-pass primitive: the reference's SSpMM
    (`kernels/spmm_maxk_backward.cu:15-115`) fuses `A^T @ dY` with this
    sampling per *edge*; on TPU we run the dense `A^T @ dY` on the MXU and
    sample per *row* (V·k·D ≪ E·k·D work).
    """
    from maxk_tpu.ops.cbsr_pallas import pallas_cbsr_available, sample_pallas

    if pallas_cbsr_available() and z.ndim == 2:
        return sample_pallas(z, selector)
    return jnp.take_along_axis(z, selector, axis=1)
