"""Pallas CBSR expansion/sampling kernels.

The XLA one-hot formulations of `cbsr_densify` / `cbsr_sample`
materialize a (block, k, D) one-hot through HBM — ~k× more traffic than
the information content. These kernels keep the expansion in VMEM:

  densify: out[r, sel[r,l]] = vals[r,l]   — k select+accumulate passes
           over a (RB, D) VMEM block; traffic = read (V,k)·2 + write (V,D)
  sample:  out[r, l] = z[r, sel[r,l]]     — k masked row-sums

They form a custom-VJP pair (sample is densify's transpose and vice
versa), mirroring how `kernels/spmm_maxk.cu` scatters and
`spmm_maxk_backward.cu` samples — but per row-block on the VPU instead
of per edge with atomics.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_BLOCK = 512

# Mosaic unrolls the k select/accumulate passes, keeping up to k (RB, D)
# mask temporaries live in scoped VMEM (16 MB limit — measured OOM at
# k=64·RB=512·D=256: 23.4 MB). Cap the row block so k·RB·D·4 stays
# within budget.
_VMEM_BUDGET = 8 << 20


def _rows_per_block(k: int, d: int, v: int) -> int:
    rb = min(ROWS_PER_BLOCK, _VMEM_BUDGET // max(k * d * 4, 1))
    rb = max(rb // 8 * 8, 8)
    return min(rb, max(v // 8 * 8, 8)) if v >= 8 else v


def _densify_kernel(k: int, vals_ref, sel_ref, out_ref):
    rb, d = out_ref.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (rb, d), 1)
    acc = jnp.zeros((rb, d), out_ref.dtype)
    for l in range(k):
        m = (sel_ref[:, l : l + 1] == iota).astype(out_ref.dtype)
        acc = acc + vals_ref[:, l : l + 1].astype(out_ref.dtype) * m
    out_ref[:] = acc


def _sample_kernel(k: int, z_ref, sel_ref, out_ref):
    rb, d = z_ref.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (rb, d), 1)
    z = z_ref[:]
    for l in range(k):
        m = (sel_ref[:, l : l + 1] == iota).astype(z.dtype)
        out_ref[:, l] = jnp.sum(z * m, axis=1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _densify_raw(vals, sel, dim, interpret=False):
    v, k = vals.shape
    rb = _rows_per_block(k, dim, v)
    pad = (-v) % rb
    if pad:
        vals = jnp.pad(vals, ((0, pad), (0, 0)))
        sel = jnp.pad(sel, ((0, pad), (0, 0)))
    vp = v + pad
    out = pl.pallas_call(
        functools.partial(_densify_kernel, k),
        grid=(vp // rb,),
        in_specs=[
            pl.BlockSpec((rb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vp, dim), vals.dtype),
        interpret=interpret,
    )(vals, sel)
    return out[:v]


@functools.partial(jax.jit, static_argnums=(2, 3))
def _sample_raw(z, sel, k, interpret=False):
    v, d = z.shape
    rb = _rows_per_block(k, d, v)
    pad = (-v) % rb
    if pad:
        z = jnp.pad(z, ((0, pad), (0, 0)))
        sel = jnp.pad(sel, ((0, pad), (0, 0)))
    vp = v + pad
    out = pl.pallas_call(
        functools.partial(_sample_kernel, k),
        grid=(vp // rb,),
        in_specs=[
            pl.BlockSpec((rb, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vp, k), z.dtype),
        interpret=interpret,
    )(z, sel)
    return out[:v]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def densify_pallas(vals: jax.Array, sel: jax.Array, dim: int) -> jax.Array:
    return _densify_raw(vals, sel, dim)


def _densify_fwd(vals, sel, dim):
    return _densify_raw(vals, sel, dim), sel


def _densify_bwd(dim, sel, g):
    import numpy as np

    return _sample_raw(g, sel, sel.shape[1]), np.zeros(
        sel.shape, jax.dtypes.float0
    )


densify_pallas.defvjp(_densify_fwd, _densify_bwd)


@jax.custom_vjp
def sample_pallas(z: jax.Array, sel: jax.Array) -> jax.Array:
    return _sample_raw(z, sel, sel.shape[1])


def _sample_fwd(z, sel):
    return _sample_raw(z, sel, sel.shape[1]), (sel, z.shape[1])


def _sample_bwd(res, g):
    import numpy as np

    sel, d = res
    return _densify_raw(g, sel, d), np.zeros(sel.shape, jax.dtypes.float0)


sample_pallas.defvjp(_sample_fwd, _sample_bwd)


def pallas_cbsr_available() -> bool:
    return (
        jax.default_backend() == "tpu"
        and not os.environ.get("MAXK_TPU_DISABLE_PALLAS")
    )
