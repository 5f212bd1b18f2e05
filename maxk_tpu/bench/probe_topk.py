"""Real-chip probe for the MaxK activation kernels (VERDICT #6 target:
<=3 ms at (262144, 256, 32) vs 8.67 ms round-1 CBSR kernel, 11.55 ms
lax.top_k).

Validates + times, on the live TPU:
  - lax.top_k reference
  - topk_cbsr_pallas (CBSR pair: search + compaction loop)
  - maxk_mask_pallas (threshold-only; the single-chip production path)
Also probes whether Mosaic accepts a lane-wise take_along_axis inside a
kernel (would collapse the CBSR compaction loop to one gather).

Usage: python -m maxk_tpu.bench.probe_topk [--v 262144 --d 256 --k 32]
"""

from __future__ import annotations

import argparse
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--v", type=int, default=262144)
    p.add_argument("--d", type=int, default=256)
    p.add_argument("--k", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.maxk_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from maxk_tpu.bench.micro import roundtrip_latency, timeit
    from maxk_tpu.ops.topk_pallas import (
        _mask_pallas_raw,
        _topk_pallas_raw,
        maxk_mask_pallas,
    )
    from maxk_tpu.sparse.cbsr import CBSR, cbsr_densify

    v, d, k = args.v, args.d, args.k
    log(f"backend={jax.default_backend()} rtt={roundtrip_latency()*1e3:.0f}ms "
        f"shape=({v},{d}) k={k}")
    x = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (v, d), jnp.float32)
    )()

    # --- validate on a slice (full-array compare is host-transfer-bound)
    xs = x[:4096]
    vals, sel = _topk_pallas_raw(xs, k)
    y_mask, take = _mask_pallas_raw(xs, k)
    ref_dense = jax.jit(
        lambda xx: cbsr_densify(
            CBSR(values=jax.lax.top_k(xx, k)[0],
                 selector=jax.lax.top_k(xx, k)[1].astype(jnp.int32)), d)
    )(xs)
    d1 = float(jnp.max(jnp.abs(
        cbsr_densify(CBSR(values=vals, selector=sel), d) - ref_dense)))
    d2 = float(jnp.max(jnp.abs(y_mask - ref_dense)))
    ksum = float(jnp.max(jnp.abs(
        jnp.sum(take.astype(jnp.float32), axis=1) - k)))
    log(f"validate: cbsr max_abs={d1:.2e} mask max_abs={d2:.2e} "
        f"mask-k-exact={ksum:.1e}")
    if d1 > 1e-5 or d2 > 1e-5 or ksum > 0:
        log("VALIDATION FAILED")
        sys.exit(1)

    # --- timing
    f_lax = jax.jit(lambda xx: jax.lax.top_k(xx, k)[0])
    t = timeit(f_lax, x)
    log(f"lax.top_k:        {t*1e3:.2f} ms")
    f_cbsr = jax.jit(lambda xx: _topk_pallas_raw(xx, k)[0])
    t = timeit(f_cbsr, x)
    log(f"topk_cbsr_pallas: {t*1e3:.2f} ms")
    f_mask = jax.jit(lambda xx: maxk_mask_pallas(xx, k))
    t = timeit(f_mask, x)
    log(f"maxk_mask_pallas: {t*1e3:.2f} ms")
    # fwd+bwd of the mask activation (the training path)
    f_mb = jax.jit(jax.grad(lambda xx: jnp.sum(maxk_mask_pallas(xx, k) ** 2)))
    t = timeit(f_mb, x)
    log(f"mask fwd+bwd:     {t*1e3:.2f} ms")

    # --- Mosaic lane-gather probe (informational)
    try:
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def gk(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

        rb = 256
        idx = jnp.tile(jnp.arange(k, dtype=jnp.int32)[None], (rb, 1))
        out = pl.pallas_call(
            gk,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((rb, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rb, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rb, k), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rb, k), jnp.float32),
        )(x[:rb], idx)
        ok = bool(jnp.allclose(out, x[:rb, :k]))
        log(f"mosaic take_along_axis(axis=1) probe: COMPILES, correct={ok}")
    except Exception as e:  # noqa: BLE001
        log(f"mosaic take_along_axis(axis=1) probe: REJECTED "
            f"({type(e).__name__}: {str(e)[:200]})")


if __name__ == "__main__":
    main()
