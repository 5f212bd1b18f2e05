"""int8 strip probe — the one reference idea with TPU upside left untried.

The reference quantizes features to uint8 inside its top-k kernel
(`kernels/maxk_kernel.cu:23-96`, lossy by design); the TPU analog worth
money is the HYBRID STRIP in int8:

  - the strip holds RAW symmetric edge values (uniform weights after
    dedup → small integers, usually exactly 1.0), so an int8 strip is
    EXACT, not quantized;
  - int8 halves strip HBM: at fixed budget the strip can be 2× wider,
    absorbing tail edges (the tail is ~77% of hybrid time at reddit);
  - int8×int8→int32 may run at 2× the bf16 MXU rate.

The int8 matmul needs both operands int8: features quantize per-COLUMN
(y[:,d] = s_d · (W @ xq[:,d]) — the scale folds out of the contraction
exactly), which is the lossy part this probe quantifies.

Measures, at strip-like shapes:
  A. matmul rate: int8×int8→int32 vs bf16×bf16→f32 (same shapes)
  B. mixed int8×bf16 (does XLA hit a fast path or silently convert?)
  C. per-column quantization error of masked maxk features
  D. end-to-end strip-arm time: bf16 strip vs int8 strip + quant/dequant

Usage: python -m maxk_tpu.bench.probe_int8 [--v 233088 --s 16384 --d 256]
"""

from __future__ import annotations

import argparse
import json
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--v", type=int, default=233088)
    p.add_argument("--s", type=int, default=16384)
    p.add_argument("--d", type=int, default=256)
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--platform", default="")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.maxk_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from maxk_tpu.bench.micro import timeit

    v, s, d = args.v, args.s, args.d
    key = jax.random.PRNGKey(123)
    results = {"shapes": {"V": v, "S": s, "D": d}}

    # strip-like operands, generated on device. W is 0/1 at graph density
    # (~2% of slots live at reddit's strip density)
    w8 = jax.jit(
        lambda: (
            jax.random.uniform(key, (v, s)) < 0.02
        ).astype(jnp.int8)
    )()
    w16 = jax.jit(lambda w: w.astype(jnp.bfloat16))(w8)
    x16 = jax.jit(
        lambda: jax.random.normal(
            jax.random.fold_in(key, 1), (v, d)
        ).astype(jnp.bfloat16)
    )()
    x8 = jax.jit(
        lambda x: jnp.clip(
            jnp.round(x.astype(jnp.float32) * 42.0), -127, 127
        ).astype(jnp.int8)
    )(x16)

    flops = 2.0 * v * s * d

    # A. like-for-like matmul rate (the W^T @ x hub-rows contraction)
    f16 = jax.jit(
        lambda w, x: jnp.einsum(
            "vs,vd->sd", w, x, preferred_element_type=jnp.float32
        ).max()
    )
    t16 = timeit(f16, w16, x16, iters=8)
    results["bf16_einsum_ms"] = t16 * 1e3
    results["bf16_tflops"] = flops / t16 / 1e12
    log(f"A. bf16 einsum: {t16*1e3:.2f} ms  {flops/t16/1e12:.1f} TFLOP/s")

    fi8 = jax.jit(
        lambda w, x: jnp.einsum(
            "vs,vd->sd", w, x, preferred_element_type=jnp.int32
        ).max()
    )
    try:
        t8 = timeit(fi8, w8, x8, iters=8)
        results["int8_einsum_ms"] = t8 * 1e3
        results["int8_tflops"] = flops / t8 / 1e12
        results["int8_speedup"] = t16 / t8
        log(f"A. int8 einsum: {t8*1e3:.2f} ms  {flops/t8/1e12:.1f} TOP/s "
            f"({t16/t8:.2f}x vs bf16)")
    except Exception as ex:
        results["int8_einsum_error"] = f"{type(ex).__name__}: {str(ex)[:200]}"
        log(f"A. int8 einsum FAILED: {results['int8_einsum_error']}")

    # B. mixed int8 strip × bf16 features (fast path or silent convert?)
    fmix = jax.jit(
        lambda w, x: jnp.einsum(
            "vs,vd->sd", w.astype(jnp.bfloat16), x,
            preferred_element_type=jnp.float32,
        ).max()
    )
    tmix = timeit(fmix, w8, x16, iters=8)
    results["int8strip_bf16x_ms"] = tmix * 1e3
    log(f"B. int8-strip (converted) x bf16: {tmix*1e3:.2f} ms "
        f"({t16/tmix:.2f}x vs bf16)")

    # C. per-column quantization error of MASKED maxk features (the real
    # input distribution: k of D survive per row)
    from maxk_tpu.sparse.cbsr import maxk_mask

    @jax.jit
    def quant_err(x):
        xm = maxk_mask(x.astype(jnp.float32), args.k)
        scale = jnp.max(jnp.abs(xm), axis=0) / 127.0
        scale = jnp.maximum(scale, 1e-12)
        xq = jnp.clip(jnp.round(xm / scale), -127, 127).astype(jnp.int8)
        xdq = xq.astype(jnp.float32) * scale
        err = jnp.abs(xdq - xm)
        return err.max(), err.mean(), jnp.abs(xm).mean()

    mx, mn, ref = quant_err(x16)
    results["quant_abs_err_max"] = float(mx)
    results["quant_abs_err_mean"] = float(mn)
    results["signal_abs_mean"] = float(ref)
    log(f"C. per-column int8 quant: max_err={float(mx):.4g} "
        f"mean_err={float(mn):.4g} signal_mean={float(ref):.4g}")

    # D. end-to-end strip arm: quantize + int8 matmul + rescale vs bf16
    if "int8_einsum_ms" in results:
        @jax.jit
        def strip_int8(w, x):
            scale = jnp.maximum(jnp.max(jnp.abs(x), axis=0), 1e-12) / 127.0
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / scale), -127, 127
            ).astype(jnp.int8)
            y = jnp.einsum(
                "vs,vd->sd", w, xq, preferred_element_type=jnp.int32
            )
            return (y.astype(jnp.float32) * scale[None, :]).max()

        te2e = timeit(strip_int8, w8, x16, iters=8)
        results["int8_e2e_ms"] = te2e * 1e3
        results["int8_e2e_speedup"] = t16 / te2e
        log(f"D. int8 end-to-end (quant+matmul+rescale): {te2e*1e3:.2f} ms "
            f"({t16/te2e:.2f}x vs bf16 matmul alone)")

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
