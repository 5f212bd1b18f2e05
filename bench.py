#!/usr/bin/env python
"""Kernel benchmark — the `kernels/main.cu` protocol on TPU.

Protocol (mirrors the reference): reddit-scale graph, dim_origin=256,
random CBSR features at k, 4 warmup + 4 timed runs per kernel
(`kernels/spmm_base.h:34-63`), dense baseline timed alongside (the
cuSPARSE role, `kernels/spmm_cusparse.cu`).

Headline metric: forward effective nnz/s = E / t_fwd at k=32 (the
BASELINE.md derivation `nnz/s = E · k / t_fwd` counts CBSR
multiply-accumulates; we report edge-rate E/t and the cbsr rate E·k/t in
detail). vs_baseline compares against the A100 spmm_maxk estimate derived
in BASELINE.md: cuSPARSE CSR-SpMM f32 D=256 on A100 is ~1KB/edge at
~1.6 TB/s effective ≈ 1.55 Gnnz/s, × the published 2.55× speedup @k=32
(`README.md:136`) ≈ 4.0 Gnnz/s.

Prints ONE JSON line to stdout; everything else goes to stderr.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

A100_MAXK_K32_NNZ_S = 4.0e9  # derived estimate, see module docstring

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def cached_graph(name: str, scale: float, seed: int = 123):
    from maxk_tpu.data.datasets import DATASETS
    from maxk_tpu.data.io import load_graph_binary, save_graph_binary
    from maxk_tpu.data.synthetic import rmat_graph

    spec = DATASETS[name]
    v = max(int(spec.num_nodes * scale), 64)
    e = max(int(spec.num_edges * scale), 256)
    os.makedirs(CACHE, exist_ok=True)
    prefix = os.path.join(CACHE, f"{name}_s{scale}_seed{seed}")
    if os.path.exists(prefix + ".indptr"):
        return load_graph_binary(prefix)
    t0 = time.time()
    g = rmat_graph(v, e, seed=seed)
    log(f"generated {name} x{scale}: V={g.num_nodes} E={g.nnz} "
        f"({time.time()-t0:.1f}s)")
    save_graph_binary(prefix, np.asarray(g.indptr), np.asarray(g.indices))
    return g


def time_fn(fn, *args, warmup=4, iters=4):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--graph", default="reddit")
    p.add_argument("--scale", type=float, default=0.0)  # 0 = auto
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--mode", default="auto")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from maxk_tpu.ops.dispatch import KernelMode, resolve_mode
    from maxk_tpu.ops.spgemm import maxk_spgemm, spmm
    from maxk_tpu.sparse.cbsr import CBSR, cbsr_densify
    from maxk_tpu.sparse.graph import build_graph

    backend = jax.default_backend()
    has_pallas = False
    try:
        from maxk_tpu.ops.spmm_pallas import spmm_pallas  # noqa: F401

        has_pallas = backend == "tpu"
    except ImportError:
        pass

    scale = args.scale
    if scale == 0.0:
        # full scale only when the Pallas path exists; XLA fallbacks OOM
        # at E~115M with (E, D) intermediates
        scale = 1.0 if has_pallas else 0.05
    mode = args.mode
    if mode == "auto":
        mode = "pallas" if has_pallas else "segsum"
    log(f"backend={backend} mode={mode} scale={scale}")

    g = cached_graph(args.graph, scale)
    e_real = g.nnz
    graph = build_graph(
        g, norm="right", build_tiles=(mode in ("pallas", "tiles_xla"))
    )

    rng = np.random.default_rng(123)  # reference seed (main.cu:75)
    v, k, dim = g.num_nodes, args.k, args.dim
    vals = jnp.asarray(rng.standard_normal((v, k)), jnp.float32)
    # random k-of-dim selectors (reference builds random CBSR the same
    # way, main.cu:120-146); sampling without replacement per row via
    # argsort of random keys
    keys = rng.random((v, dim)).argsort(axis=1)[:, :k].astype(np.int32)
    sel = jnp.asarray(keys)
    cbsr = CBSR(values=vals, selector=sel)
    x_dense = cbsr_densify(cbsr, dim)

    fwd = jax.jit(
        lambda c: maxk_spgemm(graph, c, dim=dim, mode=mode,
                              compute_dtype=jnp.bfloat16)
    )
    t_fwd = time_fn(fwd, cbsr)
    log(f"maxk fwd k={k}: {t_fwd*1e3:.3f} ms -> {e_real/t_fwd/1e9:.3f} Gnnz/s")

    baseline = jax.jit(lambda x: spmm(graph, x, mode=mode))
    t_base = time_fn(baseline, x_dense)
    log(f"dense baseline: {t_base*1e3:.3f} ms")

    # backward (SSpMM role): vjp at a random cotangent
    ct = jnp.asarray(rng.standard_normal((v, dim)), jnp.float32)
    grad_fn = jax.jit(
        jax.grad(
            lambda va: jnp.vdot(
                maxk_spgemm(graph, CBSR(va, sel), dim=dim, mode=mode,
                            compute_dtype=jnp.bfloat16),
                ct,
            )
        )
    )
    t_bwd = time_fn(grad_fn, vals)
    log(f"maxk fwd+bwd: {t_bwd*1e3:.3f} ms")

    nnz_s = e_real / t_fwd
    print(
        json.dumps(
            {
                "metric": f"spmm_maxk fwd nnz/s (reddit x{scale}, k={k}, "
                f"{mode}, {backend})",
                "value": round(nnz_s / 1e9, 4),
                "unit": "Gnnz/s",
                "vs_baseline": round(nnz_s / A100_MAXK_K32_NNZ_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
