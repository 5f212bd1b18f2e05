#!/usr/bin/env python
"""Kernel benchmark — the `kernels/main.cu` protocol on TPU.

Protocol (mirrors the reference): reddit-scale graph, dim_origin=256,
random CBSR features at k (seeded, `main.cu:75`), 4 warmup + timed runs
per kernel (`kernels/spmm_base.h:34-63`), dense baseline timed alongside
(the cuSPARSE role, `kernels/spmm_cusparse.cu`).

All inputs are generated ON DEVICE (`maxk_tpu.data.device_gen`) — the
remote-TPU tunnel in this environment moves host↔device data at ~MB/s,
so uploads are avoided entirely. Timing uses queued-calls + scalar-fetch
sync (see `maxk_tpu.bench.micro` methodology notes).

Headline metric: forward effective nnz/s = E / t_fwd at k=32.
vs_baseline compares against the A100 spmm_maxk estimate derived in
BASELINE.md: cuSPARSE CSR-SpMM f32 D=256 on A100 ≈ 1KB/edge at ~1.6 TB/s
≈ 1.55 Gnnz/s, × the published 2.55× speedup @k=32 (`README.md:136`)
≈ 4.0 Gnnz/s.

Prints ONE JSON line to stdout; everything else goes to stderr.
"""

import argparse
import json
import sys

import numpy as np

A100_MAXK_K32_NNZ_S = 4.0e9  # derived estimate, see module docstring


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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

    jax.config.update("jax_compilation_cache_dir", "/root/.maxk_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from maxk_tpu.bench.micro import roundtrip_latency, timeit
    from maxk_tpu.data.datasets import DATASETS
    from maxk_tpu.data.device_gen import rmat_graph_device
    from maxk_tpu.ops.spgemm import maxk_spgemm, spmm
    from maxk_tpu.sparse.cbsr import CBSR, cbsr_densify
    from maxk_tpu.sparse.csr import with_norm
    from maxk_tpu.sparse.graph import Graph
    from maxk_tpu.sparse.meta import build_edge_tiles_device

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    scale = args.scale
    if scale == 0.0:
        # tiles_scan is memory-bounded, so full reddit scale fits on one
        # chip; CPU CI keeps a small slice
        scale = 1.0 if on_tpu else 0.02
    spec = DATASETS[args.graph]
    v = max(int(spec.num_nodes * scale), 64)
    e_target = max(int(spec.num_edges * scale), 256)
    g = rmat_graph_device(v, e_target, seed=123)
    e_real = int(np.asarray(jnp.sum(g.values != 0)))
    log(f"graph {args.graph} x{scale}: V={v} E={g.nnz} (live {e_real})")

    mode = args.mode
    if mode == "auto":
        # the production dispatch rule, resolved per graph: strip hybrid
        # where its matmuls beat the gather wall, tiles elsewhere
        from maxk_tpu.sparse.hybrid import hybrid_profitable

        if on_tpu:
            mode = "hybrid" if hybrid_profitable(v, e_real, args.dim) \
                else "tiles_scan"
        else:
            mode = "segsum"
    log(f"backend={backend} mode={mode} scale={scale} "
        f"latency={roundtrip_latency()*1e3:.0f}ms")

    from maxk_tpu.sparse.csr import csr_transpose_device

    hybrid = None
    if mode == "hybrid":
        from maxk_tpu.sparse.hybrid import (
            auto_strip_cols,
            build_hybrid_device,
            degree_perm_device,
            permute_csr_device,
        )

        g = permute_csr_device(g, degree_perm_device(g))
        hybrid = build_hybrid_device(
            g, s_cols=auto_strip_cols(v, e_live=e_real), norm="right"
        )
        log(f"hybrid strip {hybrid.strip.shape} {hybrid.strip.dtype}")
    g = with_norm(g, "right")
    # right-norm breaks value symmetry even on symmetric structure, so the
    # backward (A^T) arm gets a real device transpose + its own schedule
    # (the hybrid needs neither: its symmetric core self-transposes)
    gt = g if mode == "hybrid" else csr_transpose_device(g)
    # the baseline arm is the library path (tiles_scan on TPU): the
    # protocol compares the production kernel against it, mirroring
    # main.cu's kernel-vs-cuSPARSE comparison
    base_mode = "segsum" if not on_tpu or mode == "segsum" else "tiles_scan"
    tiles = tiles_t = None
    if mode in ("pallas", "tiles_xla", "tiles_scan") or base_mode == "tiles_scan":
        tiles = build_edge_tiles_device(g)
        tiles_t = tiles if mode == "hybrid" else build_edge_tiles_device(gt)
    graph = Graph(csr=g, csc=gt, tiles=tiles, tiles_t=tiles_t, hybrid=hybrid)

    v_pad = v
    k, dim = args.k, args.dim
    key = jax.random.PRNGKey(123)
    vals = jax.jit(lambda: jax.random.normal(key, (v_pad, k), jnp.float32))()
    sel = jax.jit(
        lambda: jax.random.randint(
            jax.random.fold_in(key, 1), (v_pad, k), 0, dim, jnp.int32
        )
    )()
    cbsr = CBSR(values=vals, selector=sel)
    x_dense = jax.jit(lambda c: cbsr_densify(c, dim))(cbsr)

    # NOTE: the graph is a jit ARGUMENT, never a closure — closures embed
    # the (GB-scale) tile tables as HLO constants, which breaks the
    # remote-compile tunnel (HTTP 413) and bloats every executable
    fwd = jax.jit(
        lambda g_, c: maxk_spgemm(g_, c, dim=dim, mode=mode,
                                  compute_dtype=jnp.bfloat16)
    )
    t_fwd = timeit(fwd, graph, cbsr, iters=8)
    log(f"maxk fwd k={k}: {t_fwd*1e3:.3f} ms -> {e_real/t_fwd/1e9:.3f} Gnnz/s")

    baseline = jax.jit(lambda g_, x: spmm(g_, x, mode=base_mode))
    t_base = timeit(baseline, graph, x_dense, iters=8)
    log(f"dense f32 baseline ({base_mode}): {t_base*1e3:.3f} ms "
        f"({e_real/t_base/1e9:.3f} Gnnz/s)")

    # backward (SSpMM role): vjp at a random cotangent
    ct = jax.jit(
        lambda: jax.random.normal(jax.random.fold_in(key, 2), (v_pad, dim))
    )()
    grad_fn = jax.jit(
        jax.grad(
            lambda va, g_, s_, c_: jnp.vdot(
                maxk_spgemm(g_, CBSR(va, s_), dim=dim, mode=mode,
                            compute_dtype=jnp.bfloat16),
                c_,
            )
        )
    )
    t_bwd = timeit(grad_fn, vals, graph, sel, ct, iters=8)
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
