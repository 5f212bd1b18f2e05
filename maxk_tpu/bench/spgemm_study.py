"""SpGEMM-pruning study — TPU analog of the reference's nsparse benchmarks.

The reference's "spgemm-prunning" study (`spgemm_comparison_test*.cu`,
`spgemm_compare_baseline*.cu`) measures adjacency × *pruned* (sparse)
feature matrix at feature sparsity ∈ {0.5, 0.25, 0.125, 0.0625}, dim 256,
comparing hash-SpGEMM (±AIA) against `cusparseSpGEMM`, with GFLOPS
accounting `flop = Σ_(i,j)∈A 2·nnz(X[j,:])` (`spgemm_comparison_test.cu:
36-102`).

On TPU the competing strategies for A @ X_pruned are:

  dense    — densify X, bf16 MXU SpMM (brute force; the TPU's cuSPARSE)
  cbsr     — the MaxK CBSR path (this framework's hash-SpGEMM role):
             k = sparsity·dim compressed columns, compact backward
  segsum   — XLA gather+segment_sum reference

Usage: python -m maxk_tpu.bench.spgemm_study [--graph reddit --scale 0.02]
Emits per-(sparsity, strategy) time + effective GFLOPS, JSON to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

SPARSITIES = [0.5, 0.25, 0.125, 0.0625]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--graph", default="reddit")
    p.add_argument("--scale", type=float, default=0.02)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--mode", default="segsum")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.maxk_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from maxk_tpu.bench.micro import timeit
    from maxk_tpu.data.datasets import DATASETS
    from maxk_tpu.data.device_gen import rmat_graph_device
    from maxk_tpu.ops.spgemm import maxk_spgemm, spmm
    from maxk_tpu.sparse.cbsr import CBSR, cbsr_densify
    from maxk_tpu.sparse.csr import with_norm
    from maxk_tpu.sparse.graph import Graph

    spec = DATASETS[args.graph]
    v = max(int(spec.num_nodes * args.scale), 64)
    e_target = max(int(spec.num_edges * args.scale), 256)
    g = with_norm(rmat_graph_device(v, e_target, seed=123), "none")
    e_real = int(np.asarray(jnp.sum(g.values != 0)))
    tiles = None
    if args.mode in ("pallas", "tiles_xla", "tiles_scan"):
        from maxk_tpu.sparse.meta import build_edge_tiles_device

        tiles = build_edge_tiles_device(g)
    graph = Graph(csr=g, csc=g, tiles=tiles, tiles_t=tiles)
    log(f"{args.graph} x{args.scale}: V={v} E(live)={e_real} dim={args.dim}")

    key = jax.random.PRNGKey(123)
    results = []
    for sp in SPARSITIES:
        k = max(int(args.dim * sp), 1)
        vals = jax.jit(
            lambda: jax.random.normal(jax.random.fold_in(key, k), (v, k))
        )()
        sel = jax.jit(
            lambda: jax.random.randint(
                jax.random.fold_in(key, 1000 + k), (v, k), 0, args.dim, jnp.int32
            )
        )()
        cbsr = CBSR(values=vals, selector=sel)
        flops = 2.0 * e_real * k  # reference accounting

        x_dense = jax.jit(lambda c: cbsr_densify(c, args.dim))(cbsr)
        t_dense = timeit(
            jax.jit(
                lambda g_, x: spmm(g_, x.astype(jnp.bfloat16), mode=args.mode)
            ),
            graph,
            x_dense,
            iters=4,
        )
        t_cbsr = timeit(
            jax.jit(
                lambda g_, c: maxk_spgemm(
                    g_, c, dim=args.dim, mode=args.mode,
                    compute_dtype=jnp.bfloat16,
                )
            ),
            graph,
            cbsr,
            iters=4,
        )
        rec = {
            "sparsity": sp,
            "k": k,
            "dense_ms": t_dense * 1e3,
            "cbsr_ms": t_cbsr * 1e3,
            "dense_gflops": flops / t_dense / 1e9,
            "cbsr_gflops": flops / t_cbsr / 1e9,
        }
        log(f"  sparsity {sp}: dense {t_dense*1e3:.2f} ms "
            f"({rec['dense_gflops']:.1f} GF/s) | cbsr {t_cbsr*1e3:.2f} ms "
            f"({rec['cbsr_gflops']:.1f} GF/s)")
        results.append(rec)
    print(json.dumps({"graph": args.graph, "V": v, "E": e_real,
                      "results": results}))
    return results


if __name__ == "__main__":
    main()
