"""AOT memory diagnosis for OOM-prone executables — no allocation risk.

The products-scale hybrid forward OOM'd the 16 GB chip in the r3 AND r4
suite campaigns (`kernel_bench.py` masked arm, RESOURCE_EXHAUSTED at the
first execution) even though `auto_strip_cols`'s working-set model said
it fits. Diagnosing by running costs an OOM each try; this probe instead
compiles the EXACT executable from `jax.ShapeDtypeStruct`s (no arrays
materialized) and reads XLA's buffer assignment via
`compiled.memory_analysis()` — argument/output/temp/peak bytes — so the
discrepancy between the planning model and the compiler's actual
allocation is measured, not guessed.

Two phases (host build must not touch the TPU):
  # 1. CPU: build the real schedule host-side, persist leaf shapes
  python -m maxk_tpu.bench.probe_mem --graph ogbn-products --scale 1.0 \
      --shapes_out /tmp/products_shapes.json --platform cpu
  # 2. TPU: reconstruct ShapeDtypeStructs, compile, print memory analysis
  python -m maxk_tpu.bench.probe_mem --shapes /tmp/products_shapes.json

Reference context: the reference never hits this class of problem
because its CUDA kernels allocate nothing (`kernels/spmm_maxk.cu` writes
into caller buffers); on TPU the compiler owns temp allocation, so the
planning rule must match XLA's buffer assignment.
"""

from __future__ import annotations

import argparse
import json
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _leaf_spec(x):
    return {"shape": list(x.shape), "dtype": str(x.dtype)}


def phase_shapes(args):
    """CPU: host-build the (permuted, normed) graph + hybrid schedule and
    persist every pytree leaf's (shape, dtype) + static metadata."""
    import jax

    jax.config.update("jax_platforms", args.platform or "cpu")
    import numpy as np

    from maxk_tpu.data.datasets import DATASETS
    from maxk_tpu.data.synthetic import rmat_graph
    from maxk_tpu.sparse.hybrid import (
        auto_strip_cols,
        auto_strip_dtype,
        auto_tail_band_cols,
        build_hybrid,
        degree_perm,
        permute_csr,
    )
    from maxk_tpu.sparse.csr import with_norm

    spec = DATASETS[args.graph]
    v = max(int(spec.num_nodes * args.scale), 64)
    e = max(int(spec.num_edges * args.scale), 256)
    log(f"host rmat {args.graph} x{args.scale}: V={v} E_target={e}")
    g = rmat_graph(v, e, seed=123)
    g = permute_csr(g, degree_perm(g))
    e_live = int(np.asarray(g.indptr[-1]))
    import jax.numpy as jnp

    strip_dtype = (
        auto_strip_dtype(g) if args.strip_dtype == "auto"
        else jnp.dtype(args.strip_dtype)
    )
    s_cols = args.strip_cols or auto_strip_cols(
        v, e_live=e_live, dim=args.dim,
        io_itemsize=args.io_itemsize,
        strip_itemsize=jnp.dtype(strip_dtype).itemsize,
    )
    band = auto_tail_band_cols(v, s_cols)
    log(f"schedule: s_cols={s_cols} strip_dtype={jnp.dtype(strip_dtype).name} "
        f"band={band} e_live={e_live}")
    hyb = build_hybrid(
        g, s_cols=s_cols, norm="right", tail_band_cols=band,
        strip_dtype=strip_dtype,
    )
    gn = with_norm(g, "right")
    doc = {
        "graph": args.graph, "scale": args.scale, "dim": args.dim,
        "V": v, "e_live": e_live,
        "csr": {k: _leaf_spec(getattr(gn, k))
                for k in ("indptr", "indices", "values")},
        "strip": _leaf_spec(hyb.strip),
        "pre": _leaf_spec(hyb.pre),
        "post": _leaf_spec(hyb.post),
        "tail_tiles": {k: _leaf_spec(getattr(hyb.tail_tiles, k))
                       for k in ("block", "cols", "vals", "localrow")},
        "tail_tiles_static": {
            "row_block": hyb.tail_tiles.row_block,
            "num_row_blocks": hyb.tail_tiles.num_row_blocks,
            "num_nodes": hyb.tail_tiles.num_nodes,
        },
        "hybrid_static": {
            "num_nodes": hyb.num_nodes, "s_cols": hyb.s_cols,
            "tail_chunk": hyb.tail_chunk, "tail_window": hyb.tail_window,
            "tail_band_meta": list(hyb.tail_band_meta),
        },
        "tail_bands": [
            {k: _leaf_spec(getattr(b, k))
             for k in ("block", "cols", "vals", "localrow")}
            for b in hyb.tail_bands
        ],
    }
    with open(args.shapes_out, "w") as f:
        json.dump(doc, f, indent=1)
    log(f"shapes -> {args.shapes_out}")


def _sds(spec):
    import jax
    import jax.numpy as jnp

    return jax.ShapeDtypeStruct(tuple(spec["shape"]), jnp.dtype(spec["dtype"]))


def phase_compile(args):
    """TPU: reconstruct the pytree as ShapeDtypeStructs, AOT-compile the
    forward (and masked-arm value_and_grad), print memory analysis."""
    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.maxk_jax_cache")

    from maxk_tpu.ops.spgemm import spmm
    from maxk_tpu.sparse.csr import CSRGraph
    from maxk_tpu.sparse.graph import Graph
    from maxk_tpu.sparse.hybrid import HybridSchedule
    from maxk_tpu.sparse.meta import EdgeTiles

    with open(args.shapes) as f:
        doc = json.load(f)
    dim = doc["dim"]
    csr = CSRGraph(**{k: _sds(s) for k, s in doc["csr"].items()})
    tt = EdgeTiles(
        **{k: _sds(s) for k, s in doc["tail_tiles"].items()},
        **doc["tail_tiles_static"],
    )
    bands = tuple(
        EdgeTiles(**{k: _sds(s) for k, s in b.items()},
                  **doc["tail_tiles_static"])
        for b in doc["tail_bands"]
    )
    hs = doc["hybrid_static"]
    hyb = HybridSchedule(
        strip=_sds(doc["strip"]), pre=_sds(doc["pre"]),
        post=_sds(doc["post"]), tail_tiles=tt, tail_bands=bands,
        tail_band_meta=tuple(tuple(m) for m in hs["tail_band_meta"]),
        num_nodes=hs["num_nodes"], s_cols=hs["s_cols"],
        tail_chunk=hs["tail_chunk"], tail_window=hs["tail_window"],
    )
    graph = Graph(csr=csr, csc=csr, hybrid=hyb)
    v = doc["V"]
    x = jax.ShapeDtypeStruct((v, dim), jnp.bfloat16)

    def report(tag, lowered):
        compiled = lowered.compile()
        try:
            m = compiled.memory_analysis()
            fields = {
                "argument_size": getattr(m, "argument_size_in_bytes", None),
                "output_size": getattr(m, "output_size_in_bytes", None),
                "temp_size": getattr(m, "temp_size_in_bytes", None),
                "generated_code_size": getattr(
                    m, "generated_code_size_in_bytes", None
                ),
                "alias_size": getattr(m, "alias_size_in_bytes", None),
                "peak_bytes": getattr(
                    m, "peak_memory_in_bytes",
                    getattr(m, "serialized_size_in_bytes", None),
                ),
            }
            total = sum(
                x or 0
                for k2, x in fields.items()
                if k2 in ("argument_size", "output_size", "temp_size")
            )
            print(json.dumps({"tag": tag, **fields, "arg+out+temp": total,
                              "gb": round(total / 1e9, 3)}), flush=True)
        except Exception as ex:  # PJRT plugin may not implement it
            print(json.dumps({"tag": tag, "memory_analysis_error": str(ex)}),
                  flush=True)
        return compiled

    fwd = jax.jit(lambda g_, x_: spmm(g_, x_, mode="hybrid"))
    report("fwd", fwd.lower(graph, x))

    ct = jax.ShapeDtypeStruct((v, dim), jnp.bfloat16)
    vg = jax.jit(
        jax.value_and_grad(
            lambda x_, g_, c_: jnp.vdot(
                spmm(g_, x_, mode="hybrid").astype(jnp.float32),
                c_.astype(jnp.float32),
            )
        )
    )
    report("fwd_bwd_masked", vg.lower(x, graph, ct))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--graph", default="ogbn-products")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--io_itemsize", type=int, default=4)
    p.add_argument("--strip_dtype", default="auto")
    p.add_argument("--strip_cols", type=int, default=0)
    p.add_argument("--shapes_out", default="")
    p.add_argument("--shapes", default="")
    p.add_argument("--platform", default="")
    args = p.parse_args(argv)
    if args.shapes_out:
        phase_shapes(args)
    elif args.shapes:
        phase_compile(args)
    else:
        p.error("pass --shapes_out (CPU build) or --shapes (TPU compile)")


if __name__ == "__main__":
    main()
