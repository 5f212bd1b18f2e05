"""Real-chip probe for the brick SpMM kernel (round-2 bring-up).

Runs the production-parameter kernel on a device-generated R-MAT graph,
validates against the XLA oracle, and times it vs `spmm_tiles_scan`.
Usage: python -m maxk_tpu.bench.probe_bricks [--v 32768] [--e 1000000]
"""

from __future__ import annotations

import argparse
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--v", type=int, default=32768)
    p.add_argument("--e", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--validate", action="store_true", default=True)
    p.add_argument("--no-validate", dest="validate", action="store_false")
    p.add_argument("--tiles", action="store_true", help="also time tiles_scan")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.maxk_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from maxk_tpu.bench.micro import roundtrip_latency, timeit
    from maxk_tpu.data.device_gen import rmat_graph_device
    from maxk_tpu.ops.spmm_bricks import spmm_bricks
    from maxk_tpu.sparse.bricks import bricks_stats, build_bricks_device

    log(f"backend={jax.default_backend()} rtt={roundtrip_latency()*1e3:.0f}ms")
    t0 = time.time()
    g = rmat_graph_device(args.v, args.e, seed=123)
    live = int(jax.device_get(g.indptr[-1]))
    log(f"graph: V={args.v} E={g.nnz} live={live}  ({time.time()-t0:.1f}s)")

    t0 = time.time()
    sched = build_bricks_device(g)
    jax.block_until_ready(sched.val)
    st = bricks_stats(sched)
    log(f"schedule ({time.time()-t0:.1f}s): {st}")

    dt = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    x = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (args.v, args.dim), jnp.float32
        ).astype(dt)
    )()

    t0 = time.time()
    y = spmm_bricks(sched, x)
    s = float(jnp.sum(y[:8, :8]))  # sync through the tunnel
    log(f"bricks first call ok ({time.time()-t0:.1f}s, checksum {s:.4f})")

    if args.validate:
        from maxk_tpu.ops.spmm_xla import spmm_segsum

        @jax.jit
        def errs(y):
            ref = spmm_segsum(g, x.astype(jnp.float32))
            d = jnp.abs(y.astype(jnp.float32) - ref)
            scale = jnp.maximum(jnp.max(jnp.abs(ref)), 1e-6)
            return jnp.max(d), jnp.mean(d), scale

        mx, mn, sc = (float(v) for v in jax.device_get(errs(y)))
        log(
            f"validate: max_abs={mx:.3e} mean_abs={mn:.3e} ref_scale={sc:.3e}"
            f"  (max_rel {mx/sc:.2e}, mean_rel {mn/sc:.2e})"
        )
        # reference criterion: mean error small (kernels/main.cu:19-48);
        # plus a max-error guard scaled to the compute dtype
        max_tol = 1e-5 if args.dtype == "float32" else 2e-2
        if mn / sc > 1e-4 or mx / sc > max_tol:
            log("VALIDATION FAILED")
            sys.exit(1)

    f = jax.jit(lambda x: spmm_bricks(sched, x))
    t = timeit(f, x)
    log(
        f"bricks: {t*1e3:.2f} ms  {live/t/1e9:.3f} Gnnz/s  "
        f"(densify+flush {st['densify_tflop']+st['flush_tflop']:.2f} TFLOP "
        f"-> {(st['densify_tflop']+st['flush_tflop'])/t:.1f} TFLOP/s)"
    )

    if args.tiles:
        from maxk_tpu.ops.spmm_xla import spmm_tiles_scan
        from maxk_tpu.sparse.meta import build_edge_tiles_device

        tiles = build_edge_tiles_device(g)
        ft = jax.jit(lambda x: spmm_tiles_scan(tiles, x))
        tt = timeit(ft, x)
        log(f"tiles_scan: {tt*1e3:.2f} ms  {live/tt/1e9:.3f} Gnnz/s  ({tt/t:.1f}x slower)")


if __name__ == "__main__":
    main()
