"""Real-chip probe for the symmetric-strip hybrid SpMM (round-2 bring-up).

Builds the hybrid schedule for a device-generated R-MAT graph, validates
against the tile-scan path, and times the hybrid forward/arms.
Usage: python -m maxk_tpu.bench.probe_hybrid [--scale 1.0] [--s 16384]
"""

from __future__ import annotations

import argparse
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--graph", default="reddit")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--s", type=int, default=16384)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--norm", default="right")
    p.add_argument("--validate", action="store_true", default=True)
    p.add_argument("--no-validate", dest="validate", action="store_false")
    p.add_argument("--tiles", action="store_true", help="also time tiles_scan")
    p.add_argument("--tail_tile", type=int, default=256)
    p.add_argument("--tail_row_block", type=int, default=8)
    p.add_argument("--tail_chunk", type=int, default=256)
    p.add_argument("--tail_bf16", action="store_true",
                   help="gather the tail in bf16")
    p.add_argument("--tail_band_cols", type=int, default=0,
                   help="column-band the tail into slices of this width")
    p.add_argument("--feat_int8", action="store_true",
                   help="also time + validate the LOSSY int8-feature "
                        "strip matmuls (requires --dtype int8)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.maxk_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from maxk_tpu.bench.micro import roundtrip_latency, timeit
    from maxk_tpu.data.datasets import DATASETS
    from maxk_tpu.data.device_gen import rmat_graph_device
    from maxk_tpu.ops.spmm_hybrid import spmm_hybrid
    from maxk_tpu.sparse.csr import with_norm
    from maxk_tpu.sparse.hybrid import (
        build_hybrid_device,
        degree_perm_device,
        permute_csr_device,
    )

    log(f"backend={jax.default_backend()} rtt={roundtrip_latency()*1e3:.0f}ms")
    spec = DATASETS[args.graph]
    v = max(int(spec.num_nodes * args.scale), 256)
    e = max(int(spec.num_edges * args.scale), 1024)
    t0 = time.time()
    g = rmat_graph_device(v, e, seed=123)
    live = int(jax.device_get(g.indptr[-1]))
    log(f"graph: V={v} E={g.nnz} live={live}  ({time.time()-t0:.1f}s)")

    t0 = time.time()
    perm = degree_perm_device(g)
    pg = permute_csr_device(g, perm)
    jax.block_until_ready(pg.indices)
    del g, perm  # free ~1 GB HBM before the strip build
    log(f"permute ({time.time()-t0:.1f}s)")
    t0 = time.time()
    dt = {"float32": jnp.float32, "int8": jnp.int8}.get(
        args.dtype, jnp.bfloat16
    )
    h = build_hybrid_device(
        pg, s_cols=args.s, norm=args.norm, strip_dtype=dt,
        row_block=args.tail_row_block, edge_tile=args.tail_tile,
        tail_band_cols=args.tail_band_cols,
    )
    if h.tail_band_meta:
        slots = sum(
            b.num_tiles * b.edge_tile for b in h.tail_bands
        )
        log(f"tail bands: {len(h.tail_bands)} "
            f"({slots/1e6:.1f}M slots total) meta={h.tail_band_meta}")
    tail_tiles = int(h.tail_tiles.block.shape[0])
    tail_live = int(jnp.asarray(jnp.sum(h.tail_tiles.vals != 0)))
    log(
        f"hybrid build ({time.time()-t0:.1f}s): strip {h.strip.shape} "
        f"{h.strip.dtype} ({h.strip.size*h.strip.dtype.itemsize/1e9:.2f} GB), "
        f"tail tiles {tail_tiles} (~{tail_tiles*h.tail_tiles.cols.shape[1]/1e6:.1f}M "
        f"slots, {tail_live/1e6:.1f}M live = {tail_live/live*100:.1f}% of E), "
        f"tail_window {h.tail_window}/{h.tail_chunk}"
    )

    x = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (v, args.dim), jnp.float32
        )
    )()

    t0 = time.time()
    # MUST be jitted (as every production call site is): an EAGER int8-
    # strip spmm_hybrid materializes the strip's bf16 copy (11.5 GB at
    # s=24576) instead of fusing the convert into the matmul — measured
    # OOM, .bench_r4/logs/probe_width.log
    y = jax.jit(lambda h_, x_: spmm_hybrid(h_, x_))(h, x)
    s0 = float(jnp.sum(y[:8, :8]))
    log(f"hybrid first call ok ({time.time()-t0:.1f}s, checksum {s0:.4f})")

    if args.validate:
        from maxk_tpu.ops.spmm_xla import spmm_tiles_scan
        from maxk_tpu.sparse.meta import build_edge_tiles_device

        gn = with_norm(pg, args.norm)
        tiles = build_edge_tiles_device(gn)

        @jax.jit
        def errs(y, tiles, x):
            ref = spmm_tiles_scan(tiles, x)
            d = jnp.abs(y.astype(jnp.float32) - ref)
            scale = jnp.maximum(jnp.max(jnp.abs(ref)), 1e-6)
            return jnp.max(d), jnp.mean(d), scale

        mx, mn, sc = (float(q) for q in jax.device_get(errs(y, tiles, x)))
        log(
            f"validate vs tiles_scan: max_abs={mx:.3e} mean_abs={mn:.3e} "
            f"scale={sc:.3e} (max_rel {mx/sc:.2e}, mean_rel {mn/sc:.2e})"
        )
        tol = 1e-4 if args.dtype == "float32" else 2e-2
        if mn / sc > 1e-3 or mx / sc > tol:
            log("VALIDATION FAILED")
            sys.exit(1)

        if args.feat_int8:
            # LOSSY arm: per-column int8 feature quantization on the
            # strip matmuls — the only error source is the ~|x|max/127
            # rounding step (the int8 strip itself is exact)
            yq = jax.jit(
                lambda h_, x_: spmm_hybrid(h_, x_, feat_int8=True)
            )(h, x)
            mxq, mnq, scq = (
                float(q) for q in jax.device_get(errs(yq, tiles, x))
            )
            log(
                f"validate feat_int8 vs tiles_scan: max_abs={mxq:.3e} "
                f"mean_abs={mnq:.3e} (max_rel {mxq/scq:.2e}, "
                f"mean_rel {mnq/scq:.2e})"
            )
            if mnq / scq > 1e-2 or mxq / scq > 8e-2:
                log("FEAT_INT8 VALIDATION FAILED (beyond quant bound)")
                sys.exit(1)
            if hasattr(yq, "delete"):
                yq.delete()

        if args.tiles:
            # schedules ride as jit ARGS (closures ship as HLO constants
            # through the remote-compile tunnel -> HTTP 413)
            ft = jax.jit(lambda tt, xx: spmm_tiles_scan(tt, xx))
            tt = timeit(ft, tiles, x)
            log(f"tiles_scan: {tt*1e3:.2f} ms  {live/tt/1e9:.3f} Gnnz/s")
        # free the full-graph oracle tables before the timing arms (at
        # s=32768 the strip + validation tiles together pin ~9.5 GB and
        # the arm-breakdown section OOMs)
        jax.tree.map(
            lambda a: a.delete() if hasattr(a, "delete") else None,
            (tiles, y),
        )

    f = jax.jit(lambda hh, xx: spmm_hybrid(hh, xx))
    t = timeit(f, h, x)
    log(f"hybrid fwd: {t*1e3:.2f} ms  {live/t/1e9:.3f} Gnnz/s")
    if args.feat_int8:
        fq = jax.jit(lambda hh, xx: spmm_hybrid(hh, xx, feat_int8=True))
        tq = timeit(fq, h, x)
        log(f"hybrid fwd (feat_int8 LOSSY): {tq*1e3:.2f} ms  "
            f"{live/tq/1e9:.3f} Gnnz/s  ({t/tq:.2f}x vs exact)")
    ftr = jax.jit(lambda hh, xx: spmm_hybrid(hh, xx, transpose=True))
    ttr = timeit(ftr, h, x)
    log(f"hybrid fwd (transpose): {ttr*1e3:.2f} ms")

    # arm split: strip-only vs tail-only timing
    from maxk_tpu.ops.spmm_xla import spmm_tiles_scan as _scan

    from maxk_tpu.sparse.meta import max_block_span

    for chunk in (args.tail_chunk, args.tail_chunk * 2):
        win = max_block_span(h.tail_tiles.block, chunk)
        for w in (None, win):
            tailf = jax.jit(
                lambda tt, xx, c=chunk, w_=w: _scan(tt, xx, chunk=c, window=w_)
            )
            t_tail = timeit(tailf, h.tail_tiles, x)
            log(f"  tail arm alone ({x.dtype}, chunk={chunk}, "
                f"window={w or chunk}): {t_tail*1e3:.2f} ms")

    # matmul arm breakdown (strip-operand dtype inputs; int8 strips
    # convert at matmul read exactly as the production op does)
    from maxk_tpu.ops.spmm_hybrid import _strip_operand

    s = h.s_cols
    # dtype only — calling _strip_operand EAGERLY on an int8 strip would
    # materialize its full bf16 copy (11.5 GB at s=24576)
    cdt = (
        jnp.bfloat16
        if jnp.issubdtype(h.strip.dtype, jnp.integer) else h.strip.dtype
    )
    xc = x.astype(cdt)
    if h.padded_nodes != v:
        xc = jnp.pad(xc, ((0, h.padded_nodes - v), (0, 0)))
    xh = xc[:s]
    m1 = jax.jit(lambda w, a: jnp.dot(
        _strip_operand(w)[0][a.shape[0]:], a,
        preferred_element_type=jnp.float32))
    t1 = timeit(m1, h.strip, xh)
    log(f"  W[s:]@xh (hub cols, rows>=s): {t1*1e3:.2f} ms")
    m2 = jax.jit(lambda w, a: jnp.einsum(
        "vs,vd->sd", _strip_operand(w)[0], a,
        preferred_element_type=jnp.float32))
    t2 = timeit(m2, h.strip, xc)
    log(f"  W^T@xc (hub rows): {t2*1e3:.2f} ms")


if __name__ == "__main__":
    main()
