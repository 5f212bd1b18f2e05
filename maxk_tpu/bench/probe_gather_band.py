"""Probe: does the tail scan's row gather speed up when its column range
is banded to a small table slice?

Motivation (docs/PERF.md primitive rates): standalone XLA row gathers run
at 0.145 Grow/s from a ≥256K-row table but 0.23–0.26 Grow/s from a ≤32K
table. If the faster rate holds INSIDE the tile scan, splitting tail tiles
into column bands (each gathering from a (band, D) slice of x) would cut
the dominant tail cost ~40% at the price of extra per-(block, band) tile
rounding. This probe times the same slot count with column indices drawn
from [0, band) for several band widths — a synthetic upper bound on the
banding win, independent of any schedule rebuild.

Usage: python -m maxk_tpu.bench.probe_gather_band [--v 233472]
"""

from __future__ import annotations

import argparse
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--v", type=int, default=233472)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--tiles", type=int, default=85504)  # ~reddit tail @T=64
    p.add_argument("--t", type=int, default=64)
    p.add_argument("--r", type=int, default=32)
    p.add_argument("--chunk", type=int, default=256)
    p.add_argument("--dtype", default="float32")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.maxk_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from maxk_tpu.bench.micro import roundtrip_latency, timeit
    from maxk_tpu.ops.spmm_xla import spmm_tiles_scan
    from maxk_tpu.sparse.meta import EdgeTiles

    log(f"backend={jax.default_backend()} "
        f"rtt={roundtrip_latency()*1e3:.0f}ms")
    v, nt, t, r = args.v, args.tiles, args.t, args.r
    nb = max(nt // 12, 1)  # ~12 tiles per block, ascending blocks
    dt = jnp.float32 if args.dtype == "float32" else jnp.bfloat16

    x = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (v, args.dim), dt)
    )()
    block = jnp.minimum(
        jnp.arange(nt, dtype=jnp.int32) // max(nt // nb, 1), nb - 1
    )
    lrow = jax.jit(
        lambda: jax.random.randint(
            jax.random.PRNGKey(1), (nt, t), 0, r, jnp.int32
        )
    )()
    vals = jnp.ones((nt, t), jnp.float32)

    for band in (v, 65536, 32768, 16384, 8192):
        band = min(band, v)
        cols = jax.jit(
            lambda b=band: jax.random.randint(
                jax.random.PRNGKey(2), (nt, t), 0, b, jnp.int32
            )
        )()
        tiles = EdgeTiles(
            block=block, cols=cols, vals=vals, localrow=lrow,
            row_block=r, num_row_blocks=nb, num_nodes=nb * r,
        )
        # (a) narrow index RANGE into the full table — locality only
        f = jax.jit(
            lambda tt, xx: spmm_tiles_scan(tt, xx, chunk=args.chunk)
        )
        tm = timeit(f, tiles, x)
        # (b) gather from an actual (band, D) SLICE — what the banded
        # tail does (slice materialized inside the jit, like spmm_hybrid)
        fs = jax.jit(
            lambda tt, xx, b=band: spmm_tiles_scan(
                tt, jax.lax.slice_in_dim(xx, 0, b), chunk=args.chunk
            )
        )
        ts = timeit(fs, tiles, x)
        slots = nt * t
        log(f"band {band:>7}: range-only {tm*1e3:8.2f} ms "
            f"({tm/slots*1e9:.2f} ns/slot) | sliced-table {ts*1e3:8.2f} ms "
            f"({ts/slots*1e9:.2f} ns/slot)")


if __name__ == "__main__":
    main()
