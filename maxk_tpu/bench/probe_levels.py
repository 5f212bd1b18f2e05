"""Coverage analysis for a multi-level hub strip (no strip build).

Counts, on device, how many edges a second-level strip would absorb:
level-1 = global degree sort, strip cols [0, s1); level-2 = re-sort the
tail nodes by their TAIL degree (edges into other tail nodes), strip the
next s2 columns. Prints tail sizes per (s1, s2).

Usage: python -m maxk_tpu.bench.probe_levels [--scale 1.0]
"""

from __future__ import annotations

import argparse
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--graph", default="reddit")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--s1", type=int, default=16384)
    p.add_argument("--s2", nargs="+", type=int,
                   default=[4096, 8192, 16384, 32768])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.maxk_jax_cache")

    from maxk_tpu.data.datasets import DATASETS
    from maxk_tpu.data.device_gen import rmat_graph_device
    from maxk_tpu.sparse.hybrid import degree_perm_device, permute_csr_device

    spec = DATASETS[args.graph]
    v = max(int(spec.num_nodes * args.scale), 256)
    e = max(int(spec.num_edges * args.scale), 1024)
    g = rmat_graph_device(v, e, seed=123)
    live = int(jax.device_get(g.indptr[-1]))
    pg = permute_csr_device(g, degree_perm_device(g))
    del g
    s1 = args.s1

    @jax.jit
    def analyze(indptr, indices, values):
        epad = indices.shape[0]
        ar = jnp.arange(epad, dtype=jnp.int32)
        rows = jnp.clip(
            jnp.searchsorted(indptr, ar, side="right").astype(jnp.int32) - 1,
            0, v - 1,
        )
        alive = (ar < indptr[-1]) & (values != 0)
        in_tail1 = alive & (rows >= s1) & (indices >= s1)
        # tail-degree of every node (edges with both endpoints in tail)
        tdeg = jax.ops.segment_sum(
            in_tail1.astype(jnp.float32), rows, num_segments=v,
            indices_are_sorted=True,
        )
        # rank of each node among tail nodes by descending tail degree
        order = jnp.argsort(-tdeg)  # node ids, best first
        rank = jnp.zeros((v,), jnp.int32).at[order].set(
            jnp.arange(v, dtype=jnp.int32)
        )
        rr = rank[rows]
        rc = rank[indices]
        out = [jnp.sum(in_tail1.astype(jnp.int64))]
        for s2 in args.s2:
            in_tail2 = in_tail1 & (rr >= s2) & (rc >= s2)
            out.append(jnp.sum(in_tail2.astype(jnp.int64)))
        return out

    res = [int(x) for x in jax.device_get(
        analyze(pg.indptr, pg.indices, pg.values))]
    t1 = res[0]
    log(f"{args.graph} x{args.scale}: V={v} live={live} "
        f"tail1(s1={s1})={t1} ({t1/live*100:.1f}% of E)")
    for s2, t2 in zip(args.s2, res[1:]):
        vp2 = -(-(v) // 128) * 128
        mem = vp2 * s2 * 2 / 1e9
        log(f"  +level-2 s2={s2}: tail2={t2} "
            f"({t2/t1*100:.1f}% of tail1, {t2/live*100:.2f}% of E), "
            f"strip2 ~{mem:.1f} GB full-height")


if __name__ == "__main__":
    main()
