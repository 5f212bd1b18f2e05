"""Brick-schedule SpMM kernel vs the segment-sum oracle (interpret mode).

Validates the round-2 production kernel the way the reference validates
spmm_maxk against cuSPARSE (`kernels/main.cu:19-48`), plus builder
equivalence (host numpy vs on-device jnp) and structural edge cases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxk_tpu.ops.spmm_bricks import spmm_bricks
from maxk_tpu.ops.spmm_xla import spmm_segsum
from maxk_tpu.sparse.bricks import (
    BrickSchedule,
    bricks_stats,
    build_bricks,
    build_bricks_device,
)
from maxk_tpu.sparse.csr import CSRGraph, with_norm

PARAMS = dict(sg=32, panel=64, wb=16, win=32, t=16, ch=4)


def _rand_graph(v=200, e=1500, seed=3, empty_tail=False):
    rng = np.random.default_rng(seed)
    hi = v // 2 if empty_tail else v
    rows = rng.integers(0, hi, e)
    cols = rng.integers(0, v, e)
    vals = rng.standard_normal(e).astype(np.float32)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    indptr = np.zeros(v + 1, np.int32)
    np.add.at(indptr[1:], rows, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    return CSRGraph(
        indptr=jnp.asarray(indptr),
        indices=jnp.asarray(cols.astype(np.int32)),
        values=jnp.asarray(vals),
    )


@pytest.mark.parametrize("empty_tail", [False, True])
def test_bricks_matches_oracle(empty_tail):
    g = _rand_graph(empty_tail=empty_tail)
    sched = build_bricks(g, **PARAMS)
    x = jax.random.normal(jax.random.PRNGKey(0), (g.num_nodes, 128))
    y = spmm_bricks(sched, x, interpret=True)
    ref = spmm_segsum(g, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_bricks_normalized_values():
    g = with_norm(_rand_graph(seed=11), "none")
    g = CSRGraph(
        indptr=g.indptr, indices=g.indices, values=jnp.abs(g.values) + 0.1
    )
    sched = build_bricks(g, **PARAMS)
    x = jax.random.normal(jax.random.PRNGKey(1), (g.num_nodes, 128))
    np.testing.assert_allclose(
        np.asarray(spmm_bricks(sched, x, interpret=True)),
        np.asarray(spmm_segsum(g, x)),
        rtol=1e-5,
        atol=1e-5,
    )


def test_device_builder_matches_host():
    g = _rand_graph(seed=5)
    a = build_bricks(g, **PARAMS)
    b = build_bricks_device(g, **PARAMS)
    assert a.num_chunks == b.num_chunks
    for name in ("chunk_panel", "chunk_sgroup", "meta"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        )
    # slot order within a brick may differ only if the sorts tie-break
    # differently; both argsorts are stable over the same key, so exact:
    np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
    np.testing.assert_allclose(np.asarray(a.val), np.asarray(b.val))


def test_device_builder_oracle_end_to_end():
    g = _rand_graph(seed=9, v=300, e=4000)
    sched = build_bricks_device(g, **PARAMS)
    x = jax.random.normal(jax.random.PRNGKey(2), (300, 128))
    np.testing.assert_allclose(
        np.asarray(spmm_bricks(sched, x, interpret=True)),
        np.asarray(spmm_segsum(g, x)),
        rtol=1e-5,
        atol=1e-5,
    )


def test_stats_fill():
    g = _rand_graph()
    s = bricks_stats(build_bricks(g, **PARAMS))
    assert s["live_edges"] == 1500
    assert 0 < s["fill"] <= 1
    assert s["bricks"] > 0
