"""TPU microbenchmarks for the gather/scatter primitives underlying SpMM.

Run on a real chip (`python -m maxk_tpu.bench.micro`). These measurements
drive the Pallas kernel design choices (SURVEY §7 'hard parts': the
scatter-accumulate inner loop and the CBSR row gather):

  A. XLA row gather from HBM:   x[(E,)] of (V, D) table
  B. Pallas in-VMEM row gather: several lowering variants
  C. Pallas per-row DMA gather loop (GPU-style random access)
  D. One-hot MXU matmul gather (gather as compare+matmul)
  E. lax.top_k vs sort-based top-k (the maxk_kernel.cu role)
  F. XLA segment_sum scatter rate (the backward scatter role)

Methodology: the axon remote-TPU tunnel makes `block_until_ready`
unreliable and host transfers ~MB/s, so (a) all inputs are generated
ON-DEVICE with jax.random, (b) timing = N queued calls + one scalar
fetch, minus the measured roundtrip (validated to reproduce peak TFLOPs
on a matmul chain).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

_LATENCY = None


def _sync(out):
    """Force execution: tiny host fetch of the first leaf."""
    x = jax.tree.leaves(out)[0]
    return float(jnp.sum(jnp.ravel(x)[:8]))


def roundtrip_latency() -> float:
    global _LATENCY
    if _LATENCY is None:
        x = jnp.ones((8, 128))
        f = jax.jit(lambda a: a + 1)
        _sync(f(x))
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(f(x))
            samples.append(time.perf_counter() - t0)
        _LATENCY = float(np.median(samples))
    return _LATENCY


# queued-output budget: PJRT allocates every enqueued call's output buffer
# up front, so `iters` queued (V, D) results co-reside — at ogbn-products
# scale 4 × 2.5 GB next to the 5.6 GB strip OOMs the 16 GB chip
_QUEUED_OUT_BYTES = 2 << 30


def timeit(fn, *args, iters=16, warmup=2, min_total=None):
    """Per-call device time: `iters` queued calls + one sync, minus the
    tunnel roundtrip. If the measured total is within noise of the
    roundtrip itself, re-measures with enough iterations to dominate it
    (tiny kernels would otherwise read as ~0). Calls with large outputs
    are synced one-by-one instead of queued (see _QUEUED_OUT_BYTES);
    their per-call cost dwarfs the roundtrip, so accuracy holds."""
    lat = roundtrip_latency()
    if min_total is None:
        min_total = 4 * lat
    # first warmup synced alone: it reveals the output size before any
    # second call is enqueued (two queued products-scale calls OOM)
    out = fn(*args)
    _sync(out)
    out_bytes = sum(
        getattr(leaf, "nbytes", 0) for leaf in jax.tree.leaves(out)
    )
    big = out_bytes * max(iters, 2) > _QUEUED_OUT_BYTES
    for _ in range(warmup - 1):
        out = fn(*args)
        if big:
            _sync(out)
    if not big:
        _sync(out)
    if big:
        total = 0.0
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            _sync(out)
            total += time.perf_counter() - t0 - lat
        return max(total / iters, 1e-9)
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        total = time.perf_counter() - t0
        if total - lat >= min_total or iters >= 4096:
            return max((total - lat) / iters, 1e-9)
        # scale iteration count to clearly dominate the roundtrip
        per = max((total - lat) / iters, 1e-6)
        iters = min(4096, max(iters * 2, int(min_total / per) + 1))


def _rand(shape, dtype=jnp.float32, seed=0):
    return jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32).astype(
            dtype
        )
    )()


def _randint(shape, hi, seed=1):
    return jax.jit(
        lambda: jax.random.randint(jax.random.PRNGKey(seed), shape, 0, hi, jnp.int32)
    )()


def bench_xla_gather(v=262144, d=256, e=4_000_000, dtype=jnp.float32):
    x = _rand((v, d), dtype)
    idx = _randint((e,), v)
    # .max not .sum: XLA can rewrite sum∘gather as histogram @ table
    f = jax.jit(lambda x, i: jnp.take(x, i, axis=0).max(0))
    t = timeit(f, x, idx)
    bytes_moved = e * d * x.dtype.itemsize
    print(
        f"A. XLA gather  (V={v}, D={d}, E={e}, {x.dtype}): {t*1e3:.2f} ms  "
        f"{e/t/1e9:.3f} Grow/s  {bytes_moved/t/1e9:.1f} GB/s",
        flush=True,
    )
    return e / t


def bench_pallas_vmem_gather(
    s=2048, d=256, n=1 << 20, dtype=jnp.float32, variant="take"
):
    """Gather rows of a VMEM-resident (s, d) slab with dynamic indices."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_ix = 1024  # indices per grid step

    def kernel(idx_ref, slab_ref, out_ref):
        idx = idx_ref[0, :]  # (t_ix,)
        slab = slab_ref[:]
        if variant == "take":
            out_ref[:] = jnp.take(slab, idx, axis=0)
        elif variant == "index":
            out_ref[:] = slab[idx]
        elif variant == "onehot":
            oh = (
                idx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (t_ix, s), 1)
            ).astype(slab.dtype)
            out_ref[:] = jax.lax.dot(
                oh, slab, preferred_element_type=jnp.float32
            ).astype(slab.dtype)
        elif variant == "loop":

            def body(e, _):
                out_ref[e, :] = slab_ref[idx_ref[0, e], :]
                return 0

            jax.lax.fori_loop(0, t_ix, body, 0)

    slab = _rand((s, d), dtype)
    idx = _randint((n // t_ix, t_ix), s)

    f = jax.jit(
        lambda idx, slab: pl.pallas_call(
            kernel,
            grid=(n // t_ix,),
            in_specs=[
                pl.BlockSpec((1, t_ix), lambda i: (i, 0)),
                pl.BlockSpec((s, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((t_ix, d), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, d), dtype),
        )(idx, slab)
    )
    try:
        t = timeit(f, idx, slab)
        print(
            f"B. Pallas VMEM gather[{variant}] (S={s}, D={d}, N={n}, "
            f"{np.dtype(dtype).name}): {t*1e3:.2f} ms  {n/t/1e9:.3f} Grow/s",
            flush=True,
        )
        return n / t
    except Exception as ex:
        print(
            f"B. Pallas VMEM gather[{variant}] (S={s}) FAILED: "
            f"{type(ex).__name__}: {str(ex)[:200]}",
            flush=True,
        )
        return 0.0


def bench_pallas_dma_gather(v=262144, d=256, n=1 << 18, dtype=jnp.float32):
    """GPU-style random per-row DMA from HBM, 16 outstanding copies."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_ix = 512
    nslots = 16

    def kernel(idx_ref, x_hbm, out_ref, buf, sems):
        def start(e):
            pltpu.make_async_copy(
                x_hbm.at[idx_ref[0, e]], buf.at[e % (2 * nslots)], sems.at[e % nslots]
            ).start()

        for e in range(nslots):
            start(e)

        def body(e, _):
            pltpu.make_async_copy(
                x_hbm.at[idx_ref[0, e]], buf.at[e % (2 * nslots)], sems.at[e % nslots]
            ).wait()

            @pl.when(e + nslots < t_ix)
            def _():
                start(e + nslots)

            out_ref[e, :] = buf[e % (2 * nslots)]
            return 0

        jax.lax.fori_loop(0, t_ix, body, 0)

    x = _rand((v, d), dtype)
    idx = _randint((n // t_ix, t_ix), v)

    f = jax.jit(
        lambda idx, x: pl.pallas_call(
            kernel,
            grid=(n // t_ix,),
            in_specs=[
                pl.BlockSpec((1, t_ix), lambda i: (i, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((t_ix, d), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((n, d), dtype),
            scratch_shapes=[
                pltpu.VMEM((2 * nslots, d), dtype),
                pltpu.SemaphoreType.DMA((nslots,)),
            ],
        )(idx, x)
    )
    try:
        t = timeit(f, idx, x)
        print(
            f"C. Pallas DMA gather (V={v}, D={d}, N={n}): {t*1e3:.2f} ms  "
            f"{n/t/1e9:.3f} Grow/s  {n*d*4/t/1e9:.1f} GB/s",
            flush=True,
        )
        return n / t
    except Exception as ex:
        print(
            f"C. Pallas DMA gather FAILED: {type(ex).__name__}: {str(ex)[:300]}",
            flush=True,
        )
        return 0.0


def bench_onehot_mxu_gather(s=512, d=256, n=1 << 20, dtype=jnp.bfloat16):
    """Gather as one-hot matmul in plain XLA (MXU)."""
    slab = _rand((s, d), dtype)
    idx = _randint((n,), s)
    blk = 1024

    @jax.jit
    def f(idx, slab):
        def body(i):
            ii = jax.lax.dynamic_slice(idx, (i * blk,), (blk,))
            oh = (ii[:, None] == jnp.arange(s)[None, :]).astype(dtype)
            return (oh @ slab).max(0)

        out = jax.lax.map(body, jnp.arange(n // blk))
        return out.max(0)

    t = timeit(f, idx, slab)
    print(
        f"D. one-hot MXU gather (S={s}, D={d}, N={n}): {t*1e3:.2f} ms  "
        f"{n/t/1e9:.3f} Grow/s",
        flush=True,
    )
    return n / t


def bench_topk(v=262144, d=256, k=32):
    x = _rand((v, d))
    f = jax.jit(lambda x: jax.lax.top_k(x, k)[0].max(0))
    t = timeit(f, x)
    print(
        f"E. lax.top_k (V={v}, D={d}, k={k}): {t*1e3:.2f} ms  "
        f"{v/t/1e6:.1f} Mrow/s",
        flush=True,
    )
    f2 = jax.jit(lambda x: jax.lax.sort(x, dimension=-1).max(0))
    t2 = timeit(f2, x)
    print(f"   full sort baseline: {t2*1e3:.2f} ms", flush=True)
    return v / t


def bench_segment_sum(v=262144, d=256, e=4_000_000):
    data = _rand((e, d))
    seg = jax.jit(lambda: jnp.sort(_randint((e,), v)))()
    f = jax.jit(
        lambda d_, s: jax.ops.segment_sum(
            d_, s, num_segments=v, indices_are_sorted=True
        ).max(0)
    )
    t = timeit(f, data, seg)
    print(
        f"F. segment_sum (E={e}, D={d}): {t*1e3:.2f} ms  {e/t/1e9:.3f} Grow/s",
        flush=True,
    )
    return e / t


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}", flush=True)
    print(f"tunnel roundtrip latency: {roundtrip_latency()*1e3:.1f} ms", flush=True)
    bench_xla_gather()
    bench_xla_gather(dtype=jnp.bfloat16)
    for variant in ("take", "index", "onehot", "loop"):
        bench_pallas_vmem_gather(variant=variant)
    bench_pallas_vmem_gather(dtype=jnp.bfloat16)
    bench_pallas_vmem_gather(s=8192)
    bench_pallas_dma_gather()
    bench_onehot_mxu_gather()
    bench_onehot_mxu_gather(s=2048)
    bench_topk()
    bench_segment_sum()


if __name__ == "__main__":
    main()
