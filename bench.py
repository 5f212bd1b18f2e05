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
import subprocess
import sys
import time

import numpy as np

A100_MAXK_K32_NNZ_S = 4.0e9  # derived estimate, see module docstring

_PROBE = (
    "import jax, jax.numpy as jnp; x = jnp.ones((256, 256));"
    " print(float((x @ x).sum()))"
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def wait_for_backend(max_wait_s=1500, probe_timeout=120, sleep_s=30):
    """Poll the device in a SUBPROCESS until it answers a trivial matmul.

    The axon tunnel has two transient failure modes this must survive
    (both observed wedging a round's official bench record):
      - backend init raises UNAVAILABLE (BENCH_r02: rc=1 traceback);
      - the first device op hangs for 10+ minutes at ~0% CPU.
    A subprocess probe under `timeout` covers both — the main process
    never touches jax until a probe has succeeded, and a hung probe is
    killed rather than hanging the bench itself.
    """
    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE],
                timeout=probe_timeout,
                capture_output=True,
                text=True,
            )
            if r.returncode == 0:
                log(f"backend probe ok (attempt {attempt})")
                return True
            tail = (r.stderr or "").strip().splitlines()[-1:]
            log(f"backend probe attempt {attempt} rc={r.returncode} {tail}")
        except subprocess.TimeoutExpired:
            log(f"backend probe attempt {attempt} hung > {probe_timeout}s")
        if time.monotonic() + sleep_s >= deadline:
            log("backend never answered; falling back to CPU")
            return False
        time.sleep(sleep_s)


def _init_backend_retrying(jax, attempts=5, sleep_s=30):
    """jax caches backends only on SUCCESS (xla_bridge.backends(): early
    return iff `_backends` is populated), so retrying in-process is safe
    for the transient UNAVAILABLE case."""
    for i in range(attempts):
        try:
            return jax.default_backend()
        except RuntimeError as ex:
            log(f"backend init attempt {i + 1}/{attempts} failed: "
                f"{str(ex)[:200]}")
            if i + 1 == attempts:
                raise
            time.sleep(sleep_s)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--graph", default="reddit")
    p.add_argument("--scale", type=float, default=0.0)  # 0 = auto
    p.add_argument("--k", type=int, default=32)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--mode", default="auto")
    p.add_argument(
        "--wait_device", type=float, default=1500,
        help="max seconds to poll for a live device backend before "
        "falling back to CPU (0 = don't probe; use whatever jax picks)",
    )
    args = p.parse_args()

    device_alive = (
        wait_for_backend(max_wait_s=args.wait_device)
        if args.wait_device > 0
        else True
    )

    import jax
    import jax.numpy as jnp

    if not device_alive:
        # emit a valid (clearly-labelled) CPU record rather than rc=1:
        # the driver keeps the last-good number otherwise
        jax.config.update("jax_platforms", "cpu")

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

    backend = _init_backend_retrying(jax)
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
        from maxk_tpu.sparse.hybrid import hybrid_profitable, strip_int8_exact

        if on_tpu:
            # same itemsize rule as kernel_bench (ADVICE r4): the
            # decision must see the int8-strip width the builder gets
            profitable = hybrid_profitable(
                v, e_real, args.dim,
                strip_itemsize=1 if strip_int8_exact(g) else 2,
            )
            mode = "hybrid" if profitable else "tiles_scan"
        else:
            mode = "segsum"
    log(f"backend={backend} mode={mode} scale={scale} "
        f"latency={roundtrip_latency()*1e3:.0f}ms")

    from maxk_tpu.sparse.csr import csr_transpose_device

    hybrid = None
    if mode == "hybrid":
        from maxk_tpu.sparse.hybrid import (
            auto_strip_cols,
            auto_strip_dtype,
            auto_tail_band_cols,
            build_hybrid_device,
            degree_perm_device,
            permute_csr_device,
        )

        g = permute_csr_device(g, degree_perm_device(g))
        # production strip dtype rule (round 4): int8 where exact — the
        # equal-HBM width doubles (16384 → 32768 at reddit), converting
        # ~60% of the tail's gather-wall slots into MXU columns
        strip_dtype = auto_strip_dtype(g)
        s_cols = auto_strip_cols(
            v, e_live=e_real, dim=args.dim,
            strip_itemsize=jnp.dtype(strip_dtype).itemsize,
        )
        hybrid = build_hybrid_device(
            g, s_cols=s_cols, norm="right",
            tail_band_cols=auto_tail_band_cols(v, s_cols),
            strip_dtype=strip_dtype,
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

    # component split (r4 verdict weak #2): maxk_spgemm = densify(CBSR)
    # + SpMM-with-norm-scales; the raw-hybrid probe (docs/PERF.md r4
    # table) times only the SpMM on pre-materialized bf16 features, so
    # the probe-vs-driver gap must equal t_densify + scale overhead —
    # measured here so the record explains its own headline
    densify_f = jax.jit(lambda c: cbsr_densify(c, dim).astype(jnp.bfloat16))
    t_densify = timeit(densify_f, cbsr, iters=8)
    xb = densify_f(cbsr)
    spmm_only = jax.jit(lambda g_, x: spmm(g_, x, mode=mode))
    t_spmm = timeit(spmm_only, graph, xb, iters=8)
    log(
        f"components: densify {t_densify*1e3:.3f} + spmm(normed) "
        f"{t_spmm*1e3:.3f} = {(t_densify+t_spmm)*1e3:.3f} ms "
        f"vs maxk_spgemm {t_fwd*1e3:.3f} ms"
    )
    if hasattr(xb, "delete"):
        xb.delete()

    baseline = jax.jit(lambda g_, x: spmm(g_, x, mode=base_mode))
    t_base = timeit(baseline, graph, x_dense, iters=8)
    log(f"dense f32 baseline ({base_mode}): {t_base*1e3:.3f} ms "
        f"({e_real/t_base/1e9:.3f} Gnnz/s)")

    # fwd+bwd (SSpMM role): value_and_grad at a random cotangent. grad()
    # alone would let XLA dead-code-eliminate the forward (the custom-vjp
    # residuals are (graph, sel) only, so the primal output feeds
    # nothing); returning the loss keeps the forward live, and the timing
    # executable computes BOTH outputs before the sync fetch.
    ct = jax.jit(
        lambda: jax.random.normal(jax.random.fold_in(key, 2), (v_pad, dim))
    )()
    vg_fn = jax.jit(
        jax.value_and_grad(
            lambda va, g_, s_, c_: jnp.vdot(
                maxk_spgemm(g_, CBSR(va, s_), dim=dim, mode=mode,
                            compute_dtype=jnp.bfloat16),
                c_,
            )
        )
    )
    t_bwd = timeit(vg_fn, vals, graph, sel, ct, iters=8)
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
