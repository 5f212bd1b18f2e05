#!/bin/bash
# Round-4 campaign, pass 2: the two products jobs, re-parameterized after
# the pass-1 io_itemsize=2 OOM (see logs/suite_ogbn-products.log).
#
# What pass 1 measured: the bf16 masked arm fix works (t_mask 47.3 ms at
# V=2.45M where the r3 f32 arm OOM'd), but an io2-widened bf16 strip
# (896 cols, 4.39 GB) OOMs the hybrid forward itself — the io2 budget
# model's claimed 2.5 GB savings don't exist during the forward (the
# scan accumulator stays f32 and the masked/out pair is bf16 either
# way). Empirically proven at products: 1.9 GB strip (r3, 384 bf16
# cols) through full suite+validation. So:
#   - suite record: io4 (384 bf16 cols, proven) — completes 20/20
#   - int8 record:  io4 + int8 (896 int8 cols = 2.19 GB, +0.3 GB over
#     proven) — 2.3x strip coverage at ~equal HBM, the width lever the
#     int8 dtype actually buys
set -u
cd /root/repo
mkdir -p .bench_r4/suite .bench_r4/logs .bench_r4/done
L=.bench_r4/logs
D=.bench_r4/done

wait_tpu() {
  for i in $(seq 1 30); do
    if timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float((x@x).sum()))" >/dev/null 2>&1; then
      echo "tpu ok (attempt $i) $(date -u +%T)" >> $L/campaign.log; return 0
    fi
    echo "tpu probe $i failed $(date -u +%T)" >> $L/campaign.log
    sleep 20
  done
  echo "tpu never answered $(date -u +%T)" >> $L/campaign.log; return 1
}

run() {
  name=$1; to=$2; artifact=$3; shift 3
  if [ -f "$D/$name" ]; then
    echo "=== $name done (marker), skip" >> $L/campaign.log; return 0
  fi
  wait_tpu || { echo "ABORT: no tpu for $name" >> $L/campaign.log; exit 1; }
  echo "=== $name start $(date -u +%T)" >> $L/campaign.log
  timeout "$to" "$@" >> "$L/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc end $(date -u +%T)" >> $L/campaign.log
  if [ "$rc" -eq 0 ] && [ -s "$artifact" ]; then
    touch "$D/$name"
  fi
}

run suite_ogbn-products 5400 .bench_r4/suite/ogbn-products.json \
  python -m maxk_tpu.bench.kernel_bench --graphs ogbn-products \
  --k 8 16 32 64 --scale 1.0 --mode auto --validate \
  --json_out .bench_r4/suite/ogbn-products.json

run products_int8 5400 .bench_r4/products_int8.json \
  python -m maxk_tpu.bench.kernel_bench --graphs ogbn-products \
  --k 8 32 --scale 1.0 --mode hybrid --strip_dtype int8 \
  --validate --json_out .bench_r4/products_int8.json

if [ -f $D/suite_ogbn-products ] && [ ! -f $D/assemble_suite ]; then
  if ls .bench_r4/suite/*.json >/dev/null 2>&1 && [ $(ls .bench_r4/suite/*.json | wc -l) -ge 5 ]; then
    python -m maxk_tpu.bench.assemble_suite --dir .bench_r4/suite \
      --out BENCH_SUITE_r4.json \
      --note "round 4, v5e, production masked arm (bf16 at products scale) + CBSR arm, value_and_grad timing, consistency audit embedded" \
      >> $L/assemble.log 2>&1 && [ -s BENCH_SUITE_r4.json ] && touch $D/assemble_suite
  fi
fi
echo CAMPAIGN2_DONE $(date -u +%T) >> $L/campaign.log
