#!/bin/bash
# Post-campaign follow-ups (round 5): compile-probe the scan-layout fix
# at products scale, then measure the lossy int8-feature strip arm at
# full reddit (VERDICT r4 #7c). Waits for campaign_final to finish so it
# never contends with the queued suite jobs for the single chip.
set -u
cd /root/repo
L=.bench_r5/logs
D=.bench_r5/done

while ! grep -q CAMPAIGN_FINAL_DONE $L/campaign.log; do sleep 60; done

wait_tpu() {
  i=0
  while true; do
    i=$((i+1))
    if timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float((x@x).sum()))" >/dev/null 2>&1; then
      echo "tpu ok (attempt $i) $(date -u +%T)" >> $L/chain6.log; return 0
    fi
    [ $((i % 20)) -eq 0 ] && echo "tpu probe $i failed $(date -u +%T)" >> $L/chain6.log
    sleep 30
  done
}
commit_artifact() {
  msg=$1; shift
  for t in 1 2 3; do
    if git add -A "$@" $L 2>>$L/chain6.log \
       && git commit -q -m "$msg" 2>>$L/chain6.log; then return 0; fi
    sleep 10
  done
  echo "COMMIT FAILED: $msg" >> $L/chain6.log
}
run() {
  name=$1; to=$2; artifact=$3; shift 3
  if [ -f "$D/$name" ]; then return 0; fi
  wait_tpu
  echo "=== $name start $(date -u +%T)" >> $L/chain6.log
  timeout "$to" "$@" >> "$L/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc end $(date -u +%T)" >> $L/chain6.log
  if [ "$rc" -eq 0 ] && [ -s "$artifact" ]; then
    touch "$D/$name"
    commit_artifact "campaign5 $name: artifact $artifact" "$artifact" "$D"
  fi
}

run probe_mem_layoutfix 1800 $L/probe_mem_layoutfix.log \
  python -m maxk_tpu.bench.probe_mem --shapes .bench_r5/products_shapes_padded.json

# products retry: the 08:57 run got k=8 fully measured for the first
# time (layout fix), then OOM'd at k=16 CBSR fwd_bwd by 98.55 MB — the
# f32 cotangent; the CBSR arm now auto-bf16s at this scale
run suite_ogbn-products2 5400 .bench_r5/suite/ogbn-products.json \
  python -m maxk_tpu.bench.kernel_bench --graphs ogbn-products \
  --k 8 16 32 64 --scale 1.0 --mode auto --validate \
  --json_out .bench_r5/suite/ogbn-products.json

if [ -f $D/suite_ogbn-products2 ]; then
  python -m maxk_tpu.bench.assemble_suite --dir .bench_r5/suite \
    --out BENCH_SUITE_r5.json \
    --note "round 5, v5e, production auto dispatch (int8 strip where exact, T=32 tail, TILE_PAD + lane-aligned scan tables), masked + CBSR arms, value_and_grad timing, consistency audit embedded; reddit+products records post-layout-fix" \
    >> $L/assemble.log 2>&1 && [ -s BENCH_SUITE_r5.json ] \
    && commit_artifact "BENCH_SUITE_r5 re-assembled with products (20/20)" BENCH_SUITE_r5.json $D
fi

run probe_feat_int8 2700 $L/probe_feat_int8.log \
  python -m maxk_tpu.bench.probe_hybrid --scale 1.0 --s 24576 \
  --dtype int8 --feat_int8

# headline re-measure with the scan-layout fix (the ~1.3 ms/call copy
# is gone from every spmm_tiles_scan call, fwd and bwd)
run bench_layoutfix 2700 $L/bench_layoutfix.log \
  python bench.py

echo CHAIN6_DONE $(date -u +%T) >> $L/chain6.log
