#!/bin/bash
# Final-pass ordering for the remaining round time: compile-check the
# padding fix, the recalibrated ksweep reddit arms, products, reddit
# suite re-run + re-assemble, then the long sweeps (all resumable).
set -u
cd /root/repo
L=.bench_r5/logs
D=.bench_r5/done
wait_tpu() {
  i=0
  while true; do
    i=$((i+1))
    if timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float((x@x).sum()))" >/dev/null 2>&1; then
      echo "tpu ok (attempt $i) $(date -u +%T)" >> $L/campaign.log; return 0
    fi
    [ $((i % 20)) -eq 0 ] && echo "tpu probe $i failed $(date -u +%T)" >> $L/campaign.log
    sleep 30
  done
}
commit_artifact() {
  msg=$1; shift
  for t in 1 2 3; do
    if git add -A "$@" $L 2>>$L/campaign.log \
       && git commit -q -m "$msg" 2>>$L/campaign.log; then return 0; fi
    sleep 10
  done
  echo "COMMIT FAILED: $msg" >> $L/campaign.log
}
run() {
  name=$1; to=$2; artifact=$3; shift 3
  if [ -f "$D/$name" ]; then return 0; fi
  wait_tpu
  echo "=== $name start $(date -u +%T)" >> $L/campaign.log
  timeout "$to" "$@" >> "$L/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc end $(date -u +%T)" >> $L/campaign.log
  if [ "$rc" -eq 0 ] && [ -s "$artifact" ]; then
    touch "$D/$name"
    commit_artifact "campaign5 $name: artifact $artifact" "$artifact" "$D"
  fi
}

run probe_mem 1800 $L/probe_mem_padded.log \
  python -m maxk_tpu.bench.probe_mem --shapes .bench_r5/products_shapes.json

if [ ! -s KSWEEP_r5.json ]; then
  python - <<'PY' >> $L/campaign.log 2>&1
import json
d = json.load(open('KSWEEP_r4.json'))
rows = [r for r in d['results'] if r['dataset'] != 'reddit']
json.dump(rows, open('KSWEEP_r5.json', 'w'), indent=1)
print(f"seeded KSWEEP_r5 with {len(rows)} non-reddit r4 records")
PY
fi
run ksweep_r5 7200 KSWEEP_r5.json \
  python -m maxk_tpu.bench.ksweep --datasets flickr reddit yelp \
  --models sage gcn --scale 0.1 --epochs 500 --json_out KSWEEP_r5.json

run suite_ogbn-products 3600 .bench_r5/suite/ogbn-products.json \
  python -m maxk_tpu.bench.kernel_bench --graphs ogbn-products \
  --k 8 16 32 64 --scale 1.0 --mode auto --validate \
  --json_out .bench_r5/suite/ogbn-products.json

run suite_reddit 2700 .bench_r5/suite/reddit.json \
  python -m maxk_tpu.bench.kernel_bench --graphs reddit \
  --k 8 16 32 64 --scale 1.0 --mode auto --validate \
  --json_out .bench_r5/suite/reddit.json

if [ ! -f $D/assemble_suite ] && [ -f $D/suite_reddit ]; then
  python -m maxk_tpu.bench.assemble_suite --dir .bench_r5/suite \
    --out BENCH_SUITE_r5.json \
    --note "round 5, v5e, production auto dispatch (int8 strip where exact, T=32 tail, TILE_PAD tables), masked + CBSR arms, value_and_grad timing, consistency audit embedded; reddit+products records post-TILE_PAD, flickr/yelp/proteins pre (timing effect <2%)" \
    >> $L/assemble.log 2>&1 && [ -s BENCH_SUITE_r5.json ] \
    && touch $D/assemble_suite \
    && commit_artifact "campaign5 BENCH_SUITE_r5 re-assembled" BENCH_SUITE_r5.json $D
fi

run degree_sweep 10800 DEGREE_SWEEP_r5.json \
  python -m maxk_tpu.bench.degree_sweep --out DEGREE_SWEEP_r5.json \
  --dir .bench_r5/degree --timeout 1500

run study_reddit 4500 .bench_r5/study/reddit.json \
  python -m maxk_tpu.bench.spgemm_study --graph reddit --scale 0.25 \
  --json_out .bench_r5/study/reddit.json
if [ ! -f $D/assemble_study ] && [ -f $D/study_reddit ]; then
  python -m maxk_tpu.bench.assemble_study --dir .bench_r5/study \
    --out SPGEMM_STUDY_r5.json \
    --note "round 5, reddit x0.25, v5e, incl. hybrid arm (int8 strip)" \
    >> $L/assemble.log 2>&1 && [ -s SPGEMM_STUDY_r5.json ] \
    && touch $D/assemble_study \
    && commit_artifact "campaign5 SPGEMM_STUDY_r5 assembled" SPGEMM_STUDY_r5.json $D
fi

run three_arms 7200 THREE_ARMS_r5.json \
  python -m maxk_tpu.bench.three_arms --scale 1.0 --out THREE_ARMS_r5.json

run products_bf16_strip 3600 .bench_r5/products_bf16_strip.json \
  python -m maxk_tpu.bench.kernel_bench --graphs ogbn-products \
  --k 8 32 --scale 1.0 --mode hybrid --strip_dtype bfloat16 \
  --validate --json_out .bench_r5/products_bf16_strip.json

echo CAMPAIGN_FINAL_DONE $(date -u +%T) >> $L/campaign.log
