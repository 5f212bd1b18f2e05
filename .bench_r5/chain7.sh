#!/bin/bash
# Consolidated round-5 queue (replaces campaign_final + chain6, same
# done-markers so completed jobs never re-run). Priority order chosen
# for artifact value per minute with the tunnel's availability unknown:
# the 20/20 suite (products retry w/ CBSR auto-bf16) and the
# never-produced degree axis lead; a SMALL degree pass assembles a
# committed artifact early so a mid-sweep wedge can no longer leave the
# axis empty (the r3/r4 failure mode); the long tails run last.
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
assemble_suite() {
  python -m maxk_tpu.bench.assemble_suite --dir .bench_r5/suite \
    --out BENCH_SUITE_r5.json \
    --note "round 5, v5e, production auto dispatch (int8 strip where exact, T=32 tail, TILE_PAD + lane-aligned scan tables), masked + CBSR arms, value_and_grad timing, consistency audit embedded; reddit+products records post-layout-fix" \
    >> $L/assemble.log 2>&1 && [ -s BENCH_SUITE_r5.json ] \
    && commit_artifact "BENCH_SUITE_r5 re-assembled" BENCH_SUITE_r5.json $D
}

# 1. reddit suite record on the layout-fixed kernel
run suite_reddit2 2700 .bench_r5/suite/reddit.json \
  python -m maxk_tpu.bench.kernel_bench --graphs reddit \
  --k 8 16 32 64 --scale 1.0 --mode auto --validate \
  --json_out .bench_r5/suite/reddit.json
[ -f $D/suite_reddit2 ] && [ ! -f $D/assemble2 ] && assemble_suite && touch $D/assemble2

# 2. products retry: 08:57 run measured k=8 fully (first time ever),
#    OOM'd at k=16 CBSR fwd_bwd by 98.55 MB (f32 cotangent — arm now
#    auto-bf16 at this scale)
run suite_ogbn-products2 5400 .bench_r5/suite/ogbn-products.json \
  python -m maxk_tpu.bench.kernel_bench --graphs ogbn-products \
  --k 8 16 32 64 --scale 1.0 --mode auto --validate \
  --json_out .bench_r5/suite/ogbn-products.json
[ -f $D/suite_ogbn-products2 ] && [ ! -f $D/assemble3 ] && assemble_suite && touch $D/assemble3

# 3. degree axis, SMALL pass first: an assembled artifact lands after
#    ~4 quick graphs instead of after the full sweep
run degree_small 4500 DEGREE_SWEEP_r5.json \
  python -m maxk_tpu.bench.degree_sweep --out DEGREE_SWEEP_r5.json \
  --dir .bench_r5/degree --timeout 1100 \
  --graphs rmat_v262144_d5 rmat_v262144_d50 rmat_v262144_d150 rmat_v262144_d400

# 4. the lossy int8-feature strip arm at full reddit (VERDICT r4 #7c)
run probe_feat_int8 2700 $L/probe_feat_int8.log \
  python -m maxk_tpu.bench.probe_hybrid --scale 1.0 --s 24576 \
  --dtype int8 --feat_int8

# 5. headline re-measure with the scan-layout fix
run bench_layoutfix 2700 $L/bench_layoutfix.log \
  python bench.py

# 6. SpGEMM-pruning study on the current production kernel
run study_reddit 4500 .bench_r5/study/reddit.json \
  python -m maxk_tpu.bench.spgemm_study --graph reddit --scale 0.25 \
  --json_out .bench_r5/study/reddit.json
if [ -f $D/study_reddit ] && [ ! -f $D/assemble_study ]; then
  python -m maxk_tpu.bench.assemble_study --dir .bench_r5/study \
    --out SPGEMM_STUDY_r5.json \
    --note "round 5, reddit x0.25, v5e, incl. hybrid arm (int8 strip)" \
    >> $L/assemble.log 2>&1 && [ -s SPGEMM_STUDY_r5.json ] \
    && touch $D/assemble_study \
    && commit_artifact "campaign5 SPGEMM_STUDY_r5 assembled" SPGEMM_STUDY_r5.json $D
fi

# 7. AOT memory record of the layout fix at products scale
run probe_mem_layoutfix 1800 $L/probe_mem_layoutfix.log \
  python -m maxk_tpu.bench.probe_mem --shapes .bench_r5/products_shapes_padded.json

# 8. degree axis, full grid (skips done graphs, re-assembles)
run degree_full 10800 DEGREE_SWEEP_r5.json \
  python -m maxk_tpu.bench.degree_sweep --out DEGREE_SWEEP_r5.json \
  --dir .bench_r5/degree --timeout 1500

# 9. three-arm comparison at the claim shape
run three_arms 7200 THREE_ARMS_r5.json \
  python -m maxk_tpu.bench.three_arms --scale 1.0 --out THREE_ARMS_r5.json

# 10. products bf16-vs-int8 strip record
run products_bf16_strip 3600 .bench_r5/products_bf16_strip.json \
  python -m maxk_tpu.bench.kernel_bench --graphs ogbn-products \
  --k 8 32 --scale 1.0 --mode hybrid --strip_dtype bfloat16 \
  --validate --json_out .bench_r5/products_bf16_strip.json

echo CHAIN7_DONE $(date -u +%T) >> $L/campaign.log
