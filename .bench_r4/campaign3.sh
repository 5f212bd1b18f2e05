#!/bin/bash
# Round-4 campaign, pass 3 — the definitive job list after the pass-1/2
# findings: products at io4 (io2 strip OOM measured), ksweep on the
# recalibrated DC-SBM accuracy protocol (pass-1 R-MAT reddit arms had a
# collapsed relu control: archived, artifact restarted), int8 strips now
# the production default (auto_strip_dtype). Same done-marker +
# artifact-exists discipline as campaign.sh.
set -u
cd /root/repo
mkdir -p .bench_r4/suite .bench_r4/study .bench_r4/logs .bench_r4/done \
  .bench_r4/degree
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

# 1. accuracy axis (DC-SBM protocol, 3 datasets x 2 models x 10 arms)
run ksweep 14400 KSWEEP_r4.json \
  python -m maxk_tpu.bench.ksweep --datasets flickr reddit yelp \
  --models sage gcn --scale 0.1 --epochs 500 --json_out KSWEEP_r4.json

# 2. products suite record (io4 — proven; masked arm auto-bf16;
#    auto int8 strip now the default width lever)
run suite_ogbn-products 5400 .bench_r4/suite/ogbn-products.json \
  python -m maxk_tpu.bench.kernel_bench --graphs ogbn-products \
  --k 8 16 32 64 --scale 1.0 --mode auto --validate \
  --json_out .bench_r4/suite/ogbn-products.json

# 3. remaining suite graphs (regenerated with the r4 kernels: int8 strip
#    default on integer-valued graphs)
for g in reddit flickr yelp ogbn-proteins; do
  run suite_$g 4500 .bench_r4/suite/$g.json \
    python -m maxk_tpu.bench.kernel_bench --graphs $g \
    --k 8 16 32 64 --scale 1.0 --mode auto --validate \
    --json_out .bench_r4/suite/$g.json
done
if [ ! -f $D/assemble_suite ] && [ -f $D/suite_ogbn-products ] \
   && [ -f $D/suite_reddit ] && [ -f $D/suite_flickr ] \
   && [ -f $D/suite_yelp ] && [ -f $D/suite_ogbn-proteins ]; then
  python -m maxk_tpu.bench.assemble_suite --dir .bench_r4/suite \
    --out BENCH_SUITE_r4.json \
    --note "round 4, v5e, production masked arm (auto-bf16 at products scale) + CBSR arm, auto int8 strip (24576 cols at reddit), value_and_grad timing, consistency audit embedded" \
    >> $L/assemble.log 2>&1 && [ -s BENCH_SUITE_r4.json ] && touch $D/assemble_suite
fi

# 4. degree axis (per-graph subprocess resume in .bench_r4/degree)
run degree_sweep 14400 DEGREE_SWEEP_r4.json \
  python -m maxk_tpu.bench.degree_sweep --out DEGREE_SWEEP_r4.json \
  --dir .bench_r4/degree --timeout 2400

# 5. SpGEMM-pruning study with the current kernels
run study_reddit 5400 .bench_r4/study/reddit.json \
  python -m maxk_tpu.bench.spgemm_study --graph reddit --scale 0.25 \
  --json_out .bench_r4/study/reddit.json
if [ ! -f $D/assemble_study ] && [ -f $D/study_reddit ]; then
  python -m maxk_tpu.bench.assemble_study --dir .bench_r4/study \
    --out SPGEMM_STUDY_r4.json --note "round 4, reddit x0.25, v5e, incl. hybrid arm" \
    >> $L/assemble.log 2>&1 && [ -s SPGEMM_STUDY_r4.json ] && touch $D/assemble_study
fi

# 6. products int8-vs-bf16 strip record at io4 (the width lever; the
#    suite job above already runs int8 via the auto rule, so this pins
#    the bf16 COMPARISON arm at the same budget)
run products_bf16_strip 5400 .bench_r4/products_bf16_strip.json \
  python -m maxk_tpu.bench.kernel_bench --graphs ogbn-products \
  --k 8 32 --scale 1.0 --mode hybrid --strip_dtype bfloat16 \
  --validate --json_out .bench_r4/products_bf16_strip.json

# 7. GNNAdvisor-role breadth: 3 full-scale graphs, degree-class geomeans
run three_arms 10800 THREE_ARMS_r4.json \
  python -m maxk_tpu.bench.three_arms --scale 1.0 --out THREE_ARMS_r4.json

echo CAMPAIGN3_PASS_DONE $(date -u +%T) >> $L/campaign.log
ls $D >> $L/campaign.log
