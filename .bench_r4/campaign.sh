#!/bin/bash
# Round-4 measurement campaign. Re-entrant: every job has a done-marker
# written ONLY when the job exits 0 AND its artifact exists non-empty
# (the r3 campaign died mid-run and STATUS claimed artifacts that were
# never produced — markers + the artifact-exists gate make that class
# of defect structurally impossible). Relaunching this script resumes:
# completed jobs are skipped, and the long drivers (ksweep,
# degree_sweep) additionally resume internally from their own JSONs.
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

# run NAME TIMEOUT ARTIFACT CMD...
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

# 0. products suite record FIRST — validates the r4 OOM fix early
#    (bf16 masked arm + bf16 IO; 20/20 suite depends on this)
run suite_ogbn-products 5400 .bench_r4/suite/ogbn-products.json \
  python -m maxk_tpu.bench.kernel_bench --graphs ogbn-products \
  --k 8 16 32 64 --scale 1.0 --mode auto --validate --io_itemsize 2 \
  --json_out .bench_r4/suite/ogbn-products.json

# 1. THE accuracy axis (verdict r3 #1: nothing matters more).
#    3 datasets x 2 models x (relu, relu_lib, k in {2..128}); resumes
#    internally from KSWEEP_r4.json per completed arm.
run ksweep 14400 KSWEEP_r4.json \
  python -m maxk_tpu.bench.ksweep --datasets flickr reddit yelp \
  --models sage gcn --scale 0.1 --epochs 300 --json_out KSWEEP_r4.json

# 2. degree axis (24-graph-suite analog); per-graph subprocess resume
run degree_sweep 14400 DEGREE_SWEEP_r4.json \
  python -m maxk_tpu.bench.degree_sweep --out DEGREE_SWEEP_r4.json \
  --dir .bench_r4/degree --timeout 2400

# 3. remaining suite graphs (regenerated with the r4 kernel code)
for g in reddit flickr yelp ogbn-proteins; do
  run suite_$g 4500 .bench_r4/suite/$g.json \
    python -m maxk_tpu.bench.kernel_bench --graphs $g \
    --k 8 16 32 64 --scale 1.0 --mode auto --validate \
    --json_out .bench_r4/suite/$g.json
done
if [ ! -f $D/assemble_suite ] && [ -s .bench_r4/suite/ogbn-products.json ]; then
  python -m maxk_tpu.bench.assemble_suite --dir .bench_r4/suite \
    --out BENCH_SUITE_r4.json \
    --note "round 4, v5e, production masked arm (bf16 at products scale) + CBSR arm, value_and_grad timing, consistency audit embedded; products at io_itemsize=2 (bf16 IO)" \
    >> $L/assemble.log 2>&1 && [ -s BENCH_SUITE_r4.json ] && touch $D/assemble_suite
fi

# 4. SpGEMM-pruning study with the current (hybrid) kernel
run study_reddit 5400 .bench_r4/study/reddit.json \
  python -m maxk_tpu.bench.spgemm_study --graph reddit --scale 0.25 \
  --json_out .bench_r4/study/reddit.json
if [ ! -f $D/assemble_study ] && [ -s .bench_r4/study/reddit.json ]; then
  python -m maxk_tpu.bench.assemble_study --dir .bench_r4/study \
    --out SPGEMM_STUDY_r4.json --note "round 4, reddit x0.25, v5e, incl. hybrid arm" \
    >> $L/assemble.log 2>&1 && [ -s SPGEMM_STUDY_r4.json ] && touch $D/assemble_study
fi

# 5. products int8-strip end-to-end record (2x strip width at equal HBM
#    budget; exact on the integer-valued graph). Compare against the
#    bf16-strip suite record from job 0.
run products_int8 5400 .bench_r4/products_int8.json \
  python -m maxk_tpu.bench.kernel_bench --graphs ogbn-products \
  --k 8 32 --scale 1.0 --mode hybrid --strip_dtype int8 --io_itemsize 2 \
  --validate --json_out .bench_r4/products_int8.json

# 6. GNNAdvisor-role breadth: 3 full-scale graphs spanning the
#    avg-degree-50 boundary, per-degree-class geomeans
run three_arms 10800 THREE_ARMS_r4.json \
  python -m maxk_tpu.bench.three_arms --scale 1.0 --out THREE_ARMS_r4.json

echo CAMPAIGN_PASS_DONE $(date -u +%T) >> $L/campaign.log
ls $D >> $L/campaign.log
