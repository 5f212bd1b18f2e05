#!/bin/bash
# Round-5 campaign. Supersedes .bench_r4/campaign3.sh (which the r4
# builder launched at round close; its resumed run completed ksweep_r4 +
# suite reddit/flickr/yelp early in r5 before being stopped at a job
# boundary). Priorities per VERDICT r4 "next round": products diagnosis
# + 20/20 suite (#1 of missing), degree axis (#2), recalibrated ksweep
# (#3), headline reconcile (#4), study (#4), three_arms (#5).
#
# Discipline: done-marker per job, artifact must be non-empty, artifact
# COMMITTED the moment the job succeeds (r4 verdict #8 — the snapshot
# race), one sequential TPU owner, per-job timeout + log.
set -u
cd /root/repo
mkdir -p .bench_r5/suite .bench_r5/study .bench_r5/logs .bench_r5/done \
  .bench_r5/degree
L=.bench_r5/logs
D=.bench_r5/done

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

commit_artifact() {
  # commit the named paths now; retry on index-lock contention
  msg=$1; shift
  for t in 1 2 3; do
    if git add -A "$@" $L 2>>$L/campaign.log \
       && git commit -q -m "$msg" 2>>$L/campaign.log; then
      echo "committed: $msg" >> $L/campaign.log; return 0
    fi
    sleep 10
  done
  echo "COMMIT FAILED: $msg" >> $L/campaign.log
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
    commit_artifact "campaign5 $name: artifact $artifact" "$artifact" "$D"
  fi
}

# 1. products AOT memory diagnosis (compile-only, no allocation): the
#    planning-model-vs-XLA-buffer-assignment gap behind the r3/r4 OOMs
if [ -s .bench_r5/products_shapes.json ]; then
  run probe_mem 1800 $L/probe_mem.log \
    python -m maxk_tpu.bench.probe_mem --shapes .bench_r5/products_shapes.json
fi

# 2. headline reconcile: bench.py with the component split (densify +
#    spmm vs maxk_spgemm) — explains the 73.9 probe vs 82.0 driver gap
run bench_reconcile 2400 $L/bench_reconcile.log \
  python bench.py

# 3. products suite record (auto mode; may still OOM -> no marker, the
#    probe_mem numbers then drive the planning-model fix and a re-run)
run suite_ogbn-products 5400 .bench_r5/suite/ogbn-products.json \
  python -m maxk_tpu.bench.kernel_bench --graphs ogbn-products \
  --k 8 16 32 64 --scale 1.0 --mode auto --validate \
  --json_out .bench_r5/suite/ogbn-products.json

# 4. uniform suite re-runs with the post-ADVICE-fix kernel_bench
#    (cbsr_val_dtype recorded, grad bytes at actual dtype); ~5 min each
#    with the persistent compile cache
for g in reddit flickr yelp ogbn-proteins; do
  run suite_$g 4500 .bench_r5/suite/$g.json \
    python -m maxk_tpu.bench.kernel_bench --graphs $g \
    --k 8 16 32 64 --scale 1.0 --mode auto --validate \
    --json_out .bench_r5/suite/$g.json
done
if [ ! -f $D/assemble_suite ] && [ -f $D/suite_reddit ] \
   && [ -f $D/suite_flickr ] && [ -f $D/suite_yelp ] \
   && [ -f $D/suite_ogbn-proteins ]; then
  python -m maxk_tpu.bench.assemble_suite --dir .bench_r5/suite \
    --out BENCH_SUITE_r5.json \
    --note "round 5, v5e, production auto dispatch (int8 strip where exact, T=32 tail), masked + CBSR arms, value_and_grad timing, consistency audit embedded" \
    >> $L/assemble.log 2>&1 && [ -s BENCH_SUITE_r5.json ] \
    && touch $D/assemble_suite \
    && commit_artifact "campaign5 BENCH_SUITE_r5 assembled" BENCH_SUITE_r5.json $D
fi

# 5. accuracy axis completion: reddit arms re-run at the recalibrated
#    feat_snr (gated on the recal marker; flickr/yelp records carry over
#    from KSWEEP_r4 — same protocol, seeded as a legacy bare list)
if [ -f .bench_r5/recal_ready ]; then
  if [ ! -s KSWEEP_r5.json ]; then
    python - <<'PY' >> $L/campaign.log 2>&1
import json
d = json.load(open('KSWEEP_r4.json'))
rows = [r for r in d['results'] if r['dataset'] != 'reddit']
json.dump(rows, open('KSWEEP_r5.json', 'w'), indent=1)
print(f"seeded KSWEEP_r5 with {len(rows)} non-reddit r4 records")
PY
  fi
  run ksweep_r5 10800 KSWEEP_r5.json \
    python -m maxk_tpu.bench.ksweep --datasets flickr reddit yelp \
    --models sage gcn --scale 0.1 --epochs 500 --json_out KSWEEP_r5.json
fi

# 6. degree axis (four rounds open; per-graph subprocess resume)
run degree_sweep 12600 DEGREE_SWEEP_r5.json \
  python -m maxk_tpu.bench.degree_sweep --out DEGREE_SWEEP_r5.json \
  --dir .bench_r5/degree --timeout 1800

# 7. SpGEMM-pruning study with the current kernels
run study_reddit 5400 .bench_r5/study/reddit.json \
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

# 8. GNNAdvisor-role breadth: 3 full-scale graphs, degree-class geomeans
run three_arms 10800 THREE_ARMS_r5.json \
  python -m maxk_tpu.bench.three_arms --scale 1.0 --out THREE_ARMS_r5.json

# 9. products bf16-vs-int8 strip comparison at the same HBM budget
run products_bf16_strip 5400 .bench_r5/products_bf16_strip.json \
  python -m maxk_tpu.bench.kernel_bench --graphs ogbn-products \
  --k 8 32 --scale 1.0 --mode hybrid --strip_dtype bfloat16 \
  --validate --json_out .bench_r5/products_bf16_strip.json

echo CAMPAIGN5_PASS_DONE $(date -u +%T) >> $L/campaign.log
ls $D >> $L/campaign.log
