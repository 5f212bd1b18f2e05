#!/bin/bash
# Round-5 campaign, pass B — the perf-frontier probe (VERDICT r4 #7) and
# figure rendering, run after (or interleaved at a job boundary with)
# campaign5.sh's artifact jobs. Same marker/commit discipline.
#
# probe_tail3: tail-band re-measure at the NEW production point
# (int8 s=24576, T=32). Banding rebases tail tables into <=32K-column
# windows; r1 measured gathers from <=32K tables at ~1.6x the >=256K
# rate, but banding LOST at T=64 because band-splitting tiles inflated
# slot padding (docs/PERF.md r3 table). At T=32 the padding penalty is
# halved while the rate gain stands — if slots grow <25%, the tail drops
# ~43 -> ~33 ms and the forward lands under the 65 ms target.
set -u
cd /root/repo
mkdir -p .bench_r5/logs .bench_r5/done
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
    commit_artifact "campaign5b $name" "$artifact" "$D"
  fi
}

# tail banding at the production point: 3 band widths vs unbanded
for b in 16384 32768 65536; do
  run probe_tail3_b$b 2400 $L/probe_tail3_b$b.log \
    python -m maxk_tpu.bench.probe_hybrid --s 24576 --dtype int8 \
    --tail_tile 32 --tail_band_cols $b
done

# figures from every artifact that exists (rendered, never hard-coded)
if [ ! -f $D/figs ]; then
  wait=""
  [ -s KSWEEP_r5.json ] && wait="$wait --ksweep KSWEEP_r5.json"
  [ -s DEGREE_SWEEP_r5.json ] && wait="$wait --degree DEGREE_SWEEP_r5.json"
  [ -s SPGEMM_STUDY_r5.json ] && wait="$wait --study SPGEMM_STUDY_r5.json"
  [ -s SCALING_r5.json ] && wait="$wait --scaling SCALING_r5.json"
  [ -s BENCH_SUITE_r5.json ] && wait="$wait --kernel BENCH_SUITE_r5.json"
  if [ -n "$wait" ]; then
    timeout 900 python /tmp/cpu_run.py maxk_tpu.bench.plots $wait \
      --out figs >> $L/plots.log 2>&1 \
      && touch $D/figs && commit_artifact "campaign5b figures" figs $D
  fi
fi

echo CAMPAIGN5B_PASS_DONE $(date -u +%T) >> $L/campaign.log
