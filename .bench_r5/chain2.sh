#!/bin/bash
# waits for the priority batch, then: padded-shapes memory compile,
# reddit protocol calibration grid, then relaunch campaign5 (remaining
# jobs: products retry with padded tiles, degree, study, three_arms,
# bf16 strip; ksweep_r5 once recal_ready is set by hand after reviewing
# the grid).
set -u
cd /root/repo
L=.bench_r5/logs
until grep -q PRIORITY_DONE $L/priority.log 2>/dev/null; do sleep 30; done
wait_tpu() {
  for i in $(seq 1 40); do
    if timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float((x@x).sum()))" >/dev/null 2>&1; then return 0; fi
    sleep 20
  done
  return 1
}
wait_tpu || exit 1
echo "=== probe_mem_padded start $(date -u +%T)" >> $L/priority.log
timeout 1800 python -m maxk_tpu.bench.probe_mem --shapes .bench_r5/products_shapes.json > $L/probe_mem_padded.log 2>&1
echo "=== probe_mem_padded rc=$? $(date -u +%T)" >> $L/priority.log
wait_tpu || exit 1
echo "=== recal_grid start $(date -u +%T)" >> $L/priority.log
timeout 5400 python .bench_r5/recal_tpu.py > $L/recal_grid.log 2>&1
echo "=== recal_grid rc=$? $(date -u +%T)" >> $L/priority.log
echo CHAIN2_DONE $(date -u +%T) >> $L/priority.log
bash .bench_r5/campaign5.sh >> $L/campaign_stdout.log 2>&1
