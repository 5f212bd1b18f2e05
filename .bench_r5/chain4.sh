#!/bin/bash
set -u
cd /root/repo
L=.bench_r5/logs
wait_tpu() {
  for i in $(seq 1 600); do
    if timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float((x@x).sum()))" >/dev/null 2>&1; then return 0; fi
    echo "probe $i failed $(date -u +%T)" >> $L/priority.log
    sleep 30
  done
  return 1
}
wait_tpu || { echo CHAIN4_NO_TPU >> $L/priority.log; exit 1; }
echo "=== probe_mem_padded start $(date -u +%T)" >> $L/priority.log
timeout 1800 python -m maxk_tpu.bench.probe_mem --shapes .bench_r5/products_shapes.json > $L/probe_mem_padded.log 2>&1
echo "=== probe_mem_padded rc=$? $(date -u +%T)" >> $L/priority.log
wait_tpu || { echo CHAIN4_NO_TPU >> $L/priority.log; exit 1; }
echo "=== recal_grid start $(date -u +%T)" >> $L/priority.log
timeout 5400 python .bench_r5/recal_tpu.py > $L/recal_grid.log 2>&1
echo "=== recal_grid rc=$? $(date -u +%T)" >> $L/priority.log
echo CHAIN4_DONE $(date -u +%T) >> $L/priority.log
bash .bench_r5/campaign5.sh >> $L/campaign_stdout.log 2>&1
