#!/bin/bash
set -u
cd /root/repo
L=.bench_r5/logs
wait_tpu() {
  for i in $(seq 1 40); do
    if timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float((x@x).sum()))" >/dev/null 2>&1; then
      echo "tpu ok (attempt $i) $(date -u +%T)" >> $L/priority.log; return 0
    fi
    echo "tpu probe $i failed $(date -u +%T)" >> $L/priority.log
    sleep 20
  done
  echo "tpu never answered $(date -u +%T)" >> $L/priority.log; return 1
}
wait_tpu || exit 1
echo "=== probe_mem start $(date -u +%T)" >> $L/priority.log
timeout 1800 python -m maxk_tpu.bench.probe_mem --shapes .bench_r5/products_shapes.json >> $L/probe_mem.log 2>&1
echo "=== probe_mem rc=$? $(date -u +%T)" >> $L/priority.log
for b in 32768 16384 65536; do
  wait_tpu || exit 1
  echo "=== probe_tail3_b$b start $(date -u +%T)" >> $L/priority.log
  timeout 2400 python -m maxk_tpu.bench.probe_hybrid --s 24576 --dtype int8 \
    --tail_tile 32 --tail_band_cols $b >> $L/probe_tail3_b$b.log 2>&1
  echo "=== probe_tail3_b$b rc=$? $(date -u +%T)" >> $L/priority.log
done
echo PRIORITY_DONE $(date -u +%T) >> $L/priority.log
