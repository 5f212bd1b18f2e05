#!/bin/bash
set -u
cd /root/repo
L=.bench_r4/logs
wait_tpu() {
  for i in $(seq 1 30); do
    if timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float((x@x).sum()))" >/dev/null 2>&1; then return 0; fi
    sleep 20
  done
  return 1
}
for cfg in "32 256" "64 512" "16 256"; do
  set -- $cfg
  wait_tpu || exit 1
  echo "=== int8 s=24576 T=$1 chunk=$2 $(date -u +%T)" >> $L/probe_tail2.log
  timeout 2400 python -m maxk_tpu.bench.probe_hybrid --graph reddit --scale 1.0 \
    --s 24576 --dtype int8 --tail_tile $1 --tail_chunk $2 \
    >> $L/probe_tail2.log 2>&1
  echo "=== rc=$? $(date -u +%T)" >> $L/probe_tail2.log
done
echo TAIL2_DONE >> $L/probe_tail2.log
