#!/bin/bash
# Round-4 tail attack probe: int8 strip width curve at full reddit,
# production tail tile (T=64). Control: r3 production bf16 s=16384 =
# 101.9 ms fwd (docs/PERF.md).
set -u
cd /root/repo
L=.bench_r4/logs
mkdir -p $L
wait_tpu() {
  for i in $(seq 1 30); do
    if timeout 120 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float((x@x).sum()))" >/dev/null 2>&1; then
      echo "tpu ok (attempt $i) $(date -u +%T)" >> $L/probe_width.log; return 0
    fi
    sleep 20
  done
  return 1
}
for s in 32768 24576; do
  wait_tpu || exit 1
  echo "=== int8 s=$s $(date -u +%T)" >> $L/probe_width.log
  timeout 2400 python -m maxk_tpu.bench.probe_hybrid --graph reddit --scale 1.0 \
    --s $s --dtype int8 --tail_tile 64 --tail_chunk 256 \
    >> $L/probe_width.log 2>&1
  echo "=== rc=$? $(date -u +%T)" >> $L/probe_width.log
done
echo WIDTH_PROBE_DONE >> $L/probe_width.log
