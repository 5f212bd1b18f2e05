#!/bin/bash
# Sweep driver — role of comprehensive_maxk_training.sh: datasets x models
# x k values with per-run timeout and FAILED logging.
cd "$(dirname "$0")/.."
TIMEOUT=${TIMEOUT:-7200}
KS=${KS:-"4 8 16 32 64 96 128"}
DATASETS=${DATASETS:-"flickr reddit yelp ogbn-products ogbn-proteins"}
MODELS=${MODELS:-"sage gcn gin"}
mkdir -p log
for ds in $DATASETS; do
  for model in $MODELS; do
    for k in $KS; do
      echo "=== $ds $model k=$k ==="
      timeout "$TIMEOUT" bash "scripts_train/${ds//-/_}_maxk.sh" "$model" 97 "$k" \
        >> "log/${ds}_${model}_k${k}.log" 2>&1 || echo "FAILED: $ds $model k=$k" | tee -a log/failures.log
    done
  done
done
