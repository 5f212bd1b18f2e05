#!/bin/bash
cd "$(dirname "$0")/.." && . scripts_train/common.sh
run_train ogbn-proteins "${1:-sage}" relu 32 "${2:-97}" \
  --hidden_layers 3 --hidden_dim 256 --dropout 0.5 --lr 0.01 --epochs 1000
