#!/bin/bash
# ogbn-proteins: 3x256, dropout 0.5, lr 0.01, 1000 epochs, rocauc metric, BCE
cd "$(dirname "$0")/.." && . scripts_train/common.sh
run_train ogbn-proteins "${1:-sage}" maxk "${3:-32}" "${2:-97}" \
  --hidden_layers 3 --hidden_dim 256 --dropout 0.5 --lr 0.01 --epochs 1000
