#!/bin/bash
# reddit: 4x256, dropout 0.5, lr 0.01, 3000 epochs (reference reddit_maxk.sh:14-19)
cd "$(dirname "$0")/.." && . scripts_train/common.sh
run_train reddit "${1:-sage}" maxk "${3:-32}" "${2:-97}" \
  --hidden_layers 4 --hidden_dim 256 --dropout 0.5 --lr 0.01 --epochs 3000
