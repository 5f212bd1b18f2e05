#!/bin/bash
cd "$(dirname "$0")/.." && . scripts_train/common.sh
run_train yelp "${1:-sage}" relu 32 "${2:-97}" \
  --hidden_layers 4 --hidden_dim 384 --dropout 0.1 --lr 0.001 --epochs 3000
