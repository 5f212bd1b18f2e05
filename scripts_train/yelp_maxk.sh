#!/bin/bash
# yelp: 4x384, dropout 0.1, lr 0.001, 3000 epochs, BCE (reference yelp_maxk.sh:14-19)
cd "$(dirname "$0")/.." && . scripts_train/common.sh
run_train yelp "${1:-sage}" maxk "${3:-32}" "${2:-97}" \
  --hidden_layers 4 --hidden_dim 384 --dropout 0.1 --lr 0.001 --epochs 3000
