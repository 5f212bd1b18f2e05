#!/bin/bash
# flickr: 3x256, dropout 0.2, lr 0.001, 400 epochs, self-loop (reference
# scripts_train/flickr_maxk.sh hyperparameters)
cd "$(dirname "$0")/.." && . scripts_train/common.sh
run_train flickr "${1:-sage}" maxk "${3:-32}" "${2:-97}" \
  --hidden_layers 3 --hidden_dim 256 --dropout 0.2 --lr 0.001 --epochs 400
