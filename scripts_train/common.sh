#!/bin/bash
# Shared launcher — role of the reference's per-dataset scripts_train/*.sh.
# Usage: source common.sh; run_train <dataset> <model> <nonlinear> <maxk> <seed> [extra...]
run_train() {
  dataset=$1; model=$2; nonlinear=$3; maxk=$4; seed=${5:-97}; shift 5 || shift $#
  python train.py --dataset "$dataset" --model "$model" \
    --nonlinear "$nonlinear" --maxk "$maxk" --seed "$seed" "$@"
}
