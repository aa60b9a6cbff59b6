#!/bin/bash
# Orchestrate the 3-stage CompeteSMoE recipe (the reference's
# scripts/train/run_train_all.sh): pretrain -> pft -> sft, each stage
# consuming the previous stage's checkpoint dir. Stages resume from
# their own latest checkpoint with --resume, so a preempted run
# restarts where it left off.
set -e
export TOOLKIT_DIR="${TOOLKIT_DIR:-.}"
export MODELDIR="${MODELDIR:-phi35-siglip224}"
export TYPE_MOE="${TYPE_MOE:-competesmoe}"
export MAX_STEPS="${MAX_STEPS:--1}"
here="$(dirname "$0")/phi35mini/siglip"

echo "Starting stage pretrain"
bash "$here/pretrain.sh" --resume "$@"

echo "Starting stage pft"
bash "$here/pft.sh" --resume "$@"

echo "Starting stage sft"
bash "$here/sft.sh" --resume "$@"
