#!/bin/bash
# Stage 2: dense full-model pre-finetune (PFT) on ALLaVA.
# TPU-native port of /root/reference/scripts/train/phi35mini/siglip/
# pft.sh (lr 2e-6, per-device batch 6, image_aspect_ratio pad,
# group_by_modality_length = LengthGroupedSampler, no MoE yet).
set -e
: "${TOOLKIT_DIR:=.}"
: "${MODELDIR:=phi35-siglip224}"
: "${MAX_STEPS:=10000}"

python -m competesmoe_tpu.cli.train_mm \
    --stage pft \
    --version phi35 \
    --data-path "$TOOLKIT_DIR/data/jsons/cumo_pft_allava.json" \
    --image-folder "$TOOLKIT_DIR/data" \
    --tokenizer microsoft/Phi-3.5-mini-instruct \
    --model-dir "$TOOLKIT_DIR/checkpoints/$MODELDIR/pretrain" \
    --image-aspect-ratio pad \
    --learning-rate 2e-6 \
    --per-device-batch-size 6 \
    --grad-accum 1 \
    --warmup-ratio 0.03 \
    --model-max-length 2048 \
    --num-train-steps "$MAX_STEPS" \
    --save-interval 100 \
    --log-interval 1 \
    --output-dir "$TOOLKIT_DIR/checkpoints/$MODELDIR/pft" \
    "$@"
