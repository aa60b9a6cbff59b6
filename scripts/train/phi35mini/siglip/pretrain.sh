#!/bin/bash
# Stage 1: projector-only alignment pretrain on BLIP-LAION-CC-SBU-558K.
# TPU-native port of /root/reference/scripts/train/phi35mini/siglip/
# pretrain.sh (lr 1e-3, per-device batch 64, cosine + 3% warmup, seq
# 2048, save every step with keep-1). DeepSpeed zero2 is replaced by the
# mesh: dense params fsdp-shard over the data axis (--fsdp, on by
# default); $MAX_STEPS<0 means "until the data runs out" in the
# reference — pass the real step count here.
set -e
: "${TOOLKIT_DIR:=.}"
: "${MODELDIR:=phi35-siglip224}"
: "${MAX_STEPS:=2180}"   # 558k / (64 x 4 devices) ~ 1 epoch

python -m competesmoe_tpu.cli.train_mm \
    --stage pretrain \
    --version phi35 \
    --data-path "$TOOLKIT_DIR/data/llava/llava_pretrain/blip_laion_cc_sbu_558k.json" \
    --image-folder "$TOOLKIT_DIR/data/llava/llava_pretrain/images" \
    --tokenizer microsoft/Phi-3.5-mini-instruct \
    --model-dir "$TOOLKIT_DIR/checkpoints/phi35-siglip-dense" \
    --learning-rate 1e-3 \
    --per-device-batch-size 64 \
    --grad-accum 1 \
    --warmup-ratio 0.03 \
    --model-max-length 2048 \
    --num-train-steps "$MAX_STEPS" \
    --save-interval 500 \
    --log-interval 1 \
    --output-dir "$TOOLKIT_DIR/checkpoints/$MODELDIR/pretrain" \
    "$@"
