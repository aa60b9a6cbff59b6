#!/bin/bash
# Stage 3: MoE-ified sft on LLaVA-665K — the CompeteSMoE-5.1B recipe.
# TPU-native port of /root/reference/scripts/train/phi35mini/siglip/
# sft.sh: $TYPE_MOE router, 4 experts top-2, sparse upcycling (the
# builder replicates dense FFNs into experts when the checkpoint is
# dense), balance 0.01 + router-z 0.001, per-device batch 5 x 2
# grad-accum, lr 4e-6, cosine + 3% warmup, seq 2048, save every 1664
# steps. DeepSpeed ZeRO-3 is replaced by the mesh: dense params
# fsdp-shard over 'data', experts shard over 'expert' (--n-expert).
set -e
: "${TOOLKIT_DIR:=.}"
: "${MODELDIR:=phi35-siglip224}"
: "${TYPE_MOE:=competesmoe}"
: "${MAX_STEPS:=8312}"   # ~1 epoch of 665k at global batch 80 (8 dev x 5 x 2 accum)
: "${N_EXPERT:=1}"       # expert-parallel axis (2 on a v5e-8 for E=4)

python -m competesmoe_tpu.cli.train_mm \
    --stage sft \
    --version phi35 \
    --data-path "$TOOLKIT_DIR/data/jsons/llava_v1_5_mix665k.json" \
    --image-folder "$TOOLKIT_DIR/data" \
    --tokenizer microsoft/Phi-3.5-mini-instruct \
    --model-dir "$TOOLKIT_DIR/checkpoints/$MODELDIR/pft" \
    --moe-name "$TYPE_MOE" \
    --num-experts 4 \
    --num-selected 2 \
    --balance-loss-coef 0.01 \
    --router-z-loss-coef 0.001 \
    --rate-flip 0.05 \
    --max-compete-in-iter 2 \
    --image-aspect-ratio pad \
    --learning-rate 4e-6 \
    --per-device-batch-size 5 \
    --grad-accum 2 \
    --warmup-ratio 0.03 \
    --model-max-length 2048 \
    --num-train-steps "$MAX_STEPS" \
    --save-interval 1664 \
    --log-interval 1 \
    --n-expert "$N_EXPERT" \
    --output-dir "$TOOLKIT_DIR/checkpoints/$MODELDIR/sft/$TYPE_MOE" \
    "$@"
