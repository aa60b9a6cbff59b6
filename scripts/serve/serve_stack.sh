#!/bin/bash
# Launch the full serving stack on one host: controller + model worker +
# browser chat + OpenAI-compatible API (the reference's
# controller/worker/gradio trio, plus the /v1 front end).
#
#   MODEL_PATH=ckpt/ scripts/serve/serve_stack.sh \
#     [--load-8bit --kv-quant int8 --mesh 1x8 --engine-slots 8 \
#      --engine-prefix-cache 4 --engine-prefill-chunk 256 --speculative 4]
#
# Extra args go to the worker (see serve/model_worker.py --help).
# Ports: controller 21001, worker 21002, web 7860, openai 8000
# (override via CONTROLLER_PORT / WORKER_PORT / WEB_PORT / OPENAI_PORT).
set -e
MODEL_PATH="${MODEL_PATH:?set MODEL_PATH to the checkpoint dir}"
CONTROLLER_PORT="${CONTROLLER_PORT:-21001}"
WORKER_PORT="${WORKER_PORT:-21002}"
WEB_PORT="${WEB_PORT:-7860}"
OPENAI_PORT="${OPENAI_PORT:-8000}"
CONV_TEMPLATE="${CONV_TEMPLATE:-phi35}"
CADDR="http://localhost:${CONTROLLER_PORT}"

pids=()
cleanup() { for p in "${pids[@]}"; do kill "$p" 2>/dev/null || true; done; }
trap cleanup EXIT

python -m competesmoe_tpu.serve.controller --port "$CONTROLLER_PORT" &
pids+=($!)
sleep 1

python -m competesmoe_tpu.serve.openai_api \
  --controller-address "$CADDR" --port "$OPENAI_PORT" \
  --conv-template "$CONV_TEMPLATE" &
pids+=($!)

python - "$CADDR" "$WEB_PORT" <<'EOF' &
import sys
from competesmoe_tpu.serve.web import serve_web
serve_web(sys.argv[1], "", port=int(sys.argv[2]))
EOF
pids+=($!)

# worker last + foreground: it owns the TPU and takes the longest to
# come up (compiles); Ctrl-C tears the whole stack down via the trap
exec_args=(--model-path "$MODEL_PATH" --port "$WORKER_PORT"
           --controller-address "$CADDR"
           --conv-template "$CONV_TEMPLATE" "$@")
python -m competesmoe_tpu.serve.model_worker "${exec_args[@]}"
