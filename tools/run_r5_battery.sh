#!/bin/bash
# Round-5 on-chip measurement battery. Runs AFTER tools/run_algo_ab.py
# releases the tunnel (single-client). Same resumable contract as
# tools/run_tpu_battery.sh: each item skips itself if its output file
# already holds a result; BATTERY_FORCE=1 re-measures everything.
#
# Items close the round-4 VERDICT's remaining measurements:
#   1. int4/int8 spec-verify premium after the M<=128 quantized-kernel
#      extension (commit 444a9cf; was 2.13x on int4 via fallback paths)
#   2. seq-2048 sft envelope with blockwise-int8 Adam (commit 9a6c81b;
#      projected 12.98 GB < 15.75 — needs the on-chip AOT temp number)
#   3. prefix cache's claimed win regions, with the batched park flush
#      (commit c740d67): (a) image conversations where turn-2 re-runs
#      the SigLIP tower, (b) ~2.3k-token histories; each vs the honest
#      comparator (cold + pipeline 2)
#   4. dispatch run-to-run band decomposition (noise vs routing entropy)
#   5. 15-min mixed-traffic engine soak -> results/r5/soak.json
#   6. final live bench.py line
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
cd "$(dirname "$0")/.."
set -e
mkdir -p results/r5

timeout 90 python -c "import jax; print(jax.devices())" \
  || { echo "tunnel down"; exit 1; }

run() {  # run <output-file> <cmd...>
  local out="$1"; shift
  if [ -z "$BATTERY_FORCE" ] && [ -s "$out" ] && grep -q '"metric"\|"value"\|"aggregate' "$out"; then
    echo "SKIP (done): $out"; return 0
  fi
  echo "RUN: $* -> $out"
  # A tunnel wedge leaves a client futex-sleeping forever (observed
  # 2026-08-20); bound every item so the battery always moves on.
  timeout "${ITEM_TIMEOUT:-1200}" "$@" | tee "$out" || echo "ITEM FAILED/TIMED OUT: $out"
}

# 1. spec verify-step premium with the extended quantized kernels
run results/r5/spec_step_int4.json \
  python tools/bench_decode.py --spec-step 4 --quant int4 --kv-quant int8
run results/r5/spec_step_int8.json \
  python tools/bench_decode.py --spec-step 4 --quant int8 --kv-quant int8

# 2. seq-2048 sft envelope with int8 Adam state (v5e-8 d4e2 pricing)
run results/r5/memory_envelope_opt8.json \
  python tools/memory_envelope.py --opt-8bit --batches 1

# 3a. image-conversation multi-turn: prefix cache vs cold, both piped.
#     SigLIP tower re-run on turn 2 is what the cache claims to save.
run results/r5/mm_multiturn_cold.json \
  python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --multi-turn --image-turns --vision siglip --steps-per-call 8 \
  --max-len 1024 --pipeline 2
run results/r5/mm_multiturn_parked.json \
  python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --multi-turn --image-turns --vision siglip --steps-per-call 8 \
  --max-len 1024 --prefix-cache 16 --pipeline 2
# 3b. long-history text multi-turn (~2.3k-token turn-2 history)
run results/r5/long_multiturn_cold.json \
  python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --multi-turn --prompt-len 2200 --max-len 2560 --steps-per-call 8 \
  --pipeline 2
run results/r5/long_multiturn_parked.json \
  python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --multi-turn --prompt-len 2200 --max-len 2560 --steps-per-call 8 \
  --prefix-cache 16 --pipeline 2

# 4. dispatch band decomposition
run results/r5/dispatch_variance.json python tools/bench_variance.py

# 5. soak (15 min mixed traffic; mm probes exercise the vision path)
if [ -n "$BATTERY_FORCE" ] || ! grep -q '"minutes"' results/r5/soak.json 2>/dev/null; then
  python tools/soak_engine.py --minutes "${SOAK_MINUTES:-15}" --out results/r5/soak.json
else
  echo "SKIP (done): results/r5/soak.json"
fi

# 6. final live bench line
run /tmp/bench_live_r5.json python bench.py

echo "R5 BATTERY COMPLETE"
