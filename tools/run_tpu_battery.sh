#!/bin/bash
# Sequential on-chip measurement battery for the round-3 serving work.
# ONE tunnel client at a time (the axon tunnel is single-client); the
# compile cache makes re-runs after timeouts resumable. Results land in
# /tmp/*.json; fold the numbers into docs/perf.md + bench.py detail.
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
cd "$(dirname "$0")/.."
set -ex

timeout 90 python -c "import jax; print(jax.devices())" \
  || { echo "tunnel down"; exit 1; }

# 1. headline dispatch number (honest slope)
python bench.py | tee /tmp/bench_live.json

# 2. speculative verify-step cost vs plain step (the claim the whole
#    speculation design rests on: 1+K tokens ~ 1 token when weight-bound)
python tools/bench_decode.py --spec-step 4 --quant int8 --kv-quant int8 \
  | tee /tmp/spec_step_int8.json
python tools/bench_decode.py --spec-step 4 | tee /tmp/spec_step_bf16.json

# 3. engine aggregate: perfect-draft ceiling, then realistic lookup hits
python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --spec 4 --spec-oracle --steps-per-call 8 \
  | tee /tmp/engine_spec_oracle.json
python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --spec 4 --prompt-mode loop --steps-per-call 8 \
  | tee /tmp/engine_spec_loop.json

# 4. chunked prefill: live-stream stall bound under long admissions
python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --prompt-len 400 --max-len 1024 --steps-per-call 1 \
  | tee /tmp/engine_longprompt_baseline.json
python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --prompt-len 400 --max-len 1024 --steps-per-call 1 \
  --prefill-chunk 128 | tee /tmp/engine_longprompt_chunked.json

# 5. prefix cache: multi-turn TTFT
python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --multi-turn --steps-per-call 8 --max-len 1024 \
  | tee /tmp/engine_multiturn_cold.json
python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --multi-turn --prefix-cache 4 --steps-per-call 8 --max-len 1024 \
  | tee /tmp/engine_multiturn_parked.json
