#!/bin/bash
# Sequential on-chip measurement battery (rounds 3-4). ONE tunnel client
# at a time (the axon tunnel is single-client). Results land in
# /tmp/*.json; fold the numbers into docs/perf.md + bench.py detail.
#
# RESUMABLE: each item skips itself if its output file already holds a
# result line — tunnel windows can be short, so a mid-battery drop loses
# only the in-flight item on rerun (plus the compile cache makes the
# rerun's compiles instant). `BATTERY_FORCE=1` re-measures everything.
# Items are ordered by value: the headline dispatch number first.
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
cd "$(dirname "$0")/.."
set -e

timeout 90 python -c "import jax; print(jax.devices())" \
  || { echo "tunnel down"; exit 1; }

run() {  # run <output-file> <cmd...>
  local out="$1"; shift
  if [ -z "$BATTERY_FORCE" ] && [ -s "$out" ] && grep -q '"metric"\|"value"\|"baseline_mb"' "$out"; then
    echo "SKIP (done): $out"; return 0
  fi
  echo "RUN: $* -> $out"
  "$@" | tee "$out"
}

# 1. headline dispatch number (honest slope) — the bench contract line
run /tmp/bench_live.json python bench.py

# 8. int8-quantized dispatch gathers A/B (serving-only; halves the bytes
#    of the two gather-walled stages — win or measured rejection lands
#    in docs/perf.md either way). Early: shares bench.py's shape/cache.
run /tmp/quant_dispatch_ab.json python tools/bench_quant_dispatch.py

# 2. speculative verify-step cost vs plain step (the claim the whole
#    speculation design rests on: 1+K tokens ~ 1 token when weight-bound)
run /tmp/spec_step_int8.json \
  python tools/bench_decode.py --spec-step 4 --quant int8 --kv-quant int8
run /tmp/spec_step_bf16.json python tools/bench_decode.py --spec-step 4
run /tmp/spec_step_int4.json \
  python tools/bench_decode.py --spec-step 4 --quant int4 --kv-quant int8

# 7. MoE-FFN decode (MixtralMoELayer): expert-bank streaming vs dense FFN
run /tmp/moe_decode_bf16.json \
  python tools/bench_decode.py --layers 8 --moe-experts 8 --kv-quant int8

# 3. engine aggregate: plain baseline, perfect-draft ceiling, then
#    realistic lookup hits. The 2026-08-19 first pass of these five
#    engine items was compile-polluted (burst-prefill shapes compiled
#    inside the timed window: 241 s TTFT medians) — DecodeEngine.warmup()
#    now precompiles every steady-state program before the clock starts.
run /tmp/engine_plain_baseline.json \
  python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --steps-per-call 8
run /tmp/engine_spec_oracle.json \
  python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --spec 4 --spec-oracle --steps-per-call 8
run /tmp/engine_spec_loop.json \
  python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --spec 4 --prompt-mode loop --steps-per-call 8

# 4. chunked prefill: live-stream stall bound under long admissions
run /tmp/engine_longprompt_baseline.json \
  python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --prompt-len 400 --max-len 1024 --steps-per-call 1
run /tmp/engine_longprompt_chunked.json \
  python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --prompt-len 400 --max-len 1024 --steps-per-call 1 --prefill-chunk 128

# 5. prefix cache: multi-turn TTFT. Park slots must cover the 16
#    concurrent conversations: the 2026-08-19 first pass used
#    --prefix-cache 4 and got prefix_cache_hits: 0 — every parked row
#    was evicted by later retirements before its turn-2 arrived, so the
#    run measured a warm cold-path, not reuse.
run /tmp/engine_multiturn_cold.json \
  python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --multi-turn --steps-per-call 8 --max-len 1024
run /tmp/engine_multiturn_parked.json \
  python tools/bench_engine.py --layers 32 --quant int8 --kv-quant int8 \
  --multi-turn --prefix-cache 16 --steps-per-call 8 --max-len 1024

# 6. remat memory A/B on the real backend: predicted HBM peak of a
#    sharded-free 4-layer train step with/without --remat
if [ -n "$BATTERY_FORCE" ] || ! grep -q '"baseline_mb"' /tmp/remat_mem.json 2>/dev/null; then
python - <<'PYEOF' | tee /tmp/remat_mem.json
import json, jax, jax.numpy as jnp
from competesmoe_tpu.models.decoder import DecoderConfig, DecoderLM
import dataclasses
def peak(remat):
    cfg = DecoderConfig(vocab_size=32064, hidden_size=3072,
                        intermediate_size=8192, num_hidden_layers=4,
                        num_attention_heads=32, num_key_value_heads=32,
                        fused_qkv=True, max_position_embeddings=4096,
                        original_max_position_embeddings=4096,
                        dtype=jnp.bfloat16, remat=remat)
    model = DecoderLM(cfg)
    ids = jnp.zeros((4, 2048), jnp.int32)
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), ids))
    def loss(p):
        logits, _, _ = model.apply(p, ids)
        return jnp.mean(logits.astype(jnp.float32) ** 2)
    c = jax.jit(jax.grad(loss)).lower(params).compile()
    m = c.memory_analysis()
    return m.temp_size_in_bytes
b, r = peak(False), peak(True)
print(json.dumps({"metric": "remat_temp_bytes", "baseline_mb": b/1e6,
                  "remat_mb": r/1e6, "saving_pct": 100*(1-r/b)}))
PYEOF
else
  echo "SKIP (done): /tmp/remat_mem.json"
fi

# 9. memory-fit envelope for the 5.1B sft stage on v5e-8 (fsdp+EP+remat,
#    single-chip AOT buffer assignment; docs/sharding.md)
run /tmp/memory_envelope.json python tools/memory_envelope.py

echo "BATTERY COMPLETE"
