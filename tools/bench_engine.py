"""Continuous-batching engine throughput bench (serve/engine.py).

Measures aggregate decode tokens/sec and per-request TTFT when R
text-only requests arrive staggered at a DecodeEngine wrapping the
CompeteSMoE-5.1B decoder geometry (Phi-3.5-mini), vs the solo
one-request-at-a-time serving path on the same model.

The engine's win is weight-bandwidth amortization: a batch-8 decode step
costs barely more than batch-1, so 8 concurrent requests decode at ~8x
the solo aggregate. On the tunneled dev chip each device call pays
~30 ms RPC, so steps_per_call amortizes dispatch; on a local TPU use
steps_per_call=1 for minimum admission latency.

Usage:
  python tools/bench_engine.py [--layers 32] [--slots 8] [--requests 16]
      [--quant int8] [--kv-quant int8] [--max-new 64] [--steps-per-call 8]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import threading
import time

import jax

# the axon sitecustomize pins the TPU backend at interpreter start;
# JAX_PLATFORMS env alone cannot override it after that, so honor an
# explicit request (COMPETESMOE_PLATFORM=cpu => CPU smoke run)
if _os.environ.get("COMPETESMOE_PLATFORM"):
    jax.config.update("jax_platforms",
                      _os.environ["COMPETESMOE_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from competesmoe_tpu.models.decoder import DecoderLM, phi35_mini_config
from competesmoe_tpu.models.llava import LlavaModel, LlavaConfig
from competesmoe_tpu.models.projector import ProjectorConfig
from competesmoe_tpu.models.vision import VisionConfig
from competesmoe_tpu.serve.engine import DecodeEngine

from bench_decode import random_bf16_params  # noqa: E402


def build_model(a):
    if a.vision == "siglip":
        # real 5.1B multimodal geometry (SigLIP-so400m MoE tower + MoE
        # projector): the configuration where the prefix cache's claimed
        # win region lives — a turn-2 hit skips the 430M-param vision
        # forward AND the 256-image-token splice prefill entirely
        from bench_e2e_mm import HF_5P1B, random_params
        from competesmoe_tpu.constants import IMAGE_TOKEN_INDEX
        from competesmoe_tpu.models.builder import llava_config_from_hf
        hf = dict(HF_5P1B)
        hf["num_hidden_layers"] = a.layers
        if a.tiny:  # CPU smoke: same code paths, 4 image tokens
            hf.update(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_attention_heads=4,
                      num_key_value_heads=4, mm_hidden_size=32,
                      max_position_embeddings=2048,
                      original_max_position_embeddings=2048,
                      vision_config=dict(
                          hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=2,
                          image_size=28, patch_size=14))
        cfg = llava_config_from_hf(hf, "llava_phi", jnp.bfloat16)
        if a.quant or a.kv_quant:
            cfg = dataclasses.replace(
                cfg, decoder=dataclasses.replace(
                    cfg.decoder, quant=a.quant or None,
                    kv_quant=a.kv_quant or None))
        model = LlavaModel(cfg)
        s = cfg.vision.image_size
        ids = np.full((1, 8), 5, np.int32)
        ids[0, 0] = IMAGE_TOKEN_INDEX
        px = np.zeros((1, s, s, 3), np.float32)
        return model, random_params(model, jnp.asarray(ids),
                                    jnp.asarray(px))
    dec = dataclasses.replace(phi35_mini_config(),
                              num_hidden_layers=a.layers,
                              quant=a.quant or None,
                              kv_quant=a.kv_quant or None)
    if a.tiny:
        # CPU-smoke geometry: same engine code paths, seconds to compile
        # (the phi35 geometry takes >9 min of CPU XLA compiles)
        dec = dataclasses.replace(
            dec, vocab_size=128, hidden_size=64, intermediate_size=128,
            num_attention_heads=4, num_key_value_heads=4,
            max_position_embeddings=2048,
            original_max_position_embeddings=2048,
            rope_scaling_type=None, rope_short_factor=None,
            rope_long_factor=None)
    # tiny vision tower: the bench drives text-only requests; the llava
    # wrapper is what the engine serves in production
    vis = VisionConfig(hidden_size=16, intermediate_size=32,
                       num_hidden_layers=1, num_attention_heads=2,
                       image_size=28, patch_size=14)
    proj = ProjectorConfig(projector_type="linear", mm_hidden_size=16,
                           hidden_size=dec.hidden_size)
    cfg = LlavaConfig(vision=vis, projector=proj, decoder=dec,
                      tokenizer_model_max_length=None)
    model = LlavaModel(cfg)

    # init via the decoder-only fast path, then graft tiny vision params
    lm_params = random_bf16_params(DecoderLM(dec))
    ids = np.ones((1, 8), np.int32)
    px = np.zeros((1, 28, 28, 3), np.float32)
    full = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                      jnp.asarray(px))
    full["params"]["language_model"] = lm_params["params"]
    return model, jax.device_put(full)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--prompt-len", type=int, default=100)
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--steps-per-call", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=512)
    ap.add_argument("--quant", default="", choices=["", "int8", "int4"])
    ap.add_argument("--kv-quant", default="", choices=["", "int8"])
    ap.add_argument("--stagger-ms", type=float, default=50.0)
    ap.add_argument("--spec", type=int, default=0,
                    help="prompt-lookup speculative decoding: verify K "
                         "drafts per engine step (greedy, bit-exact)")
    ap.add_argument("--spec-adaptive", action="store_true",
                    help="throughput-adaptive speculation: run verify "
                         "ticks or the plain multi-step scan, whichever "
                         "measures faster (tokens/sec EWMA), probing "
                         "the losing arm every --spec-probe-interval "
                         "ticks (default: always speculate)")
    ap.add_argument("--spec-probe-interval", type=int, default=32)
    ap.add_argument("--pipeline", type=int, default=1,
                    help="pipelined tick dispatch depth: issue call N+1 "
                         "before reading call N's tokens so per-call "
                         "dispatch latency overlaps device execution "
                         "(exact output; emission observes one call "
                         "late). Requires --spec 0")
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="per-request sampling temperature (>0 with "
                         "--top-p <1 routes every step through the "
                         "nucleus program — measures the per-step "
                         "vocab-sort cost under load)")
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--prompt-mode", default="random",
                    choices=["random", "loop"],
                    help="'loop' tiles a short block so n-gram drafting "
                         "can hit (the copy-heavy-serving regime "
                         "speculation targets); 'random' is its "
                         "worst case")
    ap.add_argument("--prefill-chunk", type=int, default=0,
                    help="chunked prefill: long prompts prefill N "
                         "tokens per tick between decode steps — "
                         "watch itg_ms_max drop (a live stream's "
                         "longest stall) while long admissions land")
    ap.add_argument("--prefix-cache", type=int, default=0,
                    help="park N retired conversation rows; with "
                         "--multi-turn the turn-2 TTFT shows the "
                         "suffix-only-prefill win")
    ap.add_argument("--multi-turn", action="store_true",
                    help="each request runs TWO turns (turn 2 extends "
                         "turn 1's prompt + reply); reports turn-2 "
                         "TTFT separately — the prefix-cache metric")
    ap.add_argument("--spec-oracle", action="store_true",
                    help="with --spec: draft from a precomputed greedy "
                         "continuation (100%% acceptance) — measures "
                         "the perfect-draft throughput ceiling of the "
                         "verify machinery, independent of workload "
                         "repetitiveness")
    ap.add_argument("--tiny", action="store_true",
                    help="64-dim decoder instead of phi35 geometry: a "
                         "CPU-runnable end-to-end smoke of the full "
                         "engine (admission, chunked prefill, spec, "
                         "prefix cache) — numbers are NOT perf data")
    ap.add_argument("--vision", default="tiny",
                    choices=["tiny", "siglip"],
                    help="'siglip' builds the real 5.1B SigLIP-so400m "
                         "MoE tower + MoE projector (vs the inert tiny "
                         "tower) — required for --image-turns to mean "
                         "anything")
    ap.add_argument("--image-turns", action="store_true",
                    help="multi-turn where every request carries an "
                         "image (one <image> sentinel per prompt, the "
                         "SAME image on turn 2): with --prefix-cache "
                         "the turn-2 hit skips the vision forward and "
                         "the image-token prefill — the cache's "
                         "claimed win region")
    a = ap.parse_args()
    if a.image_turns:
        a.multi_turn = True

    model, params = build_model(a)
    rng = np.random.default_rng(0)
    hi = min(30000, model.cfg.decoder.vocab_size - 1)
    if a.prompt_mode == "loop":
        prompts = [np.tile(rng.integers(10, hi, 8),
                           a.prompt_len // 8 + 1)[: a.prompt_len]
                   .astype(np.int32) for _ in range(a.requests)]
    else:
        prompts = [rng.integers(10, hi, a.prompt_len).astype(np.int32)
                   for _ in range(a.requests)]
    pixels = [None] * a.requests
    if a.image_turns:
        from competesmoe_tpu.constants import IMAGE_TOKEN_INDEX
        s = model.cfg.vision.image_size
        for i in range(a.requests):
            prompts[i][0] = IMAGE_TOKEN_INDEX
            # distinct image per conversation: hits must come from THIS
            # conversation's parked row (prefix AND pixel hash match)
            pixels[i] = rng.normal(0, 0.5, (1, s, s, 3)
                                   ).astype(np.float32)

    engine = DecodeEngine(model, params, n_slots=a.slots,
                          max_len=a.max_len,
                          steps_per_call=a.steps_per_call,
                          spec_k=a.spec,
                          spec_adaptive=a.spec_adaptive,
                          spec_probe_interval=a.spec_probe_interval,
                          pipeline_depth=a.pipeline,
                          prefill_chunk=a.prefill_chunk,
                          prefix_cache_slots=a.prefix_cache)
    # warmup: DecodeEngine.warmup() compiles every program the timed
    # pass will hit — each burst-prefill shape (staggered arrivals form
    # groups of 1/2/4 rows), the plain step, the spec VERIFY program (a
    # distinct 1+k-token jit that otherwise compiles inside the timed
    # window: ~4 min through the remote helper, observed 2026-08-19 as
    # a 241 s TTFT), chunked prefill, park/unpark, and the multi-turn
    # turn-2 prompt bucket.
    warm_buckets = [a.prompt_len]
    if a.multi_turn:
        warm_buckets.append(a.prompt_len + a.max_new + 12)
    img_shapes = ([pixels[0].shape] if a.image_turns else ())
    w = engine.warmup(prompt_buckets=warm_buckets,
                      sampled=(a.temperature > 0),
                      image_shapes=img_shapes)
    print(f"warmup: {len(w['programs'])} programs in {w['seconds']} s",
          flush=True)

    if a.spec and a.spec_oracle:
        # discovery pass: the engine's own (exact-greedy) output is the
        # continuation the oracle will draft from in the timed pass
        cont = {}
        for p in prompts:
            cont[tuple(p.tolist())] = list(
                engine.submit(p, max_new_tokens=a.max_new))

        def oracle(history, k):
            c = cont.get(tuple(history[: a.prompt_len]))
            if c is None:
                return None
            n = len(history) - a.prompt_len
            nxt = np.asarray(c[n: n + k], np.int32)
            if nxt.size == 0:
                return None
            if nxt.size < k:
                nxt = np.concatenate(
                    [nxt, np.full(k - nxt.size, nxt[-1], np.int32)])
            return nxt

        engine._draft_fn = oracle
        engine._spec_calls = 0
        engine._spec_accepted = 0

    # pre-drawn turn-2 questions (np Generator is not thread-safe)
    turn2_qs = [rng.integers(10, 30000, 12).astype(np.int32)
                for _ in range(a.requests)]
    results = []
    lock = threading.Lock()

    def consume(i, t_submit):
        first = None
        n = 0
        last = t_submit
        max_gap = 0.0
        toks1 = []
        for tok in engine.submit(prompts[i], pixel_values=pixels[i],
                                 max_new_tokens=a.max_new,
                                 temperature=a.temperature,
                                 top_p=a.top_p):
            now = time.perf_counter()
            if first is None:
                first = now
            else:
                max_gap = max(max_gap, now - last)
            last = now
            toks1.append(tok)
            n += 1
        rec = {"ttft_s": first - t_submit, "tokens": n,
               "itg_max_s": max_gap}
        if a.multi_turn:
            # turn 2 extends turn 1's conversation (prompt + reply +
            # new question): with --prefix-cache the parked row makes
            # this a suffix-only prefill
            p2 = np.concatenate([
                prompts[i], np.asarray(toks1[:-1], np.int32),
                turn2_qs[i]])
            p_img = int(getattr(model.cfg, "num_image_tokens", 0) or 0)
            exp2 = len(p2) + (max(p_img - 1, 0) if a.image_turns else 0)
            if exp2 + a.max_new + a.spec > a.max_len:
                raise SystemExit(
                    f"--multi-turn: turn-2 prompt {exp2} (expanded) + "
                    f"max_new {a.max_new} exceeds --max-len {a.max_len};"
                    " raise --max-len or lower --max-new/--prompt-len")
            t2 = time.perf_counter()
            first2 = None
            for tok in engine.submit(p2, pixel_values=pixels[i],
                                     max_new_tokens=a.max_new,
                                     temperature=a.temperature,
                                     top_p=a.top_p):
                if first2 is None:
                    first2 = time.perf_counter()
                n += 1
            if first2 is None:
                raise SystemExit("turn-2 stream yielded nothing "
                                 f"(engine error: {engine.error})")
            rec["ttft2_s"] = first2 - t2
            rec["tokens"] = n
        rec["t_done"] = time.perf_counter()
        with lock:
            results.append(rec)

    t0 = time.perf_counter()
    threads = []
    for i in range(a.requests):
        th = threading.Thread(target=consume,
                              args=(i, time.perf_counter()), daemon=True)
        th.start()
        threads.append(th)
        time.sleep(a.stagger_ms / 1e3)
    for th in threads:
        th.join(timeout=600)
    t1 = max(r["t_done"] for r in results)
    engine.shutdown()
    assert engine.error is None, engine.error

    total_toks = sum(r["tokens"] for r in results)
    agg = total_toks / (t1 - t0)
    print(json.dumps({
        "metric": "engine_aggregate_tokens_per_sec",
        "value": round(agg, 1),
        "unit": "tok/s",
        "detail": {
            "n_requests": a.requests, "slots": a.slots,
            "layers": a.layers, "quant": a.quant or "bf16",
            "kv_quant": a.kv_quant or "bf16",
            "max_new": a.max_new, "prompt_len": a.prompt_len,
            "steps_per_call": a.steps_per_call,
            "spec_k": a.spec, "prompt_mode": a.prompt_mode,
            "temperature": a.temperature, "top_p": a.top_p,
            "spec_oracle": bool(a.spec and a.spec_oracle),
            **({"spec_verify_calls": engine._spec_calls,
                "spec_accepted_drafts": engine._spec_accepted,
                **({"spec_adaptive": True,
                    "spec_tps_verify": engine._arm_tps["verify"],
                    "spec_tps_plain": engine._arm_tps["plain"],
                    "spec_suppressed_ticks":
                        engine._spec_suppressed_ticks}
                   if a.spec_adaptive else {})}
               if a.spec else {}),
            "ttft_s_median": round(float(np.median(
                [r["ttft_s"] for r in results])), 3),
            "ttft_s_p90": round(float(np.percentile(
                [r["ttft_s"] for r in results], 90)), 3),
            # a live stream's longest stall: the metric chunked prefill
            # exists to bound (a concurrent long admission otherwise
            # freezes every stream for the whole prefill)
            "itg_ms_max": round(1e3 * max(
                r["itg_max_s"] for r in results), 1),
            "itg_ms_p90": round(1e3 * float(np.percentile(
                [r["itg_max_s"] for r in results], 90)), 1),
            "prefill_chunk": a.prefill_chunk,
            "prefix_cache": a.prefix_cache,
            **({"ttft2_s_median": round(float(np.median(
                    [r["ttft2_s"] for r in results])), 3),
                "ttft2_s_p90": round(float(np.percentile(
                    [r["ttft2_s"] for r in results], 90)), 3),
                "prefix_cache_hits": engine.stats()[
                    "engine_prefix_cache_hits"]}
               if a.multi_turn else {}),
            **({"vision": a.vision, "image_turns": True,
                "image_tokens": int(model.cfg.num_image_tokens)}
               if a.image_turns else {}),
            "wall_s": round(t1 - t0, 2),
            "device": str(jax.devices()[0]),
        }}))


if __name__ == "__main__":
    main()
