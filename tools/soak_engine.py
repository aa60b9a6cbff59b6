#!/usr/bin/env python
"""Long-running engine soak: mixed traffic, leak/drift/latency assertions.

The fuzz suite (tests/test_engine_fuzz.py) proves exactness over seconds;
this drives the reference's long-running worker role
(/root/reference/moe_model/serve/model_worker.py:37-291) for MINUTES on
the real chip: greedy + sampled + multimodal + client-cancelled traffic
under pipelined dispatch, asserting along the way that

* no slot leaks (final stats: live==0, free==n_slots; every request
  retires),
* no cache drift: a fixed greedy probe re-submitted throughout the soak
  must stay token-exact with its own first answer (a KV slot corrupted
  by neighboring traffic or a stale park row would flip it),
* RSS stays bounded (no host-side leak from per-request buffers),
* engine.error stays None.

Records p50/p99 TTFT, inter-token gaps, aggregate tok/s. One JSON line +
results file. CPU smoke: COMPETESMOE_PLATFORM=cpu --tiny --minutes 0.5.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import json
import threading
import time
from pathlib import Path

import jax

if _os.environ.get("COMPETESMOE_PLATFORM"):
    jax.config.update("jax_platforms", _os.environ["COMPETESMOE_PLATFORM"])

import numpy as np

from competesmoe_tpu.serve.engine import DecodeEngine


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=20.0)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--clients", type=int, default=10)
    ap.add_argument("--max-len", type=int, default=1024)
    ap.add_argument("--steps-per-call", type=int, default=8)
    ap.add_argument("--pipeline", type=int, default=2)
    ap.add_argument("--quant", default="int8", choices=["", "int8", "int4"])
    ap.add_argument("--kv-quant", default="int8", choices=["", "int8"])
    ap.add_argument("--prefill-chunk", type=int, default=0)
    ap.add_argument("--cancel-rate", type=float, default=0.10)
    ap.add_argument("--sampled-rate", type=float, default=0.40)
    ap.add_argument("--mm-rate", type=float, default=0.10,
                    help="fraction of requests with an image (the bench "
                         "model's tiny vision tower)")
    ap.add_argument("--probe-interval-s", type=float, default=90.0)
    ap.add_argument("--rss-budget-mb", type=float, default=1500.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--prompt-mode", default="random")  # build_model compat
    ap.add_argument("--out", default="results/r5/soak.json")
    a = ap.parse_args()

    from bench_engine import build_model
    model, params = build_model(a)
    hi = min(30000, model.cfg.decoder.vocab_size - 1)
    img_hw = model.cfg.vision.image_size

    engine = DecodeEngine(model, params, n_slots=a.slots,
                          max_len=a.max_len,
                          steps_per_call=a.steps_per_call,
                          pipeline_depth=a.pipeline,
                          prefill_chunk=a.prefill_chunk)
    # prompt lengths ride the engine's pow-2 admission buckets; warm the
    # ones traffic will hit plus the sampled programs
    buckets = [32, 64, 128, 256]
    w = engine.warmup(prompt_buckets=buckets, sampled=True)
    print(f"warmup: {len(w['programs'])} programs in {w['seconds']} s",
          flush=True)

    deadline = time.monotonic() + a.minutes * 60.0
    lock = threading.Lock()
    stats = {"ttft": [], "itg": [], "tokens": 0, "requests": 0,
             "cancelled": 0, "sampled": 0, "mm": 0, "errors": []}
    probe_rec = {"expected": None, "checks": 0, "mismatches": 0}
    rss_curve = [(0.0, rss_mb())]
    t_start = time.monotonic()

    probe_prompt = np.random.default_rng(12345).integers(
        10, hi, 48).astype(np.int32)

    def run_probe():
        toks = list(engine.submit(probe_prompt.copy(),
                                  max_new_tokens=32))
        if probe_rec["expected"] is None:
            probe_rec["expected"] = toks
        else:
            probe_rec["checks"] += 1
            if toks != probe_rec["expected"]:
                probe_rec["mismatches"] += 1
                stats["errors"].append(
                    f"probe drift at t={time.monotonic()-t_start:.0f}s: "
                    f"{toks[:8]} != {probe_rec['expected'][:8]}")
        return toks

    def client(cid: int):
        rng = np.random.default_rng(a.seed * 1000 + cid)
        while time.monotonic() < deadline:
            plen = int(rng.choice([24, 48, 100, 200]))
            max_new = int(rng.integers(16, 96))
            sampled = rng.random() < a.sampled_rate
            cancel = rng.random() < a.cancel_rate
            mm = rng.random() < a.mm_rate
            prompt = rng.integers(10, hi, plen).astype(np.int32)
            px = (rng.random((1, img_hw, img_hw, 3)).astype(np.float32)
                  if mm else None)
            t0 = time.perf_counter()
            first = None
            last = None
            n = 0
            try:
                it = engine.submit(
                    prompt, pixel_values=px, max_new_tokens=max_new,
                    temperature=0.7 if sampled else 0.0,
                    top_p=0.95 if sampled else 1.0)
                stop_at = int(rng.integers(1, 8)) if cancel else None
                for tok in it:
                    now = time.perf_counter()
                    if first is None:
                        first = now
                    else:
                        with lock:
                            stats["itg"].append(now - last)
                    last = now
                    n += 1
                    if stop_at is not None and n >= stop_at:
                        it.close()  # client disconnect
                        break
            except Exception as e:  # noqa: BLE001 — record, keep soaking
                with lock:
                    stats["errors"].append(f"client{cid}: {e!r}")
                continue
            with lock:
                stats["requests"] += 1
                stats["tokens"] += n
                stats["sampled"] += int(sampled)
                stats["cancelled"] += int(cancel)
                stats["mm"] += int(mm)
                if first is not None:
                    stats["ttft"].append(first - t0)

    # initial probe twice while idle: self-consistency baseline
    run_probe()
    t0s = run_probe()
    assert t0s == probe_rec["expected"], "engine not deterministic at idle"

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(a.clients)]
    t_soak0 = time.perf_counter()
    for th in threads:
        th.start()
        time.sleep(0.2)

    next_probe = time.monotonic() + a.probe_interval_s
    while time.monotonic() < deadline:
        time.sleep(min(5.0, max(deadline - time.monotonic(), 0.1)))
        if time.monotonic() >= next_probe:
            run_probe()
            rss_curve.append((time.monotonic() - t_start, rss_mb()))
            next_probe += a.probe_interval_s
    for th in threads:
        th.join(timeout=600)
    t_soak1 = time.perf_counter()
    run_probe()  # final drift check
    rss_curve.append((time.monotonic() - t_start, rss_mb()))

    # drain + leak assertions
    time.sleep(1.0)
    s = engine.stats()
    engine.shutdown()
    leak = (s["engine_slots_live"] != 0
            or s["engine_slots_free"] != a.slots
            or s["engine_queued"] != 0)
    ok = (not leak and engine.error is None
          and probe_rec["mismatches"] == 0 and not stats["errors"]
          and rss_curve[-1][1] - rss_curve[0][1] < a.rss_budget_mb)

    ttft = np.asarray(stats["ttft"]) if stats["ttft"] else np.zeros(1)
    itg = np.asarray(stats["itg"]) if stats["itg"] else np.zeros(1)
    out = {
        "metric": "engine_soak_ok",
        "value": int(ok),
        "unit": "bool",
        "detail": {
            "minutes": a.minutes, "layers": a.layers,
            "quant": a.quant or "bf16", "kv_quant": a.kv_quant or "bf16",
            "pipeline": a.pipeline, "slots": a.slots,
            "clients": a.clients,
            "requests": stats["requests"], "tokens": stats["tokens"],
            "cancelled": stats["cancelled"], "sampled": stats["sampled"],
            "multimodal": stats["mm"],
            "agg_tok_per_s": round(
                stats["tokens"] / max(t_soak1 - t_soak0, 1e-9), 1),
            "ttft_s": {"p50": round(float(np.percentile(ttft, 50)), 3),
                       "p99": round(float(np.percentile(ttft, 99)), 3)},
            "itg_ms": {"p50": round(1e3 * float(np.percentile(itg, 50)), 1),
                       "p99": round(1e3 * float(np.percentile(itg, 99)), 1),
                       "max": round(1e3 * float(itg.max()), 1)},
            "probe_checks": probe_rec["checks"],
            "probe_mismatches": probe_rec["mismatches"],
            "slot_leak": leak, "engine_error": str(engine.error),
            "errors": stats["errors"][:10],
            "rss_mb_start": round(rss_curve[0][1], 1),
            "rss_mb_end": round(rss_curve[-1][1], 1),
            "rss_curve": [(round(t, 1), round(m, 1))
                          for t, m in rss_curve],
            "device": str(jax.devices()[0]),
        }}
    p = Path(a.out)
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
