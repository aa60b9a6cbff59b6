"""Continuous-batching engine tests: the batched slotted decode must be
token-exact vs the solo streaming path, across staggered admission, slot
reuse, padding buckets, and image prefill.

Reference role: the reference serves one HF generate per request
(moe_model/serve/model_worker.py:125-180); the engine is TPU-side
headroom over it, so the correctness oracle is our own stream_generate.
"""

import itertools
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from competesmoe_tpu.models.llava import (
    IMAGE_TOKEN_INDEX,
    LlavaModel,
    stream_generate,
)
from competesmoe_tpu.serve.engine import DecodeEngine, _bucket

from test_llava import tiny_llava_cfg

# engine correctness core rides the fast tier; the wider matrix
# (buckets, bursts, prefix cache, TP, mixed sampling) is mid-tier
# (unmarked: included in -m 'not slow', excluded from -m fast)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_llava_cfg(moe=False)
    model = LlavaModel(cfg)
    ids = np.array([[5, IMAGE_TOKEN_INDEX, 7, 8]], np.int32)
    px = np.zeros((1, 28, 28, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(px))
    return model, params


def _solo(model, params, ids, px=None, max_new=6):
    toks = []
    for chunk in stream_generate(model, params, ids[None, :], px,
                                 max_new_tokens=max_new):
        toks.extend(int(t) for t in chunk[0])
    return toks[:max_new]


def _collect(engine, ids, px=None, max_new=6, temperature=0.0):
    out = []
    done = threading.Event()

    def consume():
        for tok in engine.submit(ids, pixel_values=px,
                                 max_new_tokens=max_new,
                                 temperature=temperature):
            out.append(tok)
        done.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    return out, done


@pytest.mark.fast
def test_bucket():
    assert _bucket(1) == 32
    assert _bucket(32) == 32
    assert _bucket(33) == 64
    assert _bucket(100) == 128


@pytest.mark.fast
def test_engine_matches_solo_concurrent(tiny_model):
    model, params = tiny_model
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 60, n).astype(np.int32)
               for n in (4, 7, 11)]
    want = [_solo(model, params, p) for p in prompts]

    engine = DecodeEngine(model, params, n_slots=3, max_len=64,
                          steps_per_call=2)
    try:
        waits = [_collect(engine, p) for p in prompts]
        for (out, done), w in zip(waits, want):
            assert done.wait(timeout=60), "engine stalled"
        for (out, _), w in zip(waits, want):
            assert out == w, f"engine {out} != solo {w}"
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_staggered_admission_and_slot_reuse(tiny_model):
    model, params = tiny_model
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 60, n).astype(np.int32)
               for n in (5, 9, 6, 12)]
    want = [_solo(model, params, p) for p in prompts]

    # 2 slots, 4 requests: the last two must wait for retirements
    engine = DecodeEngine(model, params, n_slots=2, max_len=64)
    try:
        first = [_collect(engine, p) for p in prompts[:2]]
        # admit the rest only after the first pair is mid-decode
        assert any(len(o) for o, _ in first) or True
        later = [_collect(engine, p) for p in prompts[2:]]
        for (out, done), w in zip(first + later, want):
            assert done.wait(timeout=120), "engine stalled"
            assert out == w
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_image_request_matches_solo(tiny_model):
    model, params = tiny_model
    ids = np.array([5, IMAGE_TOKEN_INDEX, 7, 8, 9], np.int32)
    px = np.random.default_rng(2).normal(
        size=(1, 28, 28, 3)).astype(np.float32)
    want = _solo(model, params, ids, px)
    engine = DecodeEngine(model, params, n_slots=2, max_len=64)
    try:
        out, done = _collect(engine, ids, px)
        assert done.wait(timeout=60)
        assert out == want
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_temperature_sampling_terminates(tiny_model):
    model, params = tiny_model
    ids = np.arange(1, 6, dtype=np.int32)
    engine = DecodeEngine(model, params, n_slots=2, max_len=64)
    try:
        out, done = _collect(engine, ids, max_new=5, temperature=0.8)
        assert done.wait(timeout=60)
        assert len(out) == 5
        assert all(0 <= t < model.cfg.decoder.vocab_size for t in out)
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_rejects_oversized_prompt(tiny_model):
    model, params = tiny_model
    engine = DecodeEngine(model, params, n_slots=1, max_len=16)
    try:
        with pytest.raises(ValueError):
            next(iter(engine.submit(np.arange(10, dtype=np.int32),
                                    max_new_tokens=10)))
    finally:
        engine.shutdown()


def test_engine_rejects_oversized_image_prompt(tiny_model):
    """Capacity is checked against the SPLICED length: an image prompt
    whose raw token count fits but whose <image>-expanded length
    (raw - 1 + num_image_tokens per image) would overflow the cache must
    be rejected at submit, not silently clamped into the dump slot."""
    model, params = tiny_model
    P = model.cfg.num_image_tokens
    ids = np.array([5, IMAGE_TOKEN_INDEX, 7], np.int32)  # expanded: P + 2
    px = np.zeros((1, 28, 28, 3), np.float32)
    engine = DecodeEngine(model, params, n_slots=1, max_len=P + 8)
    try:
        # raw check would pass (3 + 8 <= P + 8); expanded must not
        with pytest.raises(ValueError):
            next(iter(engine.submit(ids, pixel_values=px,
                                    max_new_tokens=8)))
    finally:
        engine.shutdown()


def test_engine_tiny_topp_equals_greedy(tiny_model):
    """top_p -> 0 keeps only the argmax token in the nucleus, so sampled
    output must match greedy exactly (exercises the nucleus step program
    end-to-end)."""
    model, params = tiny_model
    ids = np.arange(1, 8, dtype=np.int32)
    want = _solo(model, params, ids, max_new=6)
    engine = DecodeEngine(model, params, n_slots=2, max_len=64)
    try:
        out = list(engine.submit(ids, max_new_tokens=6, temperature=1.0,
                                 top_p=1e-6))
        assert out == want
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_mixed_greedy_and_nucleus_slots(tiny_model):
    """A greedy request must stay token-exact while a top_p<1 request is
    live in another slot (the nucleus program services both)."""
    model, params = tiny_model
    rng = np.random.default_rng(3)
    greedy_ids = rng.integers(1, 60, 9).astype(np.int32)
    nuc_ids = rng.integers(1, 60, 5).astype(np.int32)
    want = _solo(model, params, greedy_ids, max_new=6)

    engine = DecodeEngine(model, params, n_slots=2, max_len=64)
    try:
        nuc_out, nuc_done = [], threading.Event()

        def consume_nuc():
            for tok in engine.submit(nuc_ids, max_new_tokens=6,
                                     temperature=0.9, top_p=0.7):
                nuc_out.append(tok)
            nuc_done.set()

        threading.Thread(target=consume_nuc, daemon=True).start()
        got = list(engine.submit(greedy_ids, max_new_tokens=6))
        assert got == want
        assert nuc_done.wait(timeout=60)
        assert len(nuc_out) == 6
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_burst_admission_batched_prefill(tiny_model):
    """Requests queued before a tick must be admitted as ONE batched
    prefill group (same bucket) and stay token-exact vs solo. Driven
    synchronously (run_thread=False) so grouping is deterministic."""
    model, params = tiny_model
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, 60, n).astype(np.int32)
               for n in (4, 7, 11)]  # all in the 32-bucket
    want = [_solo(model, params, p) for p in prompts]

    engine = DecodeEngine(model, params, n_slots=4, max_len=64,
                          run_thread=False)
    try:
        calls = []
        orig = engine._run_prefill

        def spy(bucket, ids, px, mask):
            calls.append(int(ids.shape[0]))
            return orig(bucket, ids, px, mask)

        engine._run_prefill = spy
        waits = [_collect(engine, p) for p in prompts]
        import time
        deadline = time.time() + 120
        while (engine._requests.qsize() < len(prompts)
               and time.time() < deadline):
            time.sleep(0.01)
        while (any(not d.is_set() for _, d in waits)
               and time.time() < deadline):
            engine._tick()
        for (out, done), w in zip(waits, want):
            assert done.is_set(), "engine stalled"
            assert out == w, f"engine {out} != solo {w}"
        # one padded prefill call of batch 4 (3 requests pow-2-padded),
        # not three batch-1 calls
        assert calls == [4], calls
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_burst_mixed_buckets_and_cap(tiny_model):
    """Bursts spanning prompt buckets split into one group per bucket;
    max_prefill_batch chunks oversized groups."""
    model, params = tiny_model
    rng = np.random.default_rng(6)
    short = [rng.integers(1, 60, n).astype(np.int32) for n in (3, 5, 6)]
    long = [rng.integers(1, 60, 40).astype(np.int32)]  # 64-bucket
    prompts = short + long
    want = [_solo(model, params, p) for p in prompts]

    engine = DecodeEngine(model, params, n_slots=4, max_len=64,
                          run_thread=False, max_prefill_batch=2)
    try:
        calls = []
        orig = engine._run_prefill

        def spy(bucket, ids, px, mask):
            calls.append((int(ids.shape[0]), int(ids.shape[1])))
            return orig(bucket, ids, px, mask)

        engine._run_prefill = spy
        waits = [_collect(engine, p) for p in prompts]
        import time
        deadline = time.time() + 120
        while (engine._requests.qsize() < len(prompts)
               and time.time() < deadline):
            time.sleep(0.01)
        while (any(not d.is_set() for _, d in waits)
               and time.time() < deadline):
            engine._tick()
        for (out, done), w in zip(waits, want):
            assert done.is_set(), "engine stalled"
            assert out == w
        # 32-bucket group of 3 chunks into (2, 1) under the cap=2, plus
        # the lone 64-bucket prompt
        assert sorted(calls) == [(1, 32), (1, 64), (2, 32)], calls
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_burst_image_requests_batch(tiny_model):
    """Image requests with identical pixel shapes prefill as one batch
    and stay token-exact."""
    model, params = tiny_model
    rng = np.random.default_rng(7)
    ids1 = np.array([5, IMAGE_TOKEN_INDEX, 7, 8, 9], np.int32)
    ids2 = np.array([4, IMAGE_TOKEN_INDEX, 11, 3], np.int32)
    px1 = rng.normal(size=(1, 28, 28, 3)).astype(np.float32)
    px2 = rng.normal(size=(1, 28, 28, 3)).astype(np.float32)
    want = [_solo(model, params, ids1, px1),
            _solo(model, params, ids2, px2)]

    engine = DecodeEngine(model, params, n_slots=2, max_len=64,
                          run_thread=False)
    try:
        calls = []
        orig = engine._run_prefill

        def spy(bucket, ids, px, mask):
            calls.append(int(ids.shape[0]))
            return orig(bucket, ids, px, mask)

        engine._run_prefill = spy
        waits = [_collect(engine, ids1, px1), _collect(engine, ids2, px2)]
        import time
        deadline = time.time() + 120
        while engine._requests.qsize() < 2 and time.time() < deadline:
            time.sleep(0.01)
        while (any(not d.is_set() for _, d in waits)
               and time.time() < deadline):
            engine._tick()
        for (out, done), w in zip(waits, want):
            assert done.is_set(), "engine stalled"
            assert out == w
        assert calls == [2], calls
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_abandoned_iterator_retires_slot(tiny_model):
    """Abandoning the submit() iterator mid-generation must retire the
    slot at the next token boundary (client-disconnect cancellation),
    freeing it for the next request."""
    model, params = tiny_model
    ids = np.arange(1, 7, dtype=np.int32)
    engine = DecodeEngine(model, params, n_slots=1, max_len=64)
    try:
        it = engine.submit(ids, max_new_tokens=40)
        first = [next(it) for _ in range(2)]
        assert len(first) == 2
        it.close()  # abandon -> cancelled flag -> slot retires
        import time
        deadline = time.time() + 30
        while engine._free != [0] and time.time() < deadline:
            time.sleep(0.02)
        assert engine._free == [0], "slot not retired after cancel"
        # the freed slot must serve a new request token-exactly
        want = _solo(model, params, ids, max_new=4)
        out = list(engine.submit(ids, max_new_tokens=4))
        assert out == want
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_tp_sharded_params_token_exact(tiny_model):
    """The worker chains --mesh with --engine-slots: the engine built on
    TP-sharded params (shard_llava_params) must match the unsharded
    engine token-exactly — jit propagates the param shardings into the
    prefill/step/insert programs."""
    from competesmoe_tpu.serve.model_worker import (
        shard_llava_params,
        tp_mesh_from_str,
    )

    model, params = tiny_model
    ids = np.arange(1, 9, dtype=np.int32)
    want = _solo(model, params, ids, max_new=6)

    sharded = shard_llava_params(dict(params), "1x2")
    engine = DecodeEngine(model, sharded, n_slots=2, max_len=64,
                          mesh=tp_mesh_from_str("1x2"))
    try:
        # the engine cache is pinned to the kv-head sharding up front
        spec = engine._cache.k.sharding.spec
        assert "model" in str(spec), spec
        out = list(engine.submit(ids, max_new_tokens=6))
        assert out == want
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_stats_telemetry(tiny_model):
    """stats() reports slots/queue/token telemetry for the worker's
    /worker_get_status endpoint."""
    model, params = tiny_model
    engine = DecodeEngine(model, params, n_slots=2, max_len=64)
    try:
        s0 = engine.stats()
        assert s0["engine_slots_free"] == 2
        assert s0["engine_tokens_emitted"] == 0
        out = list(engine.submit(np.arange(1, 6, dtype=np.int32),
                                 max_new_tokens=4))
        s1 = engine.stats()
        assert s1["engine_tokens_emitted"] == len(out) == 4
        assert s1["engine_slots_free"] == 2
        assert s1["engine_tokens_per_sec_lifetime"] > 0
    finally:
        engine.shutdown()


def test_engine_prefix_cache_multiturn_token_exact(tiny_model):
    """Turn 2 (prompt = turn-1 prompt + reply + new text) served via the
    prefix cache must match a cold engine token-exactly, and must
    prefill only the suffix."""
    model, params = tiny_model
    p1 = np.arange(1, 9, dtype=np.int32)
    engine = DecodeEngine(model, params, n_slots=2, max_len=64,
                          run_thread=False, prefix_cache_slots=2)
    try:
        import time

        def run(ids, max_new):
            out, done = _collect(engine, ids, max_new=max_new)
            deadline = time.time() + 120
            while engine._requests.qsize() < 1 and time.time() < deadline:
                time.sleep(0.01)
            while not done.is_set() and time.time() < deadline:
                engine._tick()
            assert done.is_set(), "engine stalled"
            return out

        reply1 = run(p1, 6)
        assert engine.stats()["engine_prefix_cache_hits"] == 0
        # turn 2: full conversation so far + new user text. The parked
        # row holds KV for p1 + reply1[:-1]; suffix = reply1[-1:] + new.
        p2 = np.concatenate([p1, np.asarray(reply1, np.int32),
                             np.asarray([30, 31, 32], np.int32)])

        calls = []
        orig_unpark = engine._unpark_admit
        orig_prefill = engine._run_prefill

        def spy_unpark(*args):
            calls.append(("unpark", int(args[6].shape[1])))
            return orig_unpark(*args)

        def spy_prefill(bucket, ids, px, mask):
            calls.append(("cold", int(ids.shape[1])))
            return orig_prefill(bucket, ids, px, mask)

        engine._unpark_admit = spy_unpark
        engine._run_prefill = spy_prefill
        reply2 = run(p2, 6)
        assert engine.stats()["engine_prefix_cache_hits"] == 1
        # suffix = 1 carried token + 3 new -> 32-bucket unpark, no cold
        assert calls == [("unpark", 32)], calls
        assert engine.error is None
    finally:
        engine.shutdown()

    cold = DecodeEngine(model, params, n_slots=2, max_len=64)
    try:
        want = list(cold.submit(p2, max_new_tokens=6))
    finally:
        cold.shutdown()
    assert reply2 == want, f"reused {reply2} != cold {want}"


def test_engine_prefix_cache_grouped_reuse_token_exact(tiny_model):
    """Three simultaneous turn-2 arrivals with parked prefixes must
    admit as ONE fused unpark_admit call (pow-2 padded to 4 rows), each
    stream token-exact vs a cold engine. Sequential per-hit admission
    was the measured regression of the first on-chip multi-turn run
    (turn-2 TTFT 1.788 s parked vs 1.307 s cold, v5e-1 2026-08-19)."""
    model, params = tiny_model
    prompts = [np.arange(1 + 7 * i, 9 + 7 * i, dtype=np.int32) % 60 + 1
               for i in range(3)]
    engine = DecodeEngine(model, params, n_slots=4, max_len=64,
                          run_thread=False, prefix_cache_slots=4)
    try:
        import time

        def drain(dones, n_queued):
            deadline = time.time() + 120
            while (engine._requests.qsize() < n_queued
                   and time.time() < deadline):
                time.sleep(0.01)
            while (not all(d.is_set() for d in dones)
                   and time.time() < deadline):
                engine._tick()
            assert all(d.is_set() for d in dones), "engine stalled"

        outs, dones = zip(*[_collect(engine, p, max_new=5)
                            for p in prompts])
        drain(dones, 3)
        assert engine.stats()["engine_prefix_cache_hits"] == 0
        followups = [np.concatenate([p, np.asarray(o, np.int32),
                                     np.asarray([40 + i, 41], np.int32)])
                     for i, (p, o) in enumerate(zip(prompts, outs))]

        calls = []
        orig_unpark = engine._unpark_admit

        def spy_unpark(*args):
            calls.append(tuple(args[6].shape))
            return orig_unpark(*args)

        engine._unpark_admit = spy_unpark
        outs2, dones2 = zip(*[_collect(engine, f, max_new=5)
                              for f in followups])
        drain(dones2, 3)
        assert engine.stats()["engine_prefix_cache_hits"] == 3
        # one grouped call: 3 hits pad to 4 rows, suffix bucket 32
        assert calls == [(4, 32)], calls
        assert engine.error is None
    finally:
        engine.shutdown()

    for f, got in zip(followups, outs2):
        cold = DecodeEngine(model, params, n_slots=2, max_len=64)
        try:
            want = list(cold.submit(f, max_new_tokens=5))
        finally:
            cold.shutdown()
        assert got == want, f"reused {got} != cold {want}"


def test_engine_prefix_cache_image_conversation(tiny_model):
    """A multi-turn conversation that started with an image reuses the
    parked row only when the pixel hash matches."""
    model, params = tiny_model
    rng = np.random.default_rng(9)
    px = rng.normal(size=(1, 28, 28, 3)).astype(np.float32)
    px_other = rng.normal(size=(1, 28, 28, 3)).astype(np.float32)
    p1 = np.array([5, IMAGE_TOKEN_INDEX, 7, 8, 9], np.int32)

    engine = DecodeEngine(model, params, n_slots=2, max_len=64,
                          prefix_cache_slots=2)
    try:
        reply1 = list(engine.submit(p1, pixel_values=px,
                                    max_new_tokens=4))
        p2 = np.concatenate([p1, np.asarray(reply1, np.int32),
                             np.asarray([20, 21], np.int32)])
        # same image -> hit
        reply2 = list(engine.submit(p2, pixel_values=px,
                                    max_new_tokens=4))
        assert engine.stats()["engine_prefix_cache_hits"] == 1
        # different image -> cold (no hit increment)
        _ = list(engine.submit(p2, pixel_values=px_other,
                               max_new_tokens=4))
        assert engine.stats()["engine_prefix_cache_hits"] == 1
        assert engine.error is None
    finally:
        engine.shutdown()

    cold = DecodeEngine(model, params, n_slots=2, max_len=64)
    try:
        want = list(cold.submit(p2, pixel_values=px, max_new_tokens=4))
    finally:
        cold.shutdown()
    assert reply2 == want


def test_engine_speculative_matches_solo(tiny_model):
    """spec_k>0 must not change greedy output — drafts are only ever
    accepted when they equal the model's own argmax (bit-exact)."""
    model, params = tiny_model
    rng = np.random.default_rng(7)
    # prompts with recurring n-grams so the drafts actually fire
    base = rng.integers(1, 60, 4).astype(np.int32)
    prompts = [np.concatenate([base, base, base[:2]]).astype(np.int32),
               rng.integers(1, 60, 9).astype(np.int32),
               np.tile(rng.integers(1, 60, 3), 4).astype(np.int32)]
    want = [_solo(model, params, p, max_new=10) for p in prompts]

    engine = DecodeEngine(model, params, n_slots=3, max_len=64, spec_k=3)
    try:
        waits = [_collect(engine, p, max_new=10) for p in prompts]
        for (out, done), w in zip(waits, want):
            assert done.wait(timeout=60), "engine stalled"
        for (out, _), w in zip(waits, want):
            assert out == w, f"spec engine {out} != solo {w}"
        assert engine.error is None
        st = engine.stats()
        assert st["engine_spec_verify_calls"] > 0
    finally:
        engine.shutdown()


def test_engine_speculative_accepts_on_repetitive_model(tiny_model):
    """On a prompt whose greedy continuation repeats, prompt lookup must
    accept drafts (tokens-per-step > 1) — exercised deterministically
    with run_thread=False."""
    model, params = tiny_model
    # find a prompt whose greedy output contains a repeated bigram so
    # lookup drafting can hit; the tiny random model repeats heavily
    rng = np.random.default_rng(3)
    prompt = None
    for _ in range(20):
        p = rng.integers(1, 60, 6).astype(np.int32)
        toks = _solo(model, params, p, max_new=8)
        if len(set(zip(toks, toks[1:]))) < len(toks) - 1:
            prompt = p
            break
    if prompt is None:
        pytest.skip("tiny model produced no repetition to speculate on")

    want = _solo(model, params, prompt, max_new=10)
    engine = DecodeEngine(model, params, n_slots=1, max_len=64,
                          spec_k=3, run_thread=False)
    try:
        out, done = _collect(engine, prompt, max_new=10)
        for _ in range(40):
            engine._tick()
            if done.is_set():
                break
        assert done.is_set()
        assert out == want
        assert engine._spec_accepted > 0, \
            "no drafts accepted on a repetitive continuation"
    finally:
        engine.shutdown()


def test_engine_speculative_mixed_with_sampled_slot(tiny_model):
    """A temp>0 slot rides the spec step taking exactly one drawn token
    per verify; greedy slots stay bit-exact beside it."""
    model, params = tiny_model
    rng = np.random.default_rng(11)
    gp = np.tile(rng.integers(1, 60, 3), 3).astype(np.int32)
    want = _solo(model, params, gp, max_new=8)

    engine = DecodeEngine(model, params, n_slots=2, max_len=64, spec_k=2)
    try:
        g = _collect(engine, gp, max_new=8)
        s = _collect(engine, rng.integers(1, 60, 5).astype(np.int32),
                     max_new=8, temperature=0.9)
        assert g[1].wait(timeout=60) and s[1].wait(timeout=60)
        assert g[0] == want
        assert len(s[0]) == 8
        assert engine.error is None
    finally:
        engine.shutdown()


def _tick_clock():
    """Deterministic clock for the spec bandit: +1 per call. Each
    spec-enabled tick reads it exactly twice (t0 + record), so dt == 1
    and the per-arm tokens/sec EWMA reduces to tokens-per-tick — the
    bandit's decisions become pure arithmetic, no wall-time flake."""
    c = itertools.count()
    return lambda: float(next(c))


def test_engine_adaptive_spec_parks_bad_drafts(tiny_model):
    """spec_adaptive: a draft source that never matches the model's
    argmax makes a verify tick worth 1 token vs steps_per_call for the
    plain scan; the throughput bandit must park speculation, with
    output still exactly the solo greedy tokens. Measured basis (v5e-1,
    2026-08-19, 32L int8+kv8, slots=8, steps_per_call=8): lookup drafts
    on loop prompts hit 100% per-draft acceptance yet net 237.6 tok/s
    vs 482.6 plain — acceptance rate is the wrong gate signal, realized
    tokens/sec is the right one."""
    model, params = tiny_model
    rng = np.random.default_rng(13)
    prompt = rng.integers(1, 60, 7).astype(np.int32)
    want = _solo(model, params, prompt, max_new=12)

    def garbage_draft(hist, k):
        # vocab-edge tokens: essentially never the tiny model's argmax
        return np.full(k, 61, np.int32)

    engine = DecodeEngine(model, params, n_slots=1, max_len=64,
                          spec_k=3, draft_fn=garbage_draft,
                          steps_per_call=4, spec_adaptive=True,
                          spec_probe_interval=6, clock=_tick_clock(),
                          run_thread=False)
    try:
        out, done = _collect(engine, prompt, max_new=12)
        ticks = 0
        for _ in range(80):
            engine._tick()
            ticks += 1
            if done.is_set():
                break
        assert done.is_set()
        assert out == want
        st = engine.stats()
        assert st["engine_spec_suppressed_ticks"] > 0, \
            "bandit never parked a 1-token-per-tick verify arm"
        assert st["engine_spec_verify_calls"] < ticks
        # measured arms: verify 1 tok/tick, plain steps_per_call=4
        assert st["engine_spec_tps_plain"] > st["engine_spec_tps_verify"]
    finally:
        engine.shutdown()


def test_engine_adaptive_spec_keeps_good_drafts(tiny_model):
    """spec_adaptive with an oracle drafter (drafts = the model's own
    greedy continuation) and 1+k > steps_per_call: the verify arm
    measures faster, the bandit keeps speculating (one plain measuring
    tick aside), and output is exact."""
    model, params = tiny_model
    rng = np.random.default_rng(17)
    prompt = rng.integers(1, 60, 7).astype(np.int32)
    want = _solo(model, params, prompt, max_new=12)
    plen = len(prompt)

    def oracle_draft(hist, k):
        n_emitted = len(hist) - plen
        d = want[n_emitted:n_emitted + k]
        return np.asarray(d, np.int32) if len(d) == k else None

    engine = DecodeEngine(model, params, n_slots=1, max_len=64,
                          spec_k=3, draft_fn=oracle_draft,
                          steps_per_call=2, spec_adaptive=True,
                          spec_probe_interval=8, clock=_tick_clock(),
                          run_thread=False)
    try:
        out, done = _collect(engine, prompt, max_new=12)
        for _ in range(40):
            engine._tick()
            if done.is_set():
                break
        assert done.is_set()
        assert out == want
        st = engine.stats()
        # exactly one plain tick to measure that arm, then verify wins
        # (4 tok/tick vs 2)
        assert st["engine_spec_suppressed_ticks"] <= 2
        assert st["engine_spec_tps_verify"] > st["engine_spec_tps_plain"]
        assert engine._spec_accepted > 0
    finally:
        engine.shutdown()


def test_engine_adaptive_spec_reprobes_and_recovers(tiny_model):
    """After parking, the bandit probes the verify arm every
    spec_probe_interval same-arm ticks; a good probe (drafter turned
    oracle) re-enables speculation instantly via the asymmetric EWMA
    (instant up, smooth decay down)."""
    model, params = tiny_model
    rng = np.random.default_rng(19)
    prompt = rng.integers(1, 60, 7).astype(np.int32)
    want = _solo(model, params, prompt, max_new=24)
    plen = len(prompt)
    phase = {"bad": True}

    def flaky_draft(hist, k):
        if phase["bad"]:
            return np.full(k, 61, np.int32)
        n_emitted = len(hist) - plen
        d = want[n_emitted:n_emitted + k]
        return np.asarray(d, np.int32) if len(d) == k else None

    engine = DecodeEngine(model, params, n_slots=1, max_len=64,
                          spec_k=3, draft_fn=flaky_draft,
                          steps_per_call=4, spec_adaptive=True,
                          spec_probe_interval=3, clock=_tick_clock(),
                          run_thread=False)
    try:
        out, done = _collect(engine, prompt, max_new=24)
        # drive until the bandit parks speculation, then flip the
        # drafter good
        for _ in range(20):
            engine._tick()
            if engine._spec_suppressed_ticks >= 2 or done.is_set():
                break
        assert engine._spec_suppressed_ticks >= 2, "never parked"
        phase["bad"] = False
        # recovery = two consecutive verify ticks after the probe (one
        # good probe re-raises the estimate instantly; the NEXT tick
        # choosing verify again proves the arm flipped back). Checked
        # mid-stream because the final partial tick (fewer tokens left
        # than 1+k) legitimately decays the verify estimate again.
        recovered = False
        for _ in range(60):
            engine._tick()
            arm, run = engine._arm_streak
            recovered = recovered or (arm == "verify" and run >= 2)
            if done.is_set():
                break
        assert done.is_set()
        assert out == want
        assert recovered, "bandit never resumed speculating after probe"
    finally:
        engine.shutdown()


def test_engine_chunked_prefill_token_exact(tiny_model):
    """A long text prompt admitted via chunked prefill produces exactly
    the solo greedy tokens (continue-prefill across chunks is the same
    math as one-shot prefill), and interleaves with a live stream."""
    model, params = tiny_model
    rng = np.random.default_rng(21)
    long_p = rng.integers(1, 60, 23).astype(np.int32)
    short_p = rng.integers(1, 60, 4).astype(np.int32)
    want_long = _solo(model, params, long_p, max_new=6)
    want_short = _solo(model, params, short_p, max_new=8)

    engine = DecodeEngine(model, params, n_slots=2, max_len=64,
                          prefill_chunk=8, run_thread=False)
    try:
        s = _collect(engine, short_p, max_new=8)
        g = _collect(engine, long_p, max_new=6)
        for _ in range(40):
            engine._tick()
            if s[1].is_set() and g[1].is_set():
                break
        assert s[1].is_set() and g[1].is_set(), "engine stalled"
        assert s[0] == want_short
        assert g[0] == want_long
        assert engine.error is None
        # the long prompt went through the staging path: 23 tokens at
        # chunk 8 = 3 chunk calls before the splice
        assert engine.stats()["engine_chunked_prefill_queued"] == 0
    finally:
        engine.shutdown()


def test_engine_chunked_prefill_short_prompts_stay_grouped(tiny_model):
    """Prompts at or under the chunk size keep the one-shot grouped
    admission (no staging detour)."""
    model, params = tiny_model
    rng = np.random.default_rng(23)
    p = rng.integers(1, 60, 6).astype(np.int32)
    want = _solo(model, params, p, max_new=5)
    engine = DecodeEngine(model, params, n_slots=2, max_len=64,
                          prefill_chunk=8, run_thread=False)
    try:
        out, done = _collect(engine, p, max_new=5)
        for _ in range(20):
            engine._tick()
            if done.is_set():
                break
        assert done.is_set() and out == want
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_chunked_prefill_with_speculation(tiny_model):
    """Chunked prefill composes with spec_k (the finalize path feeds the
    same insert_many; decode ticks run the spec step)."""
    model, params = tiny_model
    rng = np.random.default_rng(29)
    long_p = np.tile(rng.integers(1, 60, 4), 5).astype(np.int32)
    want = _solo(model, params, long_p, max_new=8)
    engine = DecodeEngine(model, params, n_slots=1, max_len=64,
                          prefill_chunk=8, spec_k=2, run_thread=False)
    try:
        out, done = _collect(engine, long_p, max_new=8)
        for _ in range(40):
            engine._tick()
            if done.is_set():
                break
        assert done.is_set() and out == want
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_chunked_prefill_cancelled_while_queued(tiny_model):
    """Abandoning a request before/while its chunked prefill runs frees
    the reserved slot."""
    model, params = tiny_model
    rng = np.random.default_rng(31)
    long_p = rng.integers(1, 60, 20).astype(np.int32)
    engine = DecodeEngine(model, params, n_slots=1, max_len=64,
                          prefill_chunk=8, run_thread=False)
    try:
        out, done = _collect(engine, long_p, max_new=6)
        engine._tick()          # starts the chunked prefill
        assert engine._pf_state is not None
        engine._pf_state["req"].cancelled = True   # client disconnected
        for _ in range(10):
            engine._tick()
            if done.is_set():
                break
        assert done.is_set()
        assert out == []        # nothing was emitted
        assert len(engine._free) == 1 and engine._pf_state is None
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_tp_with_speculation_token_exact(tiny_model):
    """spec_k composes with the TP mesh: the verify program runs on
    sharded params + the mesh-pinned cache and stays bit-exact."""
    from competesmoe_tpu.serve.model_worker import (
        shard_llava_params,
        tp_mesh_from_str,
    )

    model, params = tiny_model
    ids = np.tile(np.arange(1, 5, dtype=np.int32), 3)
    want = _solo(model, params, ids, max_new=8)

    sharded = shard_llava_params(dict(params), "1x2")
    engine = DecodeEngine(model, sharded, n_slots=2, max_len=64,
                          mesh=tp_mesh_from_str("1x2"), spec_k=3)
    try:
        out = list(engine.submit(ids, max_new_tokens=8))
        assert out == want
        assert engine.error is None
        assert engine.stats()["engine_spec_verify_calls"] > 0
    finally:
        engine.shutdown()


def test_spec_sampling_first_token_marginal_unbiased(tiny_model):
    """Speculative SAMPLING (point-mass rejection scheme): the marginal
    of the first emitted token must equal the model's (temperature-
    scaled) next-token distribution regardless of the draft — accept
    d w.p. p(d), else resample from the renormalized residual. Checked
    empirically over many identical slots against the exact softmax."""
    import jax.numpy as jnp

    model, params = tiny_model
    B, k = 1024, 2
    prompt = np.arange(1, 7, dtype=np.int32)

    engine = DecodeEngine(model, params, n_slots=B, max_len=32,
                          spec_k=k, run_thread=False)
    try:
        from competesmoe_tpu.models.decoder import KVCache

        # identical state in every slot: prefill the prompt batch-wide
        ids = jnp.asarray(np.tile(prompt[None], (B, 1)))
        cache = KVCache.create(model.cfg.decoder, B, 32)
        out = model.apply(params, ids, None, cache=cache)
        cache = out.cache

        cur = jnp.full((B,), 9, jnp.int32)          # next fed token
        temps = jnp.full((B,), 1.0, jnp.float32)
        topps = jnp.ones((B,), jnp.float32)
        # exact distribution after feeding `cur` — compute via one
        # plain step on a copy of the state
        probe = model.apply(params, np.full((B, 1), 9, np.int32), None,
                            cache=cache)
        p_true = np.asarray(
            jax.nn.softmax(probe.logits[0, 0].astype(np.float32)))
        # draft = the most likely token (high acceptance) in arm 1 and
        # an unlikely token in arm 2: the marginal must match BOTH times
        for d0 in (int(p_true.argmax()), int(p_true.argmin())):
            drafts = jnp.full((B, k), d0, jnp.int32)
            toks, n_acc, cur2, _ = engine._spec_plain(
                params, cur,
                jax.tree_util.tree_map(jnp.copy, cache),
                jax.random.PRNGKey(d0), temps, topps, drafts)
            first = np.asarray(toks)[:, 0]
            freq = np.bincount(first, minlength=p_true.size) / B
            # 5-sigma binomial tolerance on the top tokens
            for t in np.argsort(p_true)[-5:]:
                tol = 5 * np.sqrt(p_true[t] * (1 - p_true[t]) / B) + 1e-3
                assert abs(freq[t] - p_true[t]) <= tol, (
                    f"draft={d0} token={t}: freq {freq[t]:.4f} vs "
                    f"p {p_true[t]:.4f} (tol {tol:.4f})")
    finally:
        engine.shutdown()


def test_engine_prefix_cache_with_speculation_token_exact(tiny_model):
    """A prefix-cache unpark composes with spec_k: the continuation
    after a park hit stays token-exact vs solo greedy decode (verify
    steps run on the spliced row)."""
    import time

    model, params = tiny_model
    p1 = np.tile(np.arange(1, 5, dtype=np.int32), 2)
    engine = DecodeEngine(model, params, n_slots=2, max_len=64,
                          run_thread=False, prefix_cache_slots=2,
                          spec_k=2)
    try:
        def run(ids, max_new):
            out, done = _collect(engine, ids, max_new=max_new)
            deadline = time.time() + 120
            while engine._requests.qsize() < 1 and time.time() < deadline:
                time.sleep(0.01)
            while not done.is_set() and time.time() < deadline:
                engine._tick()
            assert done.is_set(), "engine stalled"
            return out

        reply1 = run(p1, 6)
        p2 = np.concatenate([p1, np.asarray(reply1, np.int32),
                             np.asarray([30, 31, 32], np.int32)])
        reply2 = run(p2, 6)
        assert engine.stats()["engine_prefix_cache_hits"] == 1
        assert engine.error is None
    finally:
        engine.shutdown()
    want = _solo(model, params, p2, max_new=6)
    assert reply2 == want, f"park+spec {reply2} != solo {want}"


def test_engine_error_releases_chunked_prefill_waiters(tiny_model):
    """An engine-thread crash must unblock EVERY consumer, including
    requests parked in the chunked-prefill queue / in-flight staging —
    without _release_waiters they would block on out.get() forever."""
    model, params = tiny_model
    rng = np.random.default_rng(3)
    long_prompt = rng.integers(1, 60, 24).astype(np.int32)

    engine = DecodeEngine(model, params, n_slots=1, max_len=64,
                          run_thread=False, prefill_chunk=8)
    try:
        out, done = _collect(engine, long_prompt, max_new=4)
        deadline = __import__("time").time() + 60
        while (engine._requests.qsize() < 1
               and __import__("time").time() < deadline):
            __import__("time").sleep(0.01)
        engine._admit()          # routes the long prompt to _pf_queue
        engine._pf_start()       # reserves the slot, stages the prefill
        assert engine._pf_state is not None
        # simulate the engine loop dying mid-prefill
        engine.error = RuntimeError("boom")
        engine._release_waiters()
        assert done.wait(timeout=30), "waiter hung after engine error"
        assert out == []
    finally:
        engine.shutdown()


def test_engine_shutdown_releases_waiters(tiny_model):
    """shutdown() must not leave a consumer blocked on out.get()."""
    model, params = tiny_model
    engine = DecodeEngine(model, params, n_slots=1, max_len=64,
                          run_thread=False)
    out, done = _collect(engine, np.asarray([3, 4, 5], np.int32),
                         max_new=4)
    deadline = __import__("time").time() + 60
    while (engine._requests.qsize() < 1
           and __import__("time").time() < deadline):
        __import__("time").sleep(0.01)
    engine.shutdown()            # never ticked: request still queued
    assert done.wait(timeout=30), "waiter hung after shutdown"


def _program_counts(engine):
    """Total compiled-trace count across every engine device program
    (jit trace caches) plus the shared prefill-fn cache — equality
    before/after traffic means NO program compiled inside the window."""
    from competesmoe_tpu.models import llava as _llava

    fns = [engine._step_plain, engine._step_nucleus,
           engine._insert_many, engine._park_put,
           engine._unpark_admit, engine._chunk_prefill]
    if engine._spec_k:
        fns += [engine._spec_plain, engine._spec_nucleus]
    n = sum(f._cache_size() for f in fns)
    for pf, ds in _llava._GEN_FN_CACHE.values():
        n += pf._cache_size() + ds._cache_size()
    return n


def test_engine_warmup_precompiles_everything(tiny_model):
    """DecodeEngine.warmup() must leave NOTHING to compile in steady
    state: a full mixed workload afterwards (4-wide greedy burst,
    nucleus-sampled request, chunked long prompt, speculative ticks,
    turn-2 prefix reuse) adds zero new traces to any engine program,
    stays token-exact vs solo, and warmup traffic is scrubbed from
    stats()/the prefix cache."""
    model, params = tiny_model
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 60, 20).astype(np.int32)
               for _ in range(4)]
    long_p = rng.integers(1, 60, 70).astype(np.int32)
    want = [_solo(model, params, p) for p in prompts]
    want_long = _solo(model, params, long_p)

    engine = DecodeEngine(model, params, n_slots=4, max_len=256,
                          spec_k=2, prefill_chunk=64,
                          prefix_cache_slots=8)
    try:
        rec = engine.warmup(prompt_buckets=(20,), sampled=True)
        assert rec["programs"], "warmup reported no programs"
        # warmup traffic scrubbed: telemetry + park reflect real
        # serving only
        st = engine.stats()
        assert st["engine_tokens_emitted"] == 0
        assert st["engine_prefix_cache_hits"] == 0
        assert st["engine_spec_verify_calls"] == 0
        assert all(m is None for m in engine._park_meta)

        before = _program_counts(engine)
        waits = [_collect(engine, p) for p in prompts]
        for (out, done), w in zip(waits, want):
            assert done.wait(timeout=120), "engine stalled"
            assert out == w
        out_l, done_l = _collect(engine, long_p)
        sampled_done = threading.Event()

        def sampled_consume():
            for _ in engine.submit(prompts[0][:8], max_new_tokens=4,
                                   temperature=0.7, top_p=0.9):
                pass
            sampled_done.set()

        threading.Thread(target=sampled_consume, daemon=True).start()
        assert done_l.wait(timeout=120), "chunked request stalled"
        assert out_l == want_long
        assert sampled_done.wait(timeout=120), "sampled request stalled"
        # turn 2 extends prompt 0's finished conversation: prefix reuse
        follow = np.concatenate(
            [prompts[0], np.asarray(want[0], np.int32),
             rng.integers(1, 60, 6).astype(np.int32)])
        out2, done2 = _collect(engine, follow)
        assert done2.wait(timeout=120), "turn-2 request stalled"
        assert out2 == _solo(model, params, follow)
        assert engine.stats()["engine_prefix_cache_hits"] == 1
        assert engine.error is None
        assert _program_counts(engine) == before, (
            "steady-state traffic compiled a new program after warmup")
    finally:
        engine.shutdown()


def test_engine_warmup_with_adaptive_bandit(tiny_model):
    """--speculative --spec-adaptive --engine-warmup: the bandit must
    not gate warmup's forced-draft spec pass (the first tick's
    jit-compile stall would otherwise be charged to an arm, _spec_gate
    could pick plain, and the verify program would stay uncompiled —
    the exact stall warmup exists to prevent). After warmup the bandit
    is re-enabled with fresh arm estimates and live speculative traffic
    compiles nothing new."""
    model, params = tiny_model
    rng = np.random.default_rng(29)
    prompt = rng.integers(1, 60, 12).astype(np.int32)
    want = _solo(model, params, prompt, max_new=8)
    plen = len(prompt)

    def oracle_draft(hist, k):
        n = len(hist) - plen
        d = want[n:n + k]
        return np.asarray(d, np.int32) if len(d) == k else None

    engine = DecodeEngine(model, params, n_slots=2, max_len=128,
                          spec_k=2, draft_fn=oracle_draft,
                          steps_per_call=1, spec_adaptive=True)
    try:
        rec = engine.warmup(prompt_buckets=(16,))
        assert any("spec" in p for p in rec["programs"]), (
            "warmup skipped the forced-draft spec pass under the bandit")
        # bandit restored, estimates scrubbed (warmup ticks carry
        # compile stalls that must not seed the arms)
        assert engine._spec_adaptive is True
        assert engine._arm_tps == {"verify": None, "plain": None}
        before = _program_counts(engine)
        out, done = _collect(engine, prompt, max_new=8)
        assert done.wait(timeout=120), "engine stalled"
        assert out == want
        assert engine.stats()["engine_spec_verify_calls"] > 0
        assert _program_counts(engine) == before, (
            "live spec traffic compiled a new program after warmup")
    finally:
        engine.shutdown()


def test_spec_record_draftless_tick_decays_not_pins(tiny_model):
    """A verify-gated tick that found no drafts executes the PLAIN scan
    at full steps_per_call throughput; charging that (fast) tick into
    the verify arm must take the smooth-decay path, not the instant-up
    max() — otherwise draft-sparse traffic pins the verify estimate at
    plain level and the bandit latches verify-chosen mode, eating slow
    verify ticks when drafts reappear on a verify-losing workload."""
    model, params = tiny_model
    engine = DecodeEngine(model, params, n_slots=1, max_len=32,
                          spec_k=2, draft_fn=lambda h, k: None,
                          spec_adaptive=True, clock=_tick_clock(),
                          run_thread=False)
    try:
        engine._arm_tps = {"verify": 2.0, "plain": None}
        t0 = engine._clock()
        engine._spec_record("verify", 10, t0, instant_up=False)
        assert engine._arm_tps["verify"] == pytest.approx(
            0.8 * 2.0 + 0.2 * 10.0)
        # a tick that actually ran a verify step keeps instant-up (one
        # good probe re-enables a parked arm)
        t0 = engine._clock()
        engine._spec_record("verify", 10, t0)
        assert engine._arm_tps["verify"] == pytest.approx(10.0)
    finally:
        engine.shutdown()


def test_engine_pipelined_matches_solo_with_slot_reuse(tiny_model):
    """pipeline_depth=2 (issue call N+1 before reading call N) must be
    token-exact through the hard case: more requests than slots, so
    retirements, slot reuse, and late admissions all interleave with
    in-flight calls. Emission snapshots (slot->request at ISSUE time)
    are what keep a retired-then-reused slot from leaking the old
    sequence's tokens into the new one."""
    model, params = tiny_model
    rng = np.random.default_rng(23)
    prompts = [rng.integers(1, 60, n).astype(np.int32)
               for n in (5, 9, 6, 12, 7)]
    want = [_solo(model, params, p, max_new=7) for p in prompts]

    engine = DecodeEngine(model, params, n_slots=2, max_len=64,
                          steps_per_call=2, pipeline_depth=2)
    try:
        waits = [_collect(engine, p, max_new=7) for p in prompts]
        for (out, done), w in zip(waits, want):
            assert done.wait(timeout=120), "engine stalled"
        for (out, _), w in zip(waits, want):
            assert out == w, f"pipelined {out} != solo {w}"
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_pipelined_mixed_sampling_and_images(tiny_model):
    """Pipelining with a sampled slot and an image request live at
    once: greedy stays exact, sampled terminates with valid tokens."""
    model, params = tiny_model
    rng = np.random.default_rng(29)
    greedy_ids = rng.integers(1, 60, 9).astype(np.int32)
    img_ids = np.array([5, IMAGE_TOKEN_INDEX, 7, 8, 9], np.int32)
    px = rng.normal(size=(1, 28, 28, 3)).astype(np.float32)
    want_g = _solo(model, params, greedy_ids, max_new=6)
    want_i = _solo(model, params, img_ids, px, max_new=6)

    engine = DecodeEngine(model, params, n_slots=3, max_len=64,
                          pipeline_depth=2)
    try:
        g = _collect(engine, greedy_ids, max_new=6)
        s = _collect(engine, rng.integers(1, 60, 5).astype(np.int32),
                     max_new=6, temperature=0.9)
        i = _collect(engine, img_ids, px, max_new=6)
        for out, done in (g, s, i):
            assert done.wait(timeout=120), "engine stalled"
        assert g[0] == want_g
        assert i[0] == want_i
        assert len(s[0]) == 6
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_pipeline_excludes_speculation(tiny_model):
    """Drafts are built from emitted history, which pipelining observes
    one call late — the constructor must refuse the combination."""
    model, params = tiny_model
    with pytest.raises(ValueError):
        DecodeEngine(model, params, n_slots=1, max_len=64,
                     spec_k=2, pipeline_depth=2, run_thread=False)


def test_engine_pipelined_prefix_cache_composes(tiny_model):
    """prefix cache + pipelining: parking happens at drain-time
    retirement while a later call is in flight — the parked row may
    hold ride-along junk beyond the parked length, which the unpark
    contract already ignores. Turn-2 via the cache must stay exact."""
    model, params = tiny_model
    p1 = np.arange(1, 9, dtype=np.int32)
    engine = DecodeEngine(model, params, n_slots=2, max_len=64,
                          pipeline_depth=2, prefix_cache_slots=2)
    try:
        out1, done1 = _collect(engine, p1, max_new=6)
        assert done1.wait(timeout=120)
        p2 = np.concatenate([p1, np.asarray(out1, np.int32),
                             np.asarray([30, 31, 32], np.int32)])
        out2, done2 = _collect(engine, p2, max_new=6)
        assert done2.wait(timeout=120)
        assert engine.stats()["engine_prefix_cache_hits"] == 1
        assert engine.error is None
    finally:
        engine.shutdown()

    cold = DecodeEngine(model, params, n_slots=2, max_len=64)
    try:
        want = list(cold.submit(p2, max_new_tokens=6))
    finally:
        cold.shutdown()
    assert out2 == want


def test_engine_pipelined_cancellation_retires_and_reuses(tiny_model):
    """Abandoning a stream while calls are in flight (pipeline_depth=2)
    must still retire the slot at a drain boundary, and the freed slot
    must serve a new request token-exactly — the in-flight calls issued
    before cancellation ride along on the retired row and are
    overwritten by the reusing admission."""
    model, params = tiny_model
    ids = np.arange(1, 7, dtype=np.int32)
    engine = DecodeEngine(model, params, n_slots=1, max_len=64,
                          pipeline_depth=2)
    try:
        it = engine.submit(ids, max_new_tokens=40)
        first = [next(it) for _ in range(2)]
        assert len(first) == 2
        it.close()  # abandon -> cancelled flag -> retires at drain
        import time
        deadline = time.time() + 30
        while engine._free != [0] and time.time() < deadline:
            time.sleep(0.02)
        assert engine._free == [0], "slot not retired after cancel"
        want = _solo(model, params, ids, max_new=4)
        out = list(engine.submit(ids, max_new_tokens=4))
        assert out == want
        assert engine.error is None
    finally:
        engine.shutdown()


def test_engine_park_flush_batches_retirements(tiny_model):
    """Retirements queue host-side and the device copy happens as ONE
    batched park_put_group at the next tick — never the per-retirement
    park_put call round 4 measured canceling the prefix cache's suffix
    savings. Hits against the flushed rows stay token-exact."""
    model, params = tiny_model
    prompts = [np.arange(1 + 7 * i, 9 + 7 * i, dtype=np.int32) % 60 + 1
               for i in range(3)]
    engine = DecodeEngine(model, params, n_slots=4, max_len=64,
                          run_thread=False, prefix_cache_slots=4)
    try:
        import time as _t

        group_calls = []
        orig_group = engine._park_put_group

        def spy_group(park, cache, pidxs, lidxs):
            group_calls.append(np.asarray(pidxs).shape[0])
            return orig_group(park, cache, pidxs, lidxs)

        engine._park_put_group = spy_group
        engine._park_put = None  # the per-retirement path must be dead

        def drain(dones, n_queued):
            deadline = _t.time() + 120
            while (engine._requests.qsize() < n_queued
                   and _t.time() < deadline):
                _t.sleep(0.01)
            while (not all(d.is_set() for d in dones)
                   and _t.time() < deadline):
                engine._tick()
            assert all(d.is_set() for d in dones), "engine stalled"

        outs, dones = zip(*[_collect(engine, p, max_new=5)
                            for p in prompts])
        drain(dones, 3)
        # the three requests retired in at most a couple of ticks; every
        # flush was batched (pow-2 padded) and none went row-by-row
        engine._tick()  # final flush opportunity
        assert not engine._park_pending
        assert group_calls, "no batched park flush happened"
        assert sum(group_calls) >= 3  # all three rows parked (with pads)

        followups = [np.concatenate([p, np.asarray(o, np.int32),
                                     np.asarray([40 + i, 41], np.int32)])
                     for i, (p, o) in enumerate(zip(prompts, outs))]
        outs2, dones2 = zip(*[_collect(engine, f, max_new=5)
                              for f in followups])
        drain(dones2, 3)
        assert engine.stats()["engine_prefix_cache_hits"] == 3
        assert engine.error is None
    finally:
        engine.shutdown()

    for f, got in zip(followups, outs2):
        cold = DecodeEngine(model, params, n_slots=2, max_len=64)
        try:
            want = list(cold.submit(f, max_new_tokens=5))
        finally:
            cold.shutdown()
        assert got == want, f"parked-flush {got} != cold {want}"
