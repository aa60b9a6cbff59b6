"""Engine scheduling fuzz: random request mixes (lengths, budgets,
greedy/sampled) admitted at random tick offsets against random engine
feature combinations (speculation, chunked prefill, prefix cache,
steps_per_call). Every greedy request must match its solo-path oracle
exactly regardless of interleaving — the strongest statement the CPU
mesh can make about the slot scheduler's correctness."""

import threading

import numpy as np
import pytest

import jax

from competesmoe_tpu.models.llava import LlavaModel, stream_generate
from competesmoe_tpu.serve.engine import DecodeEngine

from test_llava import tiny_llava_cfg


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_llava_cfg(moe=False)
    model = LlavaModel(cfg)
    ids = np.full((1, 6), 2, np.int32)
    params = model.init(jax.random.PRNGKey(0), ids, None)
    return model, params


def _solo(model, params, ids, max_new):
    toks = []
    for chunk in stream_generate(model, params, ids[None, :], None,
                                 max_new_tokens=max_new):
        toks.extend(int(t) for t in chunk[0])
    return toks[:max_new]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_engine_fuzz_interleavings_match_solo(tiny_model, seed):
    _run_fuzz(tiny_model, seed)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [3, 4, 5, 6])
def test_engine_fuzz_wide_band(tiny_model, seed):
    _run_fuzz(tiny_model, seed)


@pytest.mark.parametrize("seed", [7, 8])
def test_engine_fuzz_warmup_leaves_nothing_to_compile(tiny_model, seed):
    """Same random workloads, but warmup() runs first and the invariant
    tightens: NO engine program may compile during traffic — catches
    any steady-state shape the warmup enumeration misses (e.g. the
    non-pow-2 slot-count burst that pads to the next pow-2 rows)."""
    _run_fuzz(tiny_model, seed, warm=True)


def _run_fuzz(tiny_model, seed, warm=False):
    model, params = tiny_model
    rng = np.random.default_rng(seed)

    feats = dict(
        n_slots=int(rng.integers(1, 4)),
        spec_k=int(rng.choice([0, 2, 3])),
        prefill_chunk=int(rng.choice([0, 8])),
        prefix_cache_slots=int(rng.choice([0, 2])),
        steps_per_call=int(rng.choice([1, 2])),
    )
    # pipelined dispatch fuzzes only spec-free engines (the
    # constructor rejects the combination by design)
    feats["pipeline_depth"] = (int(rng.choice([1, 2, 3]))
                               if feats["spec_k"] == 0 else 1)
    n_req = 6
    reqs = []
    for _ in range(n_req):
        n = int(rng.integers(3, 28))
        if rng.random() < 0.4:   # repetitive prompts exercise drafting
            base = rng.integers(1, 60, max(2, n // 3)).astype(np.int32)
            ids = np.tile(base, 4)[:n].astype(np.int32)
        else:
            ids = rng.integers(1, 60, n).astype(np.int32)
        reqs.append({
            "ids": ids,
            "max_new": int(rng.integers(2, 9)),
            "temperature": float(rng.choice([0.0, 0.0, 0.8])),
            "top_p": float(rng.choice([1.0, 0.9])),
            "tick_offset": int(rng.integers(0, 8)),
        })
    oracles = [(_solo(model, params, r["ids"], r["max_new"])
                if r["temperature"] == 0.0 else None) for r in reqs]

    engine = DecodeEngine(model, params, max_len=128, run_thread=False,
                          **feats)
    before = None
    if warm:
        from test_engine import _program_counts
        engine.warmup(prompt_buckets=(32,), sampled=True)
        before = _program_counts(engine)
    outs = [[] for _ in reqs]
    done = [threading.Event() for _ in reqs]

    def consume(i):
        r = reqs[i]
        for tok in engine.submit(r["ids"], max_new_tokens=r["max_new"],
                                 temperature=r["temperature"],
                                 top_p=r["top_p"]):
            outs[i].append(tok)
        done[i].set()

    try:
        threads = []
        started = [False] * n_req
        for tick in range(400):
            for i, r in enumerate(reqs):
                if not started[i] and r["tick_offset"] <= tick:
                    started[i] = True
                    t = threading.Thread(target=consume, args=(i,),
                                         daemon=True)
                    t.start()
                    threads.append(t)
            engine._tick()
            if all(started) and all(d.is_set() for d in done):
                break
        assert all(d.is_set() for d in done), (
            f"engine stalled (feats={feats})")
        assert engine.error is None, engine.error
        for i, (out, want) in enumerate(zip(outs, oracles)):
            if want is not None:
                assert out == want, (
                    f"req {i} diverged under feats={feats}: "
                    f"{out} != {want}")
            else:
                assert len(out) == reqs[i]["max_new"]
        if warm:
            from test_engine import _program_counts
            assert _program_counts(engine) == before, (
                f"traffic compiled a new program after warmup "
                f"(feats={feats})")
    finally:
        engine.shutdown()
