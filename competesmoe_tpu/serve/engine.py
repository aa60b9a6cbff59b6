"""Continuous-batching decode engine for single-chip serving.

The reference worker (moe_model/serve/model_worker.py:125-180) runs one
HF `generate` per request — concurrent requests time-slice the model and
each decode step does batch-1 work, leaving most of the weight bandwidth
unused. On TPU the decode step is weight-bandwidth-bound, so batching
requests into one step is nearly free: at the 5.1B int8+kv8 geometry a
batch-8 step costs ~6.8 ms — barely more than batch-1 — i.e. ~8x the
aggregate tokens/sec for ~the same latency. This engine gives serving
that batching dynamically (the vLLM "continuous batching" idea,
re-designed for XLA's static shapes):

- a fixed pool of `n_slots` sequences shares ONE KV cache
  [L, n_slots, max_len, hk, d] and ONE jitted decode step;
- arriving requests are admitted in GROUPS: pending prompts that share
  a pow-2 length bucket (and image shape) prefill as one padded batch
  (batch size itself pow-2-padded so programs are reused), and every
  row is spliced into its free slot — plus its first token sampled —
  by ONE jitted scatter program. A burst of 8 requests costs one
  batched prefill + one insert instead of 8 serial batch-1 prefills,
  which is what bounds TTFT under load (the prefills serialize with
  decode on a single chip);
- slots retire on eos/max tokens and are immediately reusable; dead
  slots ride along in the step with static shapes — their writes are
  clamped into their own retired rows (models/decoder.py cache_idx
  clamp) and the host ignores their tokens;
- per-slot temperature and top_p ride as device vectors, so greedy and
  sampled requests coexist in one step program; the nucleus (top_p<1)
  variant is a second compiled program selected only while such a
  request is live, so the common path never pays the vocab sort;
- the step is ONE donated jitted call that scans `steps_per_call`
  decode steps and samples on device — on a tunneled TPU (~30 ms RPC
  per call) this amortizes dispatch latency; on a local chip
  steps_per_call=1 minimizes admission latency;
- optional PREFIX CACHE (`prefix_cache_slots`): retiring conversations
  park their cache row in a side buffer keyed by (token prefix, pixel
  hash); a follow-up prompt extending a parked conversation is
  re-admitted by ONE fused device call (gather parked rows + suffix
  continue-prefill + splice + first-token sample, simultaneous hits
  batched by suffix bucket), so multi-turn TTFT stops scaling with
  history length (vLLM's automatic prefix caching, restricted to
  whole-conversation prefixes so positions stay exact under
  image-token expansion);
- optional PIPELINED DISPATCH (`pipeline_depth=2`): issue decode call
  N+1 before reading call N's tokens, overlapping per-call dispatch
  latency with device execution — token-exact, emission one call late
  (measured on-chip: +27% aggregate / TTFT halved at steps_per_call=8,
  +44% at steps_per_call=1; docs/perf.md round 4).

Everything device-side is jitted and shape-stable: the step program
compiles once per engine, prefill once per (bucket, image-shape) pair,
insert/reset once each.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import KVCache
from ..models.llava import make_generate_fns


def _bucket(n: int, lo: int = 32) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


@dataclass
class _Request:
    ids: np.ndarray                 # [L] int32 prompt
    pixel_values: Optional[np.ndarray]
    max_new_tokens: int
    temperature: float
    top_p: float
    eos_ids: frozenset
    out: "queue.Queue[Optional[int]]" = field(
        default_factory=lambda: queue.Queue())
    slot: int = -1
    produced: int = 0
    done: bool = False
    # set by the consumer (generator abandoned / client disconnected);
    # the engine thread retires the slot at the next token boundary
    cancelled: bool = False
    # prefix-cache bookkeeping: cache length right after prefill, and
    # every emitted token (the last one is never fed back, so the row
    # holds KV for emitted[:-1])
    base_len: int = -1
    emitted: List[int] = field(default_factory=list)


class DecodeEngine:
    """Slot-based continuous batching around one LlavaModel.

    submit() enqueues a request and returns an iterator of token ids
    (ints) that streams as the engine decodes; the engine thread owns
    every device call (TPU access stays single-threaded).
    """

    def __init__(self, model, params, n_slots: int = 8,
                 max_len: int = 2048, steps_per_call: int = 1,
                 rng_seed: int = 0, run_thread: bool = True,
                 max_prefill_batch: int = 4, mesh=None,
                 prefix_cache_slots: int = 0, spec_k: int = 0,
                 draft_fn=None, prefill_chunk: int = 0,
                 spec_adaptive: bool = False,
                 spec_probe_interval: int = 32,
                 clock=time.monotonic,
                 pipeline_depth: int = 1):
        self.model = model
        self.params = params
        self.cfg = model.cfg
        self.n_slots = n_slots
        self.max_len = max_len
        self.steps_per_call = steps_per_call
        # prompt-lookup speculative decoding (serve/speculative.py):
        # each step verifies spec_k host-drafted tokens per slot and
        # emits 1..spec_k+1 — greedy slots only (sampled slots ride the
        # same program but take exactly one drawn token). One verify per
        # device call (drafts refresh between steps), so spec_k>0
        # overrides steps_per_call.
        self._spec_k = int(spec_k)
        # draft_fn(history_tokens: list[int], k) -> Optional[np.ndarray]
        # overrides the prompt-lookup default — e.g. a bigram table, a
        # distilled drafter, or a bench oracle (tools/bench_engine.py
        # --spec-oracle measures the perfect-draft upper bound)
        self._draft_fn = draft_fn
        self._spec_calls = 0
        self._spec_accepted = 0
        self._spec_tokens = 0   # emitted by verify ticks only
        # Throughput-adaptive speculation (a two-armed bandit over tick
        # modes). A verify tick is ONE device call for at most 1+k
        # tokens/slot, while the plain fallback scans steps_per_call
        # tokens/slot per call — so speculation can LOSE aggregate
        # throughput even at 100% per-draft acceptance when only some
        # slots find drafts (measured 2026-08-19 on v5e-1, 32L
        # int8+kv8, slots=8, steps_per_call=8: loop prompts draft ~half
        # the slots at 100% acceptance yet net 237.6 tok/s vs 482.6
        # plain; oracle-on-every-slot drafts 379.3). Acceptance rate is
        # therefore the WRONG gate signal; spec_adaptive=True instead
        # measures realized tokens/sec of each arm directly (EWMA over
        # tick wall time incl. host draft collection), runs the faster
        # arm, and probes the losing arm every spec_probe_interval
        # ticks so a workload shift is picked up. clock is injectable
        # for deterministic tests. False = always speculate (the
        # reference serves eagerly and has no speculation at all,
        # moe_model/serve/model_worker.py:125-180).
        self._spec_adaptive = bool(spec_adaptive)
        self._spec_probe_interval = int(spec_probe_interval)
        self._clock = clock
        self._arm_tps = {"verify": None, "plain": None}
        self._arm_streak = ("verify", 0)   # (last chosen arm, run length)
        self._spec_suppressed_ticks = 0
        self._spec_drafted_slots = 0   # slots drafted in the last collect
        # Pipelined tick dispatch (pipeline_depth > 1): issue decode
        # call N+1 BEFORE reading call N's tokens, so per-call dispatch
        # latency (the ~30 ms tunnel RPC; host bookkeeping on a local
        # chip) overlaps device execution instead of serializing with
        # it. JAX's async dispatch chains the donated cache/cur futures
        # in program order, so device state is exact; the host merely
        # OBSERVES tokens one call late. Correctness hinges on two
        # existing properties: (a) emission uses a slot→request
        # snapshot taken at ISSUE time, so a slot retired-and-reused
        # between issue and drain can't misattribute the old
        # sequence's tokens to the new request; (b) a retired slot's
        # ride-along writes from an already-issued call land before
        # the reusing insert in program order and are overwritten
        # (same dead-slot clamp contract the sync engine relies on).
        # Mutually exclusive with speculation: verify ticks need the
        # freshest emitted history for drafting, which lag-1
        # observation breaks.
        self._pipeline_depth = max(1, int(pipeline_depth))
        if self._pipeline_depth > 1 and self._spec_k:
            raise ValueError(
                "pipeline_depth > 1 requires spec_k == 0: drafts are "
                "built from emitted history, which pipelining observes "
                "one call late")
        self._inflight: List[tuple] = []   # [(toks_future, snapshot)]
        # chunked prefill: long TEXT prompts prefill prefill_chunk
        # tokens per engine tick into a 1-row staging cache, with a
        # decode step for live slots between chunks — a 2048-token
        # admission no longer stalls every live stream for the whole
        # prefill (vLLM's chunked-prefill role under XLA static shapes:
        # ONE compiled chunk program, last chunk mask-padded). Image
        # prompts keep the grouped one-shot path (the splice needs the
        # whole sequence); multi-turn follow-ups are text-only so the
        # long-history case is covered (and prefix-cache hits skip the
        # history entirely).
        self._pf_chunk_n = int(prefill_chunk)
        self._pf_state: Optional[dict] = None
        self._pf_queue: List[_Request] = []
        self._stage = (KVCache.create(self.cfg.decoder, 1, max_len)
                       if prefill_chunk > 0 else None)
        # each prefill row transiently allocates a full-max_len cache
        # row on top of the engine cache, so bound the group size (4 rows
        # ≈ 1.6 GB transient at the 5.1B int8-KV geometry)
        self.max_prefill_batch = max_prefill_batch
        self._requests: "queue.Queue[_Request]" = queue.Queue()
        self._live: Dict[int, _Request] = {}
        self._free = list(range(n_slots))
        self._rng = jax.random.PRNGKey(rng_seed)
        self._cache = KVCache.create(self.cfg.decoder, n_slots, max_len)
        if mesh is not None:
            # tensor-parallel serving (--mesh + --engine-slots): pin the
            # engine cache to the kv-head sharding up front instead of
            # letting XLA choose — donation then keeps every step's cache
            # in place on the mesh (parallel.mesh.kv_cache_sharding)
            from jax.sharding import NamedSharding, PartitionSpec

            from ..parallel.mesh import kv_cache_sharding
            rep = NamedSharding(mesh, PartitionSpec())
            hk = self.cfg.decoder.num_key_value_heads
            # expert-parallel meshes (('data','expert'), --ep-shards)
            # have no 'model' axis: KV replicates, only expert banks
            # shard (parallel.mesh.ep_param_shardings)
            kv_sh = (kv_cache_sharding(mesh)
                     if "model" in mesh.shape
                     and hk % mesh.shape["model"] == 0 else rep)
            self._cache = KVCache(
                k=jax.device_put(self._cache.k, kv_sh),
                v=jax.device_put(self._cache.v, kv_sh),
                pos=jax.device_put(self._cache.pos, rep),
                k_scale=(jax.device_put(self._cache.k_scale, rep)
                         if self._cache.k_scale is not None else None),
                v_scale=(jax.device_put(self._cache.v_scale, rep)
                         if self._cache.v_scale is not None else None))
        self._cur = jnp.zeros((n_slots,), jnp.int32)
        self._temps = np.zeros((n_slots,), np.float32)
        self._topps = np.ones((n_slots,), np.float32)
        # Prefix cache: retired conversation rows PARK in a side buffer
        # keyed by (token prefix, pixel hash); a follow-up prompt that
        # extends a parked conversation splices the row back in and
        # prefills only the suffix — multi-turn TTFT stops scaling with
        # history length. Costs prefix_cache_slots extra cache rows.
        self._park_n = prefix_cache_slots
        self._park = (KVCache.create(self.cfg.decoder, prefix_cache_slots,
                                     max_len)
                      if prefix_cache_slots > 0 else None)
        self._park_meta: List[Optional[dict]] = [None] * prefix_cache_slots
        self._park_clock = 0
        # retirements queue (park_idx, live_slot) here and flush as ONE
        # batched device call at the top of the next tick — before
        # _admit can reuse the source slots (round-4 measured the
        # per-retirement park_put call canceling the cache's suffix
        # savings at chat-scale histories)
        self._park_pending: List[tuple] = []
        self._prefix_hits = 0
        self.error: Optional[Exception] = None
        self._tokens_emitted = 0
        self._hold_admission = False   # warmup(): batch bursts deterministically
        self._started = time.monotonic()
        self._build_fns()
        self._stop = threading.Event()
        self._woken = threading.Event()
        # Set by the engine thread each time a _tick finds nothing to
        # do (no live slots, in-flight drained, no prefill work) — i.e.
        # the thread is PAST the end of any token-emitting tick. Done
        # events fire inside _emit mid-tick, so "all requests done" is
        # NOT quiescence: the tick that delivered the final token still
        # has bandit bookkeeping (_spec_record) ahead of it, and a
        # caller mutating counters in that window corrupts the record
        # (observed: warmup's finally scrubbing _tokens_emitted raced
        # the last spec tick's record and charged -19 tokens into the
        # verify arm, parking speculation). _warm_drain waits on this.
        self._idle = threading.Event()
        # run_thread=False leaves stepping to the caller via _tick() —
        # used by tests to drive burst admission deterministically.
        self._thread = None
        if run_thread:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    # -- jitted device programs -------------------------------------------

    def _build_fns(self):
        model = self.model
        k_steps = self.steps_per_call
        self._prefill, _ = make_generate_fns(model, self.cfg,
                                             self.max_len)

        def make_step(nucleus: bool):
            @partial(jax.jit, donate_argnums=(2,))
            def step(params, cur, cache, rng, temps, topps):
                """k_steps decode steps with on-device per-slot sampling.
                Donating the cache keeps the scatter in-place (un-donated,
                XLA copies the full cache every step — the deferred-write
                A/B measured that copy at ~1.5 ms on the 5.1B int8 config).
                The nucleus variant pays a per-step vocab sort, so it is a
                SEPARATE program selected only while a top_p<1 request is
                live — the greedy/temperature path stays sort-free.
                """
                def one(carry, sub):
                    cur, cache = carry
                    # DecoderLM advances cache.pos itself (decoder.py
                    # new_cache construction)
                    out = model.apply(params, cur[:, None], None,
                                      cache=cache)
                    logits = out.logits[:, 0]
                    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
                    if nucleus:
                        srt = jnp.sort(scaled, axis=-1)[:, ::-1]
                        cum = jnp.cumsum(jax.nn.softmax(srt, -1), axis=-1)
                        ci = jnp.sum(cum < topps[:, None], axis=-1,
                                     keepdims=True)
                        cutoff = jnp.take_along_axis(srt, ci, axis=-1)
                        scaled = jnp.where(scaled < cutoff, -jnp.inf,
                                           scaled)
                    drawn = jax.random.categorical(sub, scaled,
                                                   axis=-1).astype(jnp.int32)
                    nxt = jnp.where(temps > 0, drawn, greedy)
                    return (nxt, out.cache), nxt

                subs = jax.random.split(rng, k_steps)
                (cur, cache), toks = jax.lax.scan(one, (cur, cache), subs)
                return jnp.swapaxes(toks, 0, 1), cur, cache
            return step

        self._step_plain = make_step(nucleus=False)
        self._step_nucleus = make_step(nucleus=True)

        def make_spec_step(nucleus: bool):
            k = self._spec_k

            @partial(jax.jit, donate_argnums=(2,))
            def spec_step(params, cur, cache, rng, temps, topps, drafts):
                """One speculative verify step over every slot: feed
                [cur, k drafts] through the model once.

                Greedy slots (temp==0) accept the longest draft prefix
                matching the model's own argmax — bit-exact (see
                models/llava.py:make_verify_step).

                Sampled slots (temp>0) run SPECULATIVE SAMPLING with the
                point-mass drafter (Leviathan/Chen rejection scheme,
                q = delta at the draft token): accept draft d_j with
                probability p_j(d_j); on the first rejection, resample
                from the residual norm(p_j - min(p_j, q_j)) — which for
                a point mass is p_j with d_j removed, renormalized; if
                all k accept, a bonus token samples from p_k. The
                emitted-token distribution is exactly the step-by-step
                sampling distribution (unbiased), nucleus filter
                included per position. On a weight-bandwidth-bound step
                the k extra positions are nearly free, so each accepted
                draft is a free token for BOTH modes."""
                from ..models.llava import speculative_accept

                pos0 = cache.pos
                toks_in = jnp.concatenate([cur[:, None], drafts], axis=1)
                out = model.apply(params, toks_in, None, cache=cache)
                toks, n_acc = speculative_accept(out.logits, drafts,
                                                 temps, topps, rng,
                                                 nucleus=nucleus)
                # keep only the verified prefix live; rejected tails sit
                # beyond pos (never attended) and are overwritten by the
                # next step's scatter
                cache2 = out.cache.replace(pos=pos0 + 1 + n_acc)
                cur2 = jnp.take_along_axis(toks, n_acc[:, None],
                                           axis=1)[:, 0]
                return toks, n_acc, cur2, cache2
            return spec_step

        if self._spec_k > 0:
            self._spec_plain = make_spec_step(nucleus=False)
            self._spec_nucleus = make_spec_step(nucleus=True)

        @partial(jax.jit, donate_argnums=(0,))
        def insert_many(cache: KVCache, rows: KVCache, slots, cur,
                        last, temps, topps, rng):
            """Splice a batch of prefilled rows into their slots (scatter
            on the batch axis) and sample each row's first token — one
            device call per admission group. Padding rows carry
            slot == n_slots, which mode='drop' discards; jit re-traces
            once per (padded batch size, row length) pair, so programs
            are reused. Rows may be SHORTER than the engine cache (text
            groups prefill into bucket-length caches — admission then
            moves O(bucket) bytes per row instead of O(max_len)); the
            slice beyond the row length keeps the previous occupant's
            stale K/V, which is never attended before the decode/verify
            step that overwrites it (mask kpos <= qpos and the step
            writes position qpos before reading it).
            First-token sampling always runs the nucleus form: one vocab
            sort per admitted request is negligible (unlike per-step)."""
            return _splice_sample(cache, rows, slots, cur, last,
                                  temps, topps, rng)

        def _splice_sample(cache, rows, slots, cur, last, temps, topps,
                           rng):
            def put(buf, upd):
                if isinstance(buf, (list, tuple)):  # per_layer layout
                    return type(buf)(
                        b.at[slots, : u.shape[1]].set(u, mode="drop")
                        for b, u in zip(buf, upd))
                return buf.at[:, slots, : upd.shape[2]].set(upd,
                                                            mode="drop")

            new_cache = KVCache(
                k=put(cache.k, rows.k), v=put(cache.v, rows.v),
                pos=cache.pos.at[slots].set(rows.pos, mode="drop"),
                k_scale=(put(cache.k_scale, rows.k_scale)
                         if cache.k_scale is not None else None),
                v_scale=(put(cache.v_scale, rows.v_scale)
                         if cache.v_scale is not None else None),
            )
            greedy = jnp.argmax(last, axis=-1).astype(jnp.int32)
            scaled = last / jnp.maximum(temps, 1e-6)[:, None]
            srt = jnp.sort(scaled, axis=-1)[:, ::-1]
            cum = jnp.cumsum(jax.nn.softmax(srt, -1), axis=-1)
            ci = jnp.sum(cum < topps[:, None], axis=-1, keepdims=True)
            cutoff = jnp.take_along_axis(srt, ci, axis=-1)
            scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)
            drawn = jax.random.categorical(rng, scaled,
                                           axis=-1).astype(jnp.int32)
            toks = jnp.where(temps > 0, drawn, greedy)
            return new_cache, cur.at[slots].set(toks, mode="drop"), toks

        self._insert_many = insert_many

        def _take_row(buf, idx, batch_axis):
            if isinstance(buf, (list, tuple)):  # per_layer layout
                return type(buf)(jax.lax.dynamic_slice_in_dim(
                    b, idx, 1, axis=0) for b in buf)
            return jax.lax.dynamic_slice_in_dim(buf, idx, 1,
                                                axis=batch_axis)

        def _put_row(buf, row, idx, batch_axis):
            if isinstance(buf, (list, tuple)):
                return type(buf)(jax.lax.dynamic_update_slice_in_dim(
                    b, r, idx, axis=0) for b, r in zip(buf, row))
            return jax.lax.dynamic_update_slice_in_dim(buf, row, idx,
                                                       axis=batch_axis)

        @partial(jax.jit, donate_argnums=(0,))
        def park_put(park: KVCache, cache: KVCache, park_slot, live_slot):
            """Snapshot one live cache row into the park buffer."""
            def cp(pbuf, cbuf):
                return _put_row(pbuf, _take_row(cbuf, live_slot, 1),
                                park_slot, 1)

            return KVCache(
                k=cp(park.k, cache.k), v=cp(park.v, cache.v),
                pos=jax.lax.dynamic_update_slice_in_dim(
                    park.pos, jax.lax.dynamic_slice_in_dim(
                        cache.pos, live_slot, 1, axis=0),
                    park_slot, axis=0),
                k_scale=(cp(park.k_scale, cache.k_scale)
                         if park.k_scale is not None else None),
                v_scale=(cp(park.v_scale, cache.v_scale)
                         if park.v_scale is not None else None))

        self._park_put = park_put

        @partial(jax.jit, donate_argnums=(0,))
        def park_put_group(park: KVCache, cache: KVCache, park_slots,
                           live_slots):
            """Snapshot MANY live cache rows into the park buffer in one
            call (deferred-retirement flush). Rows padded with
            park_slot == park_n are dropped by the scatter."""
            def cp(pbuf, cbuf):
                if isinstance(pbuf, (list, tuple)):
                    return type(pbuf)(
                        pb.at[park_slots].set(
                            jnp.take(cb, live_slots, axis=0), mode="drop")
                        for pb, cb in zip(pbuf, cbuf))
                return pbuf.at[:, park_slots].set(
                    jnp.take(cbuf, live_slots, axis=1), mode="drop")

            return KVCache(
                k=cp(park.k, cache.k), v=cp(park.v, cache.v),
                pos=park.pos.at[park_slots].set(
                    jnp.take(cache.pos, live_slots), mode="drop"),
                k_scale=(cp(park.k_scale, cache.k_scale)
                         if park.k_scale is not None else None),
                v_scale=(cp(park.v_scale, cache.v_scale)
                         if park.v_scale is not None else None))

        self._park_put_group = park_put_group

        def _take_rows(buf, idxs, batch_axis):
            if isinstance(buf, (list, tuple)):  # per_layer layout
                return type(buf)(jnp.take(b, idxs, axis=0) for b in buf)
            return jnp.take(buf, idxs, axis=batch_axis)

        @partial(jax.jit, donate_argnums=(2,))
        def unpark_admit(params, park: KVCache, cache: KVCache, cur,
                         park_slots, pos0, ids, mask, slots, temps,
                         topps, rng):
            """Reuse admission, FUSED and BATCHED in one device call:
            gather the [B] parked rows, reset pos to each parked length
            (junk writes from the slots' dead ride-along steps sit
            beyond it and are never attended), continue-prefill the
            padded suffix batch, splice the rows into the engine cache,
            and sample each first token. One program per (pow-2 batch
            rows, suffix bucket). Both halves of the fusion are
            measured: sequential per-hit admission made parked turn-2
            TTFT 1.788 s vs 1.307 s cold, and batched-but-2-call was
            still 1.397 s (2026-08-19, v5e-1 32L int8+kv8, each device
            call paying the ~30 ms tunnel RPC) — fusing removes the
            second call AND the intermediate [B, max_len] row cache
            materialization between the two programs."""
            rows = KVCache(
                k=_take_rows(park.k, park_slots, 1),
                v=_take_rows(park.v, park_slots, 1),
                pos=pos0.astype(jnp.int32),
                k_scale=(_take_rows(park.k_scale, park_slots, 1)
                         if park.k_scale is not None else None),
                v_scale=(_take_rows(park.v_scale, park_slots, 1)
                         if park.v_scale is not None else None))
            out = model.apply(params, ids, None, attention_mask=mask,
                              cache=rows)
            # logits index by position WITHIN the suffix input (unlike
            # cold prefill where cache.pos == input length): the last
            # real token sits at sum(mask)-1
            n_real = jnp.sum(mask.astype(jnp.int32), axis=-1)
            last = jnp.take_along_axis(
                out.logits, (n_real - 1)[:, None, None].astype(jnp.int32),
                axis=1)[:, 0]
            return _splice_sample(cache, out.cache, slots, cur, last,
                                  temps, topps, rng)

        self._unpark_admit = unpark_admit

        @partial(jax.jit, donate_argnums=(1,))
        def chunk_prefill(params, stage: KVCache, ids, mask):
            """Continue-prefill one chunk into the staging row. Same
            continue-prefill semantics as unpark_admit (pos carries
            across chunks; pad writes land in the dump slot); returns
            the last REAL position's logits so the final chunk can seed
            first-token sampling."""
            out = model.apply(params, ids, None, attention_mask=mask,
                              cache=stage)
            n_real = jnp.sum(mask.astype(jnp.int32), axis=-1)
            # logits index by position WITHIN the chunk input (same
            # convention as unpark_admit)
            last = jnp.take_along_axis(
                out.logits, (n_real - 1)[:, None, None].astype(jnp.int32),
                axis=1)[:, 0]
            return out.cache, last

        self._chunk_prefill = chunk_prefill

    def _run_prefill(self, bucket: int, ids, px, mask):
        """Admission prefill. Text groups use a bucket+1-length cache
        (slot `bucket` is the pad dump) — the transient rows and the
        insert traffic scale with the prompt bucket, not max_len; the
        short rows splice via insert_many's prefix write. Image groups
        keep the max_len cache: the spliced sequence (prompt - 1 +
        num_image_tokens per image) exceeds the token bucket."""
        if px is None:
            prefill, _ = make_generate_fns(self.model, self.cfg,
                                           min(bucket + 1, self.max_len))
        else:
            prefill = self._prefill
        return prefill(self.params, ids, px, mask)

    def _admit_group(self, bucket: int, reqs: List[_Request]):
        """Prefill `reqs` (same prompt bucket + image shape) as ONE
        padded batch and splice every row in with ONE insert_many call.
        Prompts right-pad to `bucket` with attention_mask 0 (padding
        lands in the cache dump slot, so it is token-exact); the batch
        itself pads to a pow-2 row count by repeating row 0 with
        slot == n_slots, which the scatter drops."""
        nb = len(reqs)
        nbp = _bucket(nb, lo=1)
        ids = np.zeros((nbp, bucket), np.int32)
        mask = np.zeros((nbp, bucket), np.int32)
        for i, req in enumerate(reqs):
            ids[i, :len(req.ids)] = req.ids
            mask[i, :len(req.ids)] = 1
        ids[nb:] = ids[0]
        mask[nb:] = mask[0]
        px = None
        if reqs[0].pixel_values is not None:
            rows = [np.asarray(r.pixel_values) for r in reqs]
            px = jnp.asarray(np.concatenate(
                rows + [rows[0]] * (nbp - nb), axis=0))
        # prefill leaves pos at the written length; the engine's step
        # advances pos itself, so rows arrive decode-ready
        last, out = self._run_prefill(bucket, jnp.asarray(ids), px,
                                      jnp.asarray(mask))

        slots = np.full((nbp,), self.n_slots, np.int32)
        temps = np.zeros((nbp,), np.float32)
        topps = np.ones((nbp,), np.float32)
        for i, req in enumerate(reqs):
            slots[i] = self._free.pop()
            temps[i] = req.temperature
            topps[i] = req.top_p
        self._rng, sub = jax.random.split(self._rng)
        self._cache, self._cur, toks = self._insert_many(
            self._cache, out.cache, jnp.asarray(slots), self._cur,
            last, jnp.asarray(temps), jnp.asarray(topps), sub)
        from ..constants import IMAGE_TOKEN_INDEX
        p_img = int(getattr(self.cfg, "num_image_tokens", 0) or 0)
        for i, req in enumerate(reqs):
            req.slot = int(slots[i])
            # spliced length, host-side (same formula as the capacity
            # check and stream_generate's prompt_len): reading
            # out.cache.pos here would force a device sync per
            # admission group
            n_img = int(np.sum(req.ids == IMAGE_TOKEN_INDEX))
            req.base_len = len(req.ids) + n_img * max(p_img - 1, 0)
            self._temps[req.slot] = req.temperature
            self._topps[req.slot] = req.top_p
            self._live[req.slot] = req
        self._emit_admission(toks, reqs)

    def _emit_admission(self, toks, reqs: List[_Request]):
        """First-token delivery for an admission group. Synchronous at
        pipeline depth 1; under pipelining the [B] token vector joins
        the in-flight queue (snapshot keyed by row index, same contract
        as step snapshots keyed by slot) so admission doesn't force a
        device sync either — FIFO order guarantees the first token
        drains before the same request's step tokens."""
        if self._pipeline_depth > 1:
            self._inflight.append((toks[:, None],
                                   dict(enumerate(reqs))))
            if len(self._inflight) >= self._pipeline_depth:
                self._drain_one()
            return
        toks = np.asarray(toks)
        for i, req in enumerate(reqs):
            self._emit(req, int(toks[i]))

    # -- prefix cache -------------------------------------------------------

    def _px_hash(self, px) -> Optional[int]:
        return None if px is None else hash(np.asarray(px).tobytes())

    def _find_park(self, req: _Request) -> Optional[int]:
        """Longest parked conversation that is a strict prefix of the
        request's prompt (same pixel hash; image-free suffix)."""
        from ..constants import IMAGE_TOKEN_INDEX

        ids = tuple(int(t) for t in req.ids)
        pxh = self._px_hash(req.pixel_values)
        best, best_n = None, 0
        for idx, meta in enumerate(self._park_meta):
            if meta is None or meta["pxhash"] != pxh:
                continue
            n = len(meta["ids"])
            if (n <= best_n or n >= len(ids) or meta["ids"] != ids[:n]):
                continue
            suffix = ids[n:]
            if IMAGE_TOKEN_INDEX in suffix:
                continue
            # Same speculative headroom as submit(): verify steps write
            # pos..pos+k, so a reused admission at exactly the limit
            # would clamp accepted-draft KV into the dump slot.
            if (meta["len"] + len(suffix) + req.max_new_tokens
                    + self._spec_k > self.max_len):
                continue
            best, best_n = idx, n
        return best

    def _admit_reused_group(self, bucket: int, hits: List[tuple]):
        """Admit prefix-cache hits (same suffix bucket) as ONE batched
        fused unpark_admit call (gather parked rows + suffix prefill +
        splice + first-token sample in one program) — mirrors
        _admit_group's
        pow-2 row padding (pad rows repeat row 0 with slot == n_slots,
        which the scatter drops). `hits` is [(req, park_idx), ...]."""
        nb = len(hits)
        nbp = _bucket(nb, lo=1)
        ids = np.zeros((nbp, bucket), np.int32)
        mask = np.zeros((nbp, bucket), np.int32)
        pos0 = np.zeros((nbp,), np.int32)
        pslots = np.zeros((nbp,), np.int32)
        for i, (req, pidx) in enumerate(hits):
            meta = self._park_meta[pidx]
            suffix = np.asarray(req.ids[len(meta["ids"]):], np.int32)
            ids[i, :len(suffix)] = suffix
            mask[i, :len(suffix)] = 1
            pos0[i] = meta["len"]
            pslots[i] = pidx
        ids[nb:] = ids[0]
        mask[nb:] = mask[0]
        pos0[nb:] = pos0[0]
        pslots[nb:] = pslots[0]
        slots = np.full((nbp,), self.n_slots, np.int32)
        temps = np.zeros((nbp,), np.float32)
        topps = np.ones((nbp,), np.float32)
        for i, (req, _) in enumerate(hits):
            slots[i] = self._free.pop()
            temps[i] = req.temperature
            topps[i] = req.top_p
        self._rng, sub = jax.random.split(self._rng)
        self._cache, self._cur, toks = self._unpark_admit(
            self.params, self._park, self._cache, self._cur,
            jnp.asarray(pslots), jnp.asarray(pos0), jnp.asarray(ids),
            jnp.asarray(mask), jnp.asarray(slots),
            jnp.asarray(temps), jnp.asarray(topps), sub)
        for i, (req, pidx) in enumerate(hits):
            meta = self._park_meta[pidx]
            req.slot = int(slots[i])
            req.base_len = meta["len"] + len(req.ids) - len(meta["ids"])
            self._temps[req.slot] = req.temperature
            self._topps[req.slot] = req.top_p
            self._live[req.slot] = req
            self._prefix_hits += 1
        self._emit_admission(toks, [req for req, _ in hits])

    def _park_row(self, req: _Request):
        """Queue a retiring slot's row for prefix reuse. The device copy
        is DEFERRED to _flush_parks() at the top of the next tick —
        before _admit can reuse the slot — so N retirements in a tick
        cost one batched call instead of N (round 4 measured the
        per-retirement call canceling the suffix savings). The last
        emitted token was never fed, so the row holds KV for
        prompt + emitted[:-1]; any junk an in-flight pipelined step
        appends past that is masked by the unpark's pos0 = meta len."""
        fed = req.emitted[:-1]
        parked_len = req.base_len + len(fed)
        if parked_len + 1 >= self.max_len:
            return
        key = tuple(int(t) for t in req.ids) + tuple(fed)
        pidx = self._park_clock % self._park_n
        self._park_clock += 1
        self._park_meta[pidx] = {"ids": key, "len": parked_len,
                                 "pxhash": self._px_hash(req.pixel_values)}
        self._park_pending.append((pidx, req.slot))

    def _flush_parks(self):
        """One batched park_put_group for every retirement queued since
        the last tick (pow-2 padded; pad rows carry park_slot == park_n,
        dropped by the scatter). Duplicate park indices (clock wrap
        within one flush) keep only the newest snapshot, matching the
        meta that survived."""
        if not self._park_pending:
            return
        newest = {}
        for pidx, slot in self._park_pending:
            newest[pidx] = slot
        self._park_pending.clear()
        n = len(newest)
        np2 = _bucket(n, lo=1)
        pidxs = np.full((np2,), self._park_n, np.int32)
        lidxs = np.zeros((np2,), np.int32)
        for i, (pidx, slot) in enumerate(newest.items()):
            pidxs[i] = pidx
            lidxs[i] = slot
        self._park = self._park_put_group(
            self._park, self._cache, jnp.asarray(pidxs),
            jnp.asarray(lidxs))

    # -- engine thread -----------------------------------------------------

    def _admit(self):
        # warmup() holds admission while it enqueues a burst so the group
        # forms deterministically; checked in the loop condition (not just
        # at entry) so a tick landing mid-enqueue can't split the burst.
        while (not self._hold_admission and self._free
               and not self._requests.empty()):
            pending: List[_Request] = []
            while len(pending) < len(self._free):
                try:
                    pending.append(self._requests.get_nowait())
                except queue.Empty:
                    break
            if not pending:
                return
            live = []
            for req in pending:
                if req.cancelled:
                    req.done = True
                    req.out.put(None)
                else:
                    live.append(req)
            pending = live
            if self._park_n:
                cold = []
                reuse: Dict[int, List[tuple]] = {}
                for req in pending:
                    pidx = self._find_park(req)
                    if pidx is not None:
                        n = len(self._park_meta[pidx]["ids"])
                        b = _bucket(len(req.ids) - n)
                        reuse.setdefault(b, []).append((req, pidx))
                    else:
                        cold.append(req)
                cap = self.max_prefill_batch
                for b, hits in reuse.items():
                    for i in range(0, len(hits), cap):
                        self._admit_reused_group(b, hits[i:i + cap])
                pending = cold
            if self._pf_chunk_n:
                # long text prompts prefill chunk-at-a-time between
                # decode ticks instead of stalling live streams
                rest = []
                for req in pending:
                    if (req.pixel_values is None
                            and len(req.ids) > self._pf_chunk_n):
                        self._pf_queue.append(req)
                    else:
                        rest.append(req)
                pending = rest
            groups: Dict[Any, List[_Request]] = {}
            for req in pending:
                pxkey = (None if req.pixel_values is None
                         else np.asarray(req.pixel_values).shape)
                groups.setdefault(
                    (_bucket(len(req.ids)), pxkey), []).append(req)
            cap = self.max_prefill_batch
            for (bucket, _), reqs in groups.items():
                for i in range(0, len(reqs), cap):
                    self._admit_group(bucket, reqs[i:i + cap])

    def _pf_start(self):
        """Begin the next queued chunked prefill if the staging row is
        idle and a slot is free (the slot is reserved up front so the
        finished row always has a home)."""
        while (self._pf_state is None and self._pf_queue and self._free):
            req = self._pf_queue.pop(0)
            if req.cancelled:
                req.done = True
                req.out.put(None)
                continue
            slot = self._free.pop()
            self._stage = self._stage.replace(
                pos=jnp.zeros((1,), jnp.int32))
            self._pf_state = {"req": req, "slot": slot, "cursor": 0}

    def _pf_step(self):
        """Prefill ONE chunk of the in-flight long prompt; on the final
        chunk, splice the staged row into its reserved slot and sample
        the first token (the same insert_many program as grouped
        admission)."""
        st = self._pf_state
        req: _Request = st["req"]
        if req.cancelled:
            self._free.append(st["slot"])
            req.done = True
            req.out.put(None)
            self._pf_state = None
            return
        C = self._pf_chunk_n
        chunk = req.ids[st["cursor"]: st["cursor"] + C]
        ids = np.zeros((1, C), np.int32)
        mask = np.zeros((1, C), np.int32)
        ids[0, : len(chunk)] = chunk
        mask[0, : len(chunk)] = 1
        self._stage, last = self._chunk_prefill(
            self.params, self._stage, jnp.asarray(ids), jnp.asarray(mask))
        st["cursor"] += len(chunk)
        if st["cursor"] < len(req.ids):
            return
        slot = st["slot"]
        self._rng, sub = jax.random.split(self._rng)
        self._cache, self._cur, toks = self._insert_many(
            self._cache, self._stage, jnp.asarray([slot], np.int32),
            self._cur, last, jnp.asarray([req.temperature], np.float32),
            jnp.asarray([req.top_p], np.float32), sub)
        req.slot = slot
        req.base_len = len(req.ids)
        self._temps[slot] = req.temperature
        self._topps[slot] = req.top_p
        self._live[slot] = req
        self._pf_state = None
        self._emit_admission(toks, [req])

    def _emit(self, req: _Request, token: int):
        if req.done:
            return
        if req.cancelled:
            req.done = True
            req.out.put(None)
            self._live.pop(req.slot, None)
            self._free.append(req.slot)
            return
        req.produced += 1
        self._tokens_emitted += 1
        req.emitted.append(token)
        req.out.put(token)
        if token in req.eos_ids or req.produced >= req.max_new_tokens:
            if self._park_n and req.base_len >= 0:
                # snapshot the row before the slot can be reused
                self._park_row(req)
            req.done = True
            req.out.put(None)
            self._live.pop(req.slot, None)
            self._free.append(req.slot)

    def _loop(self):
        try:
            self._run()
        except Exception as e:  # noqa: BLE001 — surface to all waiters
            self.error = e
            self._release_waiters()

    def _release_waiters(self):
        """Unblock every consumer (live, queued, and chunked-prefill
        in-flight/queued) — without this, a client of a request parked
        in _pf_queue would block on out.get() forever after an engine
        error or shutdown."""
        self._inflight.clear()   # undelivered pipelined tokens are moot
        for req in list(self._live.values()):
            req.done = True
            req.out.put(None)
        if self._pf_state is not None:
            r = self._pf_state["req"]
            r.done = True
            r.out.put(None)
            self._pf_state = None
        for req in self._pf_queue:
            req.done = True
            req.out.put(None)
        self._pf_queue.clear()
        while not self._requests.empty():
            try:
                self._requests.get_nowait().out.put(None)
            except queue.Empty:
                break

    def _run(self):
        while not self._stop.is_set():
            self._tick()
        self._drain_all()   # deliver in-flight tokens before shutdown

    def _tick(self):
        """One engine iteration: admit pending requests, then one batched
        step call. Called only from the engine thread (or from tests with
        run_thread=False) — TPU access stays single-threaded."""
        if self._park_n:
            self._flush_parks()   # before _admit can reuse source slots
        self._admit()
        if self._pf_chunk_n:
            self._pf_start()
            if self._pf_state is not None:
                self._pf_step()      # one chunk per tick
        if not self._live:
            # pipelined calls issued before the last retirement may
            # still hold undelivered tokens — flush before idling
            # (draining only ever retires, it can't make slots live)
            self._drain_all()
            if self._pf_state is None and not self._pf_queue:
                self._idle.set()
                self._woken.wait(timeout=0.05)
                self._woken.clear()
            return
        t0 = self._clock() if self._spec_k else 0.0
        tried_verify = False
        if self._spec_k and self._spec_gate():
            # both greedy (argmax-verify) and sampled (rejection-scheme)
            # slots can accept drafts. Ticks where NO slot found a draft
            # fall through to the plain step — a verify would pay its
            # extra positions for nothing.
            tried_verify = True
            drafts = self._collect_drafts()
            if drafts is not None:
                before = self._tokens_emitted
                self._tick_spec(drafts)
                self._spec_record("verify", self._tokens_emitted - before,
                                  t0)
                return
        self._rng, sub = jax.random.split(self._rng)
        step = (self._step_nucleus
                if any(self._topps[r.slot] < 1.0 and self._temps[r.slot] > 0
                       for r in self._live.values())
                else self._step_plain)
        before = self._tokens_emitted
        toks, self._cur, self._cache = step(
            self.params, self._cur, self._cache, sub,
            jnp.asarray(self._temps), jnp.asarray(self._topps))
        self._inflight.append((toks, dict(self._live)))
        if len(self._inflight) >= self._pipeline_depth:
            self._drain_one()
        if self._spec_k:
            # a verify-chosen tick that found no drafts charges the
            # wasted scan to the verify arm — that IS the realized
            # value of choosing verify on this workload (depth 1 here:
            # spec_k excludes pipelining, so the drain above ran).
            # instant_up=False: this tick ran the PLAIN scan at full
            # steps_per_call throughput; letting its max() pin the
            # verify estimate at plain level on draft-sparse traffic
            # would latch verify-chosen mode and eat several slow
            # verify ticks per decay cycle when drafts reappear.
            self._spec_record("verify" if tried_verify else "plain",
                              self._tokens_emitted - before, t0,
                              instant_up=not tried_verify)

    def _drain_one(self):
        """Read the oldest in-flight step call and emit its tokens to
        the requests that were live when it was ISSUED (retired-then-
        reused slots must not leak the old sequence's tokens into the
        new request — _emit's done-guard drops the retirees)."""
        toks, snap = self._inflight.pop(0)
        toks = np.asarray(toks)                  # [n_slots, k]
        for k in range(toks.shape[1]):
            for slot, req in snap.items():
                self._emit(req, int(toks[slot, k]))

    def _drain_all(self):
        while self._inflight:
            self._drain_one()

    def _spec_gate(self) -> bool:
        """Bandit arm choice: True when a verify tick should run. Pure
        host-side bookkeeping (no device work); always True when
        spec_adaptive is off. Prefers the arm with the higher measured
        tokens/sec EWMA; unmeasured arms get measured first (verify
        before plain, so serving starts optimistic); every
        spec_probe_interval consecutive same-arm ticks the other arm is
        probed once, which is what lets a parked speculator come back
        when the workload turns repetitive again."""
        if not self._spec_adaptive:
            return True
        v, p = self._arm_tps["verify"], self._arm_tps["plain"]
        if v is None:
            choice = True
        elif p is None:
            choice = False
        else:
            choice = v >= p
        arm = "verify" if choice else "plain"
        last, run = self._arm_streak
        if arm == last and run >= self._spec_probe_interval:
            choice = not choice
            arm = "verify" if choice else "plain"
        if not choice:
            self._spec_suppressed_ticks += 1
        return choice

    def _spec_record(self, arm: str, tokens: int, t0: float,
                     instant_up: bool = True) -> None:
        """Feed one tick's realized throughput into the bandit."""
        if not self._spec_adaptive:
            return
        dt = max(self._clock() - t0, 1e-9)
        tps = tokens / dt
        cur = self._arm_tps[arm]
        # asymmetric EWMA: instant up (one good probe re-enables a
        # parked arm), smooth decay down (one slow tick doesn't park a
        # healthy one). instant_up=False when the recorded tick didn't
        # actually execute the charged arm's step (draftless verify-
        # gated ticks run the plain scan).
        if cur is None:
            self._arm_tps[arm] = tps
        elif instant_up:
            self._arm_tps[arm] = max(tps, 0.8 * cur + 0.2 * tps)
        else:
            self._arm_tps[arm] = 0.8 * cur + 0.2 * tps
        last, run = self._arm_streak
        self._arm_streak = (arm, run + 1 if arm == last else 1)

    def _collect_drafts(self) -> Optional[np.ndarray]:
        """Prompt-lookup draft per live slot (host side) — greedy slots
        verify against argmax, sampled slots accept via the rejection
        scheme. Returns [n_slots, k] or None when no slot produced a
        draft."""
        from .speculative import ngram_draft

        k = self._spec_k
        draft = self._draft_fn or ngram_draft
        drafts = np.zeros((self.n_slots, k), np.int32)
        found = 0
        for slot, req in self._live.items():
            d = draft(list(int(t) for t in req.ids) + req.emitted, k)
            if d is not None:
                drafts[slot] = d
                found += 1
        self._spec_drafted_slots = found
        return drafts if found else None

    def _tick_spec(self, drafts: np.ndarray):
        """Speculative engine step: verify every slot's drafts in ONE
        device call, emit the accepted run per slot."""
        self._rng, sub = jax.random.split(self._rng)
        step = (self._spec_nucleus
                if any(self._topps[r.slot] < 1.0 and self._temps[r.slot] > 0
                       for r in self._live.values())
                else self._spec_plain)
        toks, n_acc, self._cur, self._cache = step(
            self.params, self._cur, self._cache, sub,
            jnp.asarray(self._temps), jnp.asarray(self._topps),
            jnp.asarray(drafts))
        toks = np.asarray(toks)                  # [n_slots, 1+k]
        n_acc = np.asarray(n_acc)
        self._spec_calls += 1
        before = self._tokens_emitted
        accepted_this_call = 0
        for slot, req in list(self._live.items()):
            accepted_this_call += int(n_acc[slot])
            for i in range(int(n_acc[slot]) + 1):
                self._emit(req, int(toks[slot, i]))
        self._spec_accepted += accepted_this_call
        self._spec_tokens += self._tokens_emitted - before

    # -- public API --------------------------------------------------------

    def _make_request(self, ids: np.ndarray,
                      pixel_values: Optional[np.ndarray] = None,
                      max_new_tokens: int = 128, temperature: float = 0.0,
                      top_p: float = 1.0,
                      eos_ids: Optional[List[int]] = None) -> _Request:
        """Validate capacity, construct, and enqueue a request (the
        non-lazy half of submit(); warmup() enqueues through this so
        bursts form before any consumer starts iterating)."""
        from ..constants import IMAGE_TOKEN_INDEX
        # Capacity must be checked against the SPLICED length: each
        # <image> sentinel expands to num_image_tokens embeddings
        # (models/llava.py stream_generate: prompt_len = L - 1 + P per
        # image), so a near-capacity multimodal prompt that passes a
        # raw-len check would overflow the cache and clamp writes into
        # the dump slot silently.
        n_img = int(np.sum(np.asarray(ids) == IMAGE_TOKEN_INDEX))
        p_img = int(getattr(self.cfg, "num_image_tokens", 0) or 0)
        expanded = len(ids) + n_img * max(p_img - 1, 0)
        if expanded + max_new_tokens + self._spec_k > self.max_len:
            raise ValueError(
                f"prompt {len(ids)} (expanded {expanded} with {n_img} "
                f"image(s) x {p_img} tokens) + max_new {max_new_tokens} "
                f"(+ spec_k {self._spec_k}) exceeds engine max_len "
                f"{self.max_len}")
        req = _Request(ids=np.asarray(ids, np.int32),
                       pixel_values=pixel_values,
                       max_new_tokens=max_new_tokens,
                       temperature=temperature,
                       top_p=top_p,
                       eos_ids=frozenset(eos_ids or []))
        self._requests.put(req)
        self._woken.set()
        return req

    def submit(self, ids: np.ndarray,
               pixel_values: Optional[np.ndarray] = None,
               max_new_tokens: int = 128, temperature: float = 0.0,
               top_p: float = 1.0,
               eos_ids: Optional[List[int]] = None
               ) -> Iterator[int]:
        """Enqueue a prompt; yields sampled token ids as they decode."""
        req = self._make_request(ids, pixel_values, max_new_tokens,
                                 temperature, top_p, eos_ids)
        try:
            while True:
                tok = req.out.get()
                if tok is None:
                    return
                yield tok
        finally:
            # abandoning the iterator (client disconnect, stop-string
            # cut) retires the slot at the next token boundary instead
            # of decoding to max_new_tokens
            req.cancelled = True

    # -- warmup --------------------------------------------------------------

    def _warm_drain(self, reqs: List[_Request]) -> None:
        """Run the engine until every warmup request retires. With the
        engine thread running this blocks on the output queues; with
        run_thread=False it drives _tick() directly."""
        if self._thread is None:
            while self.error is None and not all(r.done for r in reqs):
                self._tick()
        else:
            for r in reqs:
                while r.out.get() is not None:
                    pass
            # done events fire inside _emit MID-tick: the engine thread
            # still has bandit/telemetry bookkeeping ahead of it in the
            # tick that delivered the final token. Wait until it parks
            # in the idle branch so the caller may mutate engine state
            # (the quiescence _quiescent() asserts and warmup's finally
            # scrub rely on).
            self._idle.clear()
            while self.error is None and not self._idle.wait(timeout=1.0):
                pass
        if self.error is not None:
            raise RuntimeError("engine failed during warmup") from self.error

    def warmup(self, prompt_buckets=(32,), burst_sizes=None,
               sampled: bool = True, image_shapes=()) -> dict:
        """Deterministically precompile every steady-state device program.

        Under XLA each distinct program shape JIT-compiles the first time
        live traffic hits it: the first 4-wide admission burst, the first
        sampled slot, the first spec-verify tick each stall EVERY live
        stream for a full compile (observed 2026-08-19: a 241 s first-token
        time on the 5.1B engine when the verify program compiled inside
        the timed window). The reference worker has no analog — eager
        torch compiles nothing (moe_model/serve/model_worker.py:125-180);
        here warmup-vs-not is the difference between a ~minutes and a
        sub-second worst-case TTFT.

        Drives tiny requests through the NORMAL admission/step path so the
        compiled shapes are exactly steady state's:

        - one burst-prefill + insert_many program per (prompt bucket,
          pow-2 burst rows up to max_prefill_batch) — `_hold_admission`
          batches the queued requests so each burst admits as ONE group;
        - the plain decode step, plus the nucleus step when sampled=True;
        - the spec-verify program(s) when spec_k>0 (drafts forced via a
          temporary draft_fn so verify ticks are guaranteed);
        - the chunked-prefill program when prefill_chunk>0 (text buckets
          longer than the chunk always take this path, so their burst
          programs are skipped — production never compiles them either);
        - park + unpark (suffix-only prefill) when prefix_cache_slots>0;
        - optionally, image-group prefill for each pixel_values shape in
          `image_shapes` (grouped one-shot path, per burst size).

        Warmup traffic is scrubbed afterwards: park slots cleared and
        stats() counters reset, so serving telemetry reflects real
        traffic only. Returns {"programs": [...], "seconds": float}.
        """
        from ..constants import IMAGE_TOKEN_INDEX

        t0 = time.monotonic()
        span = max(2, self.cfg.decoder.vocab_size - 12)
        p_img = int(getattr(self.cfg, "num_image_tokens", 0) or 0)
        if burst_sizes is None:
            cap = max(1, min(self.max_prefill_batch, self.n_slots))
            burst_sizes, s = [], 1
            while s <= cap:
                burst_sizes.append(s)
                s *= 2
            if burst_sizes[-1] != cap:
                # a non-pow-2 cap (e.g. 3 slots) still pads to the NEXT
                # pow-2 row count in _admit_group — admit one cap-sized
                # burst so that program compiles too
                burst_sizes.append(cap)
        buckets = sorted({_bucket(int(b)) for b in prompt_buckets})
        programs: List[str] = []
        old_draft = self._draft_fn
        # the bandit must not gate warmup: its first tick carries the
        # jit-compile stall, and charging that to an arm could make
        # _spec_gate pick plain during the forced-draft spec pass —
        # leaving the verify program uncompiled, the exact pathology
        # warmup exists to prevent. The finally block resets the arm
        # estimates anyway, so nothing is lost by disabling it here.
        old_adaptive = self._spec_adaptive
        self._spec_adaptive = False

        def _ids(length: int, salt: int) -> np.ndarray:
            # distinct per (bucket, row): accidental prefix-cache hits
            # between warmup passes would reroute a burst row through
            # the unpark path and leave its burst program uncompiled
            return (11 + (salt * 7919 + np.arange(length)) % span
                    ).astype(np.int32)

        def _wlen(bucket):
            # chunking routes on RAW length (> chunk), bucketing rounds
            # up to pow-2 ≥ 32: a bucket can exceed the chunk while raw
            # lengths inside it still admit via bursts. Warm prompts use
            # the longest burst-reachable length of the bucket.
            if self._pf_chunk_n and bucket > self._pf_chunk_n:
                return self._pf_chunk_n
            return bucket

        def _quiescent():
            # warmup mutates engine-thread state (_draft_fn, _park_meta,
            # _hold_admission) from the CALLER thread. That is safe only
            # because _warm_drain quiesces the engine between phases:
            # nothing live, nothing queued, so the engine thread is
            # parked in _woken.wait and cannot race the mutation.
            assert not self._live and self._requests.empty(), \
                "warmup mutated engine state while the engine was active"

        def _burst(length, size, temp, topp, max_new=2, img_shape=None):
            _quiescent()
            self._hold_admission = True
            reqs = []
            for i in range(size):
                ids = _ids(length, length * 131 + i)
                px = None
                if img_shape is not None:
                    ids[min(1, length - 1)] = IMAGE_TOKEN_INDEX
                    px = np.zeros(img_shape, np.float32)
                reqs.append(self._make_request(
                    ids, pixel_values=px, max_new_tokens=max_new,
                    temperature=temp, top_p=topp))
            self._hold_admission = False
            self._woken.set()
            self._warm_drain(reqs)
            return reqs

        try:
            variants = [(0.0, 1.0, "plain")]
            if sampled:
                variants.append((0.7, 0.9, "nucleus"))
            for temp, topp, tag in variants:
                # plain/nucleus-step ticks must not become spec ticks
                _quiescent()
                self._draft_fn = lambda history, k: None
                for bucket in buckets:
                    if bucket + 2 + self._spec_k > self.max_len:
                        continue
                    wl = _wlen(bucket)
                    if _bucket(wl) == bucket:
                        # burst path reachable in this bucket (a bucket
                        # fully above the chunk length only ever admits
                        # via chunked prefill — warmed below)
                        for size in burst_sizes:
                            _burst(wl, size, temp, topp)
                            programs.append(
                                f"prefill[b{bucket} x{size}]+step:{tag}")
                    for shape in image_shapes:
                        # image prompts never chunk: full bucket length
                        if (bucket + max(p_img - 1, 0) + 2
                                + self._spec_k > self.max_len):
                            continue
                        for size in burst_sizes:
                            _burst(bucket, size, temp, topp,
                                   img_shape=shape)
                            programs.append(
                                f"img_prefill[b{bucket} x{size} "
                                f"{tuple(shape)}]:{tag}")
                if self._spec_k:
                    _quiescent()
                    self._draft_fn = (
                        lambda history, k: np.full((k,), 11, np.int32))
                    _burst(_wlen(buckets[0]), 1, temp, topp,
                           max_new=self._spec_k + 2)
                    programs.append(f"spec_verify:{tag}")
            self._draft_fn = lambda history, k: None
            if self._pf_chunk_n:
                L = self._pf_chunk_n + 1
                if L + 2 + self._spec_k <= self.max_len:
                    req = self._make_request(_ids(L, 997),
                                             max_new_tokens=2)
                    self._warm_drain([req])
                    programs.append(
                        f"chunked_prefill[{self._pf_chunk_n}]")
            if self._park_n:
                # grouped reuse admission compiles one program per
                # (pow-2 batch rows, suffix bucket) — warm each
                # reachable burst size (bounded by park capacity: a
                # group of s hits needs s parked conversations)
                for size in [s for s in burst_sizes
                             if s <= self._park_n]:
                    # scrub between passes: _ids is deterministic per
                    # (bucket, row), so a previous pass's parked rows
                    # would otherwise prefix-hit THIS pass's firsts and
                    # reroute them off the burst path
                    self._park_meta = [None] * self._park_n
                    self._park_pending.clear()
                    firsts = _burst(_wlen(buckets[0]), size, 0.0, 1.0,
                                    max_new=4)
                    self._hold_admission = True
                    follows = []
                    for j, first in enumerate(firsts):
                        follow = np.concatenate(
                            [first.ids,
                             np.asarray(first.emitted, np.int32),
                             _ids(8, 499 + 13 * j)])
                        if (len(follow) + 2 + self._spec_k
                                > self.max_len):
                            continue
                        follows.append(self._make_request(
                            follow, max_new_tokens=2))
                    self._hold_admission = False
                    self._woken.set()
                    if follows:
                        self._warm_drain(follows)
                        programs.append(f"park+unpark x{len(follows)}")
        finally:
            self._spec_adaptive = old_adaptive
            self._draft_fn = old_draft
            self._hold_admission = False
            # scrub: telemetry + prefix cache reflect real traffic only
            self._park_meta = [None] * self._park_n
            self._park_pending.clear()
            self._park_clock = 0
            self._prefix_hits = 0
            self._spec_calls = self._spec_accepted = self._spec_tokens = 0
            # warmup's forced drafts are synthetic and its ticks carry
            # compile time — reset the bandit so live serving starts
            # optimistic with clean throughput estimates
            self._arm_tps = {"verify": None, "plain": None}
            self._arm_streak = ("verify", 0)
            self._spec_suppressed_ticks = 0
            self._tokens_emitted = 0
            self._started = time.monotonic()
        return {"programs": programs,
                "seconds": round(time.monotonic() - t0, 3)}

    def stats(self) -> dict:
        """Slot/throughput telemetry, merged into /worker_get_status
        (the reference heartbeat's speed/queue_length observability
        role extended to the batched engine)."""
        elapsed = max(time.monotonic() - self._started, 1e-9)
        return {
            "engine_slots_live": len(self._live),
            "engine_slots_free": len(self._free),
            "engine_queued": self._requests.qsize(),
            "engine_tokens_emitted": self._tokens_emitted,
            "engine_tokens_per_sec_lifetime": round(
                self._tokens_emitted / elapsed, 2),
            "engine_prefix_cache_hits": self._prefix_hits,
            **({"engine_chunked_prefill_queued": len(self._pf_queue)
                + (1 if self._pf_state is not None else 0)}
               if self._pf_chunk_n else {}),
            **({"engine_spec_verify_calls": self._spec_calls,
                "engine_spec_accepted_drafts": self._spec_accepted,
                # over verify-tick emissions only (plain-step fallback
                # ticks and admission first-tokens excluded)
                "engine_spec_tokens_per_step": round(
                    self._spec_tokens / max(self._spec_calls, 1), 2),
                **({"engine_spec_tps_verify":
                        (round(self._arm_tps["verify"], 1)
                         if self._arm_tps["verify"] is not None else None),
                    "engine_spec_tps_plain":
                        (round(self._arm_tps["plain"], 1)
                         if self._arm_tps["plain"] is not None else None),
                    "engine_spec_suppressed_ticks":
                        self._spec_suppressed_ticks}
                   if self._spec_adaptive else {})}
               if self._spec_k else {}),
        }

    def shutdown(self):
        self._stop.set()
        self._woken.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        # consumers blocked on out.get() must not hang past shutdown
        self._release_waiters()
