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
- an arriving request prefills at batch 1 (prompt padded to a pow-2
  bucket so prefill programs are reused), its cache row is spliced into
  a free slot with a jitted dynamic_update_slice, and it joins the
  batched step on the next iteration — admission never recompiles;
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
  steps_per_call=1 minimizes admission latency.

Everything device-side is jitted and shape-stable: the step program
compiles once per engine, prefill once per (bucket, image-shape) pair,
insert/reset once each.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import KVCache
from ..models.llava import make_generate_fns, sample_token


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


class DecodeEngine:
    """Slot-based continuous batching around one LlavaModel.

    submit() enqueues a request and returns an iterator of token ids
    (ints) that streams as the engine decodes; the engine thread owns
    every device call (TPU access stays single-threaded).
    """

    def __init__(self, model, params, n_slots: int = 8,
                 max_len: int = 2048, steps_per_call: int = 1,
                 rng_seed: int = 0):
        self.model = model
        self.params = params
        self.cfg = model.cfg
        self.n_slots = n_slots
        self.max_len = max_len
        self.steps_per_call = steps_per_call
        self._requests: "queue.Queue[_Request]" = queue.Queue()
        self._live: Dict[int, _Request] = {}
        self._free = list(range(n_slots))
        self._rng = jax.random.PRNGKey(rng_seed)
        self._cache = KVCache.create(self.cfg.decoder, n_slots, max_len)
        self._cur = jnp.zeros((n_slots,), jnp.int32)
        self._temps = np.zeros((n_slots,), np.float32)
        self._topps = np.ones((n_slots,), np.float32)
        self.error: Optional[Exception] = None
        self._build_fns()
        self._stop = threading.Event()
        self._woken = threading.Event()
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

        @partial(jax.jit, donate_argnums=(0,))
        def insert(cache: KVCache, row: KVCache, slot, cur, tok):
            """Splice a batch-1 prefill cache into `slot` (axis 1 of the
            stacked [L, B, S, ...] buffers, axis 0 of pos). `slot` is a
            traced scalar, so one program serves every slot."""
            def put(buf, upd, axis):
                return jax.lax.dynamic_update_slice_in_dim(
                    buf, upd, slot, axis=axis)

            return KVCache(
                k=put(cache.k, row.k, 1), v=put(cache.v, row.v, 1),
                pos=put(cache.pos, row.pos, 0),
                k_scale=(put(cache.k_scale, row.k_scale, 1)
                         if cache.k_scale is not None else None),
                v_scale=(put(cache.v_scale, row.v_scale, 1)
                         if cache.v_scale is not None else None),
            ), put(cur, tok, 0)

        self._insert = insert

    def _prefill_one(self, req: _Request):
        """Batch-1 prefill on a pow-2 padded prompt: jit retraces once
        per (bucket, image-shape); right-pads carry attention_mask 0 and
        land in the cache dump slot, so padding is token-exact."""
        L = len(req.ids)
        b = _bucket(L)
        ids = np.zeros((1, b), np.int32)
        ids[0, :L] = req.ids
        mask = np.zeros((1, b), np.int32)
        mask[0, :L] = 1
        px = (None if req.pixel_values is None
              else jnp.asarray(req.pixel_values))
        last, out = self._prefill(self.params, jnp.asarray(ids), px,
                                  jnp.asarray(mask))
        # prefill leaves pos at the written length; the engine's step
        # advances pos itself, so the row arrives decode-ready
        return last, out.cache

    # -- engine thread -----------------------------------------------------

    def _admit(self):
        while self._free and not self._requests.empty():
            try:
                req = self._requests.get_nowait()
            except queue.Empty:
                return
            slot = self._free.pop()
            last_logits, row_cache = self._prefill_one(req)
            self._rng, sub = jax.random.split(self._rng)
            tok = sample_token(last_logits, sub, req.temperature,
                               req.top_p)
            self._cache, self._cur = self._insert(
                self._cache, row_cache, jnp.int32(slot), self._cur, tok)
            self._temps[slot] = req.temperature
            self._topps[slot] = req.top_p
            req.slot = slot
            self._live[slot] = req
            self._emit(req, int(np.asarray(tok)[0]))

    def _emit(self, req: _Request, token: int):
        if req.done:
            return
        req.produced += 1
        req.out.put(token)
        if token in req.eos_ids or req.produced >= req.max_new_tokens:
            req.done = True
            req.out.put(None)
            self._live.pop(req.slot, None)
            self._free.append(req.slot)

    def _loop(self):
        try:
            self._run()
        except Exception as e:  # noqa: BLE001 — surface to all waiters
            self.error = e
            for req in list(self._live.values()):
                req.done = True
                req.out.put(None)
            while not self._requests.empty():
                try:
                    self._requests.get_nowait().out.put(None)
                except queue.Empty:
                    break

    def _run(self):
        while not self._stop.is_set():
            self._admit()
            if not self._live:
                self._woken.wait(timeout=0.05)
                self._woken.clear()
                continue
            self._rng, sub = jax.random.split(self._rng)
            step = (self._step_nucleus
                    if any(self._topps[r.slot] < 1.0 and self._temps[r.slot] > 0
                           for r in self._live.values())
                    else self._step_plain)
            toks, self._cur, self._cache = step(
                self.params, self._cur, self._cache, sub,
                jnp.asarray(self._temps), jnp.asarray(self._topps))
            toks = np.asarray(toks)                  # [n_slots, k]
            for k in range(toks.shape[1]):
                for slot, req in list(self._live.items()):
                    self._emit(req, int(toks[slot, k]))

    # -- public API --------------------------------------------------------

    def submit(self, ids: np.ndarray,
               pixel_values: Optional[np.ndarray] = None,
               max_new_tokens: int = 128, temperature: float = 0.0,
               top_p: float = 1.0,
               eos_ids: Optional[List[int]] = None
               ) -> Iterator[int]:
        """Enqueue a prompt; yields sampled token ids as they decode."""
        if len(ids) + max_new_tokens > self.max_len:
            raise ValueError(
                f"prompt {len(ids)} + max_new {max_new_tokens} exceeds "
                f"engine max_len {self.max_len}")
        req = _Request(ids=np.asarray(ids, np.int32),
                       pixel_values=pixel_values,
                       max_new_tokens=max_new_tokens,
                       temperature=temperature,
                       top_p=top_p,
                       eos_ids=frozenset(eos_ids or []))
        self._requests.put(req)
        self._woken.set()
        while True:
            tok = req.out.get()
            if tok is None:
                return
            yield tok

    def shutdown(self):
        self._stop.set()
        self._woken.set()
        self._thread.join(timeout=5)
