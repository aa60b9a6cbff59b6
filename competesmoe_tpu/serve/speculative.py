"""Prompt-lookup speculative decoding: host-side n-gram drafting.

TPU decode is weight-bandwidth-bound: one decode step reads every weight
byte to produce ONE token per sequence, so a verify step that feeds K+1
tokens through the same weights costs nearly the same wall time as a
1-token step (the weight stream dominates; the extra activations are
noise at small K).  Speculative decoding exploits that asymmetry: draft K
tokens cheaply, verify them all in one step, and keep the longest prefix
that matches the model's own greedy choices — emitting 1..K+1 tokens per
step with BIT-EXACT greedy output (the accept rule only ever keeps tokens
the model would have produced anyway).

The draft source here is *prompt lookup* (n-gram continuation): find the
most recent earlier occurrence of the current suffix n-gram and propose
the tokens that followed it.  No draft model, no extra weights — ideal
for the VQA / document-chat / code workloads this framework serves, where
replies quote the prompt heavily.  The reference has no speculative path
at all (its serve loop is HF `generate` one token at a time,
moe_model/serve/model_worker.py:125-180); this is a TPU-native capability
beyond parity.

Device-side verification lives in `models.llava.make_verify_step`; the
solo serving path enables it via `stream_generate(..., speculative=K)`
and the batching engine via `DecodeEngine(spec_k=K)`.
"""

from typing import Optional, Sequence

import numpy as np

__all__ = ["ngram_draft"]


def ngram_draft(ids: Sequence[int], k: int, max_ngram: int = 3,
                min_ngram: int = 1) -> Optional[np.ndarray]:
    """Propose `k` draft tokens by prompt lookup.

    Searches `ids` (prompt + tokens generated so far, host ints) for the
    most recent earlier occurrence of the longest suffix n-gram
    (`max_ngram` down to `min_ngram`) and returns a copy of the `k`
    tokens that followed it, padded with the last available token when
    the match sits near the end.  Returns None when no n-gram recurs —
    the caller should then fall back to a plain decode step (or verify a
    zero draft; both cost the same on a bandwidth-bound step).

    Negative ids (the image-token sentinel spliced out before decode) are
    masked out of matching and never proposed.
    """
    ids = np.asarray(ids, dtype=np.int64).ravel()
    L = ids.shape[0]
    if L < 2 or k <= 0:
        return None
    for n in range(min(max_ngram, L - 1), min_ngram - 1, -1):
        pat = ids[L - n:]
        if (pat < 0).any():
            continue
        # windows of length n starting at 0..L-n-1 (strictly before the
        # suffix start, though overlap with it is fine and useful for
        # token runs): compare against the suffix pattern.
        win = np.lib.stride_tricks.sliding_window_view(ids[:L - 1], n)
        hits = np.flatnonzero((win == pat).all(axis=1))
        if hits.size == 0:
            continue
        start = int(hits[-1]) + n          # continuation start
        cont = ids[start:start + k]
        cont = cont[cont >= 0]
        if cont.size == 0:
            continue
        if cont.size < k:                  # pad: repeat the last token
            cont = np.concatenate(
                [cont, np.full(k - cont.size, cont[-1], np.int64)])
        return cont.astype(np.int32)
    return None
