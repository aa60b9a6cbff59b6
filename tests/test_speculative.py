"""Prompt-lookup speculative decoding: drafting, the verify step, and
bit-exactness of the speculative stream vs sequential greedy decode.

The accept rule only keeps tokens the model's own greedy argmax would
have produced (models/llava.py:make_verify_step), so speculation must
never change output — the tests assert that end to end, plus the
acceptance accounting (a draft equal to the true greedy continuation is
fully accepted; a garbage draft is fully rejected)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from competesmoe_tpu.models.decoder import KVCache
from competesmoe_tpu.models.llava import (
    LlavaModel,
    generate,
    make_generate_fns,
    make_verify_step,
    stream_generate,
)
from competesmoe_tpu.serve.speculative import ngram_draft
from tests.test_llava import tiny_llava_cfg

# fast marks are per-test: heavy wide-matrix cases run mid-tier


@pytest.mark.fast
def test_ngram_draft_finds_continuation():
    ids = [5, 6, 7, 8, 9, 5, 6, 7]
    d = ngram_draft(ids, k=2, max_ngram=3)
    assert d is not None and d.tolist() == [8, 9]


@pytest.mark.fast
def test_ngram_draft_prefers_most_recent_match():
    ids = [1, 2, 3, 1, 2, 4, 1, 2]
    d = ngram_draft(ids, k=1, max_ngram=3)
    assert d.tolist() == [4]


@pytest.mark.fast
def test_ngram_draft_pads_short_continuation():
    ids = [7, 8, 7, 8]
    d = ngram_draft(ids, k=4, max_ngram=2)
    # match of (7,8) at 0 continues with 7, 8 then runs out -> padded
    assert d is not None and len(d) == 4 and d[0] == 7 and d[1] == 8


@pytest.mark.fast
def test_ngram_draft_no_match_and_sentinels():
    assert ngram_draft([1, 2, 3, 4], k=2) is None
    assert ngram_draft([], k=2) is None
    # image sentinel (-200) never matches or gets proposed
    assert ngram_draft([-200, 5, -200, 5], k=1, max_ngram=1) is None


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = tiny_llava_cfg(moe=False)
    model = LlavaModel(cfg)
    ids = np.full((1, 6), 2, np.int32)
    params = model.init(jax.random.PRNGKey(0), ids, None)
    return model, params, cfg


def _greedy_reference(model, params, cfg, prompt, n):
    toks, _ = generate(model, params, prompt, None, max_new_tokens=n,
                       temperature=0.0, scan_decode=False)
    return toks[0]


@pytest.mark.fast
def test_verify_step_accepts_true_continuation(tiny_lm):
    """Feeding the model's own greedy continuation as the draft must
    accept every draft token and return the same tokens."""
    model, params, cfg = tiny_lm
    prompt = np.array([[3, 5, 7, 9, 11, 13]], np.int32)
    ref = _greedy_reference(model, params, cfg, prompt, 6)

    k = 4
    max_len = prompt.shape[1] + 8 + k
    prefill, _ = make_generate_fns(model, cfg, max_len)
    cache = KVCache.create(cfg.decoder, 1, max_len)
    out = model.apply(params, jnp.asarray(prompt), None, cache=cache)
    cache = out.cache

    verify = make_verify_step(model, k)
    # tokens = [first greedy token, next k true greedy tokens as draft]
    toks = jnp.asarray(ref[: k + 1][None].astype(np.int32))
    greedy, n_acc, cache2 = verify(params, toks, cache)
    assert int(n_acc[0]) == k
    # emitted = greedy[:, :k+1] must equal ref[1 : k+2]
    np.testing.assert_array_equal(np.asarray(greedy)[0, : k + 1],
                                  ref[1: k + 2])
    assert int(cache2.pos[0]) == prompt.shape[1] + k + 1


@pytest.mark.fast
def test_verify_step_rejects_garbage_draft(tiny_lm):
    model, params, cfg = tiny_lm
    prompt = np.array([[3, 5, 7, 9, 11, 13]], np.int32)
    ref = _greedy_reference(model, params, cfg, prompt, 3)

    k = 3
    max_len = prompt.shape[1] + 8 + k
    cache = KVCache.create(cfg.decoder, 1, max_len)
    out = model.apply(params, jnp.asarray(prompt), None, cache=cache)
    cache = out.cache

    verify = make_verify_step(model, k)
    bad = (np.asarray(ref[1: k + 1]) + 1) % cfg.decoder.vocab_size
    toks = np.concatenate([[ref[0]], bad]).astype(np.int32)
    greedy, n_acc, cache2 = verify(params, jnp.asarray(toks[None]), cache)
    assert int(n_acc[0]) == 0
    # the bonus token is still the true next greedy token
    assert int(np.asarray(greedy)[0, 0]) == int(ref[1])
    assert int(cache2.pos[0]) == prompt.shape[1] + 1


@pytest.mark.parametrize("k", [2, 4])
@pytest.mark.fast
def test_speculative_stream_bit_exact(tiny_lm, k):
    """stream_generate(speculative=k) emits exactly the sequential greedy
    tokens, regardless of draft quality, and in order."""
    model, params, cfg = tiny_lm
    # a prompt with recurring n-grams so drafting actually fires
    prompt = np.array([[4, 8, 15, 4, 8, 15, 4, 8]], np.int32)
    n = 12
    ref = _greedy_reference(model, params, cfg, prompt, n)

    got = []
    for chunk in stream_generate(model, params, prompt, None,
                                 max_new_tokens=n, temperature=0.0,
                                 speculative=k):
        got.extend(chunk[0].tolist())
    np.testing.assert_array_equal(np.asarray(got), ref[: len(got)])
    assert len(got) == n


@pytest.mark.fast
def test_speculative_stream_respects_stop(tiny_lm):
    model, params, cfg = tiny_lm
    prompt = np.array([[4, 8, 15, 4, 8, 15, 4, 8]], np.int32)
    n = 12
    ref = _greedy_reference(model, params, cfg, prompt, n)
    stop = int(ref[3])  # force a stop at the 4th generated token

    got = []
    for chunk in stream_generate(model, params, prompt, None,
                                 max_new_tokens=n, temperature=0.0,
                                 speculative=3, stop_token_ids=[stop]):
        got.extend(chunk[0].tolist())
    # everything up to and including the first stop matches the
    # reference; nothing after the stop differs from the stop id
    first = got.index(stop)
    np.testing.assert_array_equal(np.asarray(got[: first + 1]),
                                  ref[: first + 1])
    assert all(t == stop for t in got[first:])


@pytest.mark.parametrize("k", [3])
@pytest.mark.fast
def test_generate_speculative_bit_exact(tiny_lm, k):
    """generate(speculative=k) returns exactly the sequential-greedy
    tokens with the same stop truncation as the scan path."""
    model, params, cfg = tiny_lm
    prompt = np.array([[4, 8, 15, 4, 8, 15, 4, 8]], np.int32)
    ref, _ = generate(model, params, prompt, None, max_new_tokens=10,
                      temperature=0.0, scan_decode=False)
    got, _ = generate(model, params, prompt, None, max_new_tokens=10,
                      temperature=0.0, speculative=k)
    np.testing.assert_array_equal(got[0], ref[0])

    stop = int(ref[0][4])
    ref_s, _ = generate(model, params, prompt, None, max_new_tokens=10,
                        temperature=0.0, stop_token_ids=[stop])
    got_s, _ = generate(model, params, prompt, None, max_new_tokens=10,
                        temperature=0.0, speculative=k,
                        stop_token_ids=[stop])
    np.testing.assert_array_equal(got_s[0], ref_s[0])


def test_eval_adapter_speculative_same_answers(tiny_lm):
    """JaxLlava(speculative=K) produces identical generate_until
    responses (eval scores cannot move)."""
    from competesmoe_tpu.eval import JaxLlava
    from competesmoe_tpu.eval.instance import Instance
    from competesmoe_tpu.multimodal.mm_utils import ImageProcessorConfig
    from tests.test_eval_harness import EvalTok

    model, params, cfg = tiny_lm
    tok = EvalTok()
    tok("hello world red cat what is this the and a")
    mk = lambda **kw: JaxLlava(model, params, tok,
                               ImageProcessorConfig(size=28),
                               max_new_tokens=6, **kw)
    def reqs():
        return [Instance(request_type="generate_until",
                         arguments=("hello world hello world", {}, None),
                         idx=i, metadata=("t", i, 1)) for i in range(2)]
    plain = mk().generate_until(reqs())
    spec = mk(speculative=3).generate_until(reqs())
    assert plain == spec


def test_speculative_with_int8_kv_cache_bit_exact():
    """Speculation composes with the quantized KV cache: the verify
    step quantizes K+1 slots at once, per (token, head) — identical
    values to one-at-a-time decode, so spec output matches plain greedy
    on the SAME int8 cache."""
    import dataclasses

    model_cfg = tiny_llava_cfg(moe=False)
    model_cfg = dataclasses.replace(
        model_cfg, decoder=dataclasses.replace(model_cfg.decoder,
                                               kv_quant="int8"))
    model = LlavaModel(model_cfg)
    ids = np.full((1, 6), 2, np.int32)
    params = model.init(jax.random.PRNGKey(0), ids, None)

    prompt = np.array([[4, 8, 15, 4, 8, 15, 4, 8]], np.int32)
    ref, _ = generate(model, params, prompt, None, max_new_tokens=8,
                      temperature=0.0, scan_decode=False)
    got, _ = generate(model, params, prompt, None, max_new_tokens=8,
                      temperature=0.0, speculative=3)
    np.testing.assert_array_equal(got[0], ref[0])


def test_worker_generate_fn_speculative_matches_plain(tiny_lm):
    """The worker's solo generate_fn with speculative=K yields the same
    final text as the plain path (greedy bit-exactness end to end)."""
    from competesmoe_tpu.eval import JaxLlava
    from competesmoe_tpu.multimodal.mm_utils import ImageProcessorConfig
    from competesmoe_tpu.serve.model_worker import jax_llava_generate_fn
    from tests.test_eval_harness import EvalTok

    model, params, cfg = tiny_lm
    tok = EvalTok()
    tok("hello world red cat what is this the and a")
    adapter = JaxLlava(model, params, tok, ImageProcessorConfig(size=28),
                       max_new_tokens=8)
    req = {"prompt": "hello world hello world hello",
           "max_new_tokens": 8, "temperature": 0.0}
    plain = list(jax_llava_generate_fn(adapter)(dict(req)))
    spec = list(jax_llava_generate_fn(adapter)(
        dict(req, speculative=3)))
    assert plain[-1] == spec[-1]


@pytest.mark.fast
def test_speculative_sampling_solo_terminates_and_counts(tiny_lm):
    """temperature>0 B==1 speculation (point-mass rejection scheme)
    produces exactly max_new in-range tokens through stream_generate
    and generate; unbiasedness of the scheme itself is asserted
    statistically in tests/test_engine.py."""
    model, params, cfg = tiny_lm
    prompt = np.array([[4, 8, 15, 4, 8, 15, 4, 8]], np.int32)
    got = []
    for chunk in stream_generate(model, params, prompt, None,
                                 max_new_tokens=9, temperature=0.8,
                                 top_p=0.9, speculative=3,
                                 rng=jax.random.PRNGKey(3)):
        got.extend(chunk[0].tolist())
    assert len(got) == 9
    assert all(0 <= t < cfg.decoder.vocab_size for t in got)

    toks, _ = generate(model, params, prompt, None, max_new_tokens=9,
                       temperature=0.8, top_p=0.9, speculative=3,
                       rng=jax.random.PRNGKey(5))
    assert toks.shape == (1, 9)


def test_bucket_padding_exact_and_reuses_programs(tiny_lm):
    """Prompt bucket-padding (serving default) is token-exact vs the
    unpadded path, and ragged prompt lengths within one bucket share
    ONE (prefill, decode) program pair instead of compiling per
    length."""
    from competesmoe_tpu.models.llava import _GEN_FN_CACHE

    model, params, cfg = tiny_lm
    before = {k for k in _GEN_FN_CACHE if k[0] is model}
    outs = {}
    for L in (5, 9, 13, 21):   # all in the 32-bucket
        prompt = np.arange(2, 2 + L, dtype=np.int32)[None] % 60
        padded, _ = generate(model, params, prompt, None,
                             max_new_tokens=6, temperature=0.0,
                             scan_decode=False)
        plain, _ = generate(model, params, prompt, None,
                            max_new_tokens=6, temperature=0.0,
                            scan_decode=False, pad_to_bucket=False)
        np.testing.assert_array_equal(padded[0], plain[0])
        outs[L] = padded
    after = {k for k in _GEN_FN_CACHE if k[0] is model}
    # every padded run shares one (model, 128) entry; the unpadded runs
    # contribute one entry per distinct L+6
    # at most ONE shared bucketed program pair was added by the four
    # ragged lengths (zero when an earlier test already built it)
    new_padded = {k for k in after - before if k[1] % 128 == 0}
    assert len(new_padded) <= 1, sorted(after - before)


def test_speculative_ignored_for_batch(tiny_lm):
    """speculative falls back silently for B>1 (temperature>0 B==1 DOES
    speculate now, via the rejection scheme — see the sampled tests)."""
    model, params, cfg = tiny_lm
    prompt = np.array([[4, 8, 15, 4, 8, 15, 4, 8],
                       [5, 9, 16, 5, 9, 16, 5, 9]], np.int32)
    chunks = list(stream_generate(model, params, prompt, None,
                                  max_new_tokens=4, temperature=0.0,
                                  speculative=3))
    assert sum(c.shape[1] for c in chunks) == 4
    assert all(c.shape[0] == 2 for c in chunks)
