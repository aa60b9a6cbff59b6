"""Decode-throughput benchmark for the CompeteSMoE-5.1B decoder
(Phi-3.5-mini geometry) on one TPU chip.

Measures steady-state tokens/sec with the production scan-decode path:
random bf16 weights (throughput is weight-bandwidth-bound; values don't
matter), a 128-token prefill into a 512-slot KV cache, then greedy decode
timed as (t(scan 33) - t(scan 1)) / 32 to cancel dispatch latency.

Run: PYTHONPATH=. python tools/bench_decode.py [n_layers] [batch]
Expected on v5e-1 (measured 2026-08-16): ~13.9 ms/step at batch 8 ->
~578 tok/s/chip for the full 32-layer 3.8B decoder (kv 512).
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from competesmoe_tpu.models.decoder import (
    DecoderLM,
    KVCache,
    phi35_mini_config,
)

PREFILL, MAXLEN = 128, 512


def random_bf16_params(model, rng_seed=0):
    import ml_dtypes
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 8), jnp.int32)),
        jax.random.PRNGKey(rng_seed))
    rng = np.random.default_rng(rng_seed)

    def mk(leaf):
        a = rng.standard_normal(leaf.shape, np.float32) * 0.02
        return jax.device_put(a.astype(ml_dtypes.bfloat16))

    return jax.tree_util.tree_map(mk, shapes)


def main():
    n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = dataclasses.replace(phi35_mini_config(),
                              num_hidden_layers=n_layers)
    model = DecoderLM(cfg)

    t0 = time.time()
    params = random_bf16_params(model)
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params={nparams / 1e9:.2f}B built in {time.time() - t0:.0f}s",
          file=sys.stderr)

    cache = KVCache.create(cfg, batch, MAXLEN)
    ids = jnp.ones((batch, PREFILL), jnp.int32)

    @jax.jit
    def prefill(params, ids, cache):
        logits, cache, _ = model.apply(params, ids, cache=cache)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    def make_decode(n):
        @jax.jit
        def dec(params, tok, cache):
            def step(carry, _):
                tok, cache = carry
                logits, cache, _ = model.apply(params, tok[:, None],
                                               cache=cache)
                nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
                return (nxt, cache), nxt
            (_, cache), toks = jax.lax.scan(step, (tok, cache), None,
                                            length=n)
            return toks.sum()
        return dec

    tok, cache = prefill(params, ids, cache)
    jax.block_until_ready(tok)
    d1, d33 = make_decode(1), make_decode(33)
    float(d1(params, tok, cache))
    float(d33(params, tok, cache))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(d1(params, tok, cache))
    t1 = time.perf_counter()
    for _ in range(reps):
        float(d33(params, tok, cache))
    t2 = time.perf_counter()
    per_tok = ((t2 - t1) - (t1 - t0)) / reps / 32
    print(json.dumps({
        "metric": "decode_tokens_per_sec_per_chip",
        "value": round(batch / per_tok, 1),
        "unit": "tok/s",
        "detail": {"n_layers": n_layers, "batch": batch,
                   "params_b": round(nparams / 1e9, 2),
                   "ms_per_step": round(per_tok * 1e3, 2),
                   "prefill": PREFILL, "kv_len": MAXLEN,
                   "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
