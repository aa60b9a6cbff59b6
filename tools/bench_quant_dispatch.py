"""A/B: int8-quantized dispatch gathers for the MoE pipeline (serving).

The dispatch pipeline is gather-walled (docs/perf.md): of the measured
932 us/layer at the 154M shape, the two gather stages cost 239 (x rows)
+ 369 (inverse-perm combine) us, both at the chip's demonstrated
structured-gather bandwidth. Quantizing the GATHERED rows to int8 with
per-row fp32 scales halves the gather bytes — a serving-only
transformation (weights are already int8 there; adds one quantize pass
per gather, which XLA can fuse into the producer).

Variants measured (honest slope method, same harness as bench.py):
  bf16        — shipped ops.expert_compute.grouped_ffn_kv
  q8_x        — int8 x rows through the dispatch gather only
  q8_combine  — int8 o rows through the inverse-perm gather only
  q8_both     — both gathers int8
plus the max elementwise |delta| of each vs bf16 on one forward (the
quantization cost a serving deployment would pay).

Reference anchor: the CVMM kernel this pipeline replaces
(moe_pretrain_model/layers/cvmm.py:46-168) runs bf16-only; this is
headroom exploration beyond it. Verdict lands in docs/perf.md either way.

CPU smoke: COMPETESMOE_PLATFORM=cpu python tools/bench_quant_dispatch.py --tiny
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

if os.environ.get("COMPETESMOE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["COMPETESMOE_PLATFORM"])

N_ITERS = 60


def delta_time(fn, args, n_iters=N_ITERS, reps=5):
    def make(niter):
        @jax.jit
        def run(*a):
            def body(_, acc):
                z = jnp.int32(jnp.sin(acc) * 0.0)
                out = fn(z, *a)
                return acc + out.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, niter, body, jnp.float32(0))
        return run

    r1, rn = make(1), make(n_iters + 1)
    for _ in range(2):
        float(r1(*args))
        float(rn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(r1(*args))
    t1 = time.perf_counter()
    for _ in range(reps):
        float(rn(*args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / reps / n_iters


def _quant_rows(x):
    """Per-row symmetric int8: returns (int8 rows, f32 scales [T,1])."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                 ).astype(jnp.int8)
    return q, s


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="CPU-smoke shapes")
    a = ap.parse_args(argv)

    from competesmoe_tpu.ops import expert_compute as ec

    if a.tiny:
        B, T, D, E, ES, K = 1, 64, 64, 8, 32, 2
        n_iters, reps = 4, 2
    else:
        B, T, D, E, ES, K = 8, 1024, 512, 64, 128, 8
        n_iters, reps = N_ITERS, 5

    tokens = B * T
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (tokens, D), jnp.bfloat16)
    kw = jax.random.normal(ks[1], (E, D, ES), jnp.bfloat16) * 0.04
    vw = jax.random.normal(ks[2], (E, ES, D), jnp.bfloat16) * 0.01
    weights = jax.nn.softmax(jax.random.normal(ks[3], (tokens, E)))
    wk, sel = jax.lax.top_k(weights, K)
    wk = (wk / wk.sum(-1, keepdims=True)).astype(jnp.bfloat16)
    args = (x, sel, wk, kw, vw)

    def bf16(z, x, sel, wk, kw, vw):
        return ec.grouped_ffn_kv(x, sel + z, wk, kw, vw, jax.nn.relu)

    def _pipeline(z, x, sel, wk, kw, vw, qx: bool, qo: bool):
        T = x.shape[0]
        k = sel.shape[-1]
        gs = ec.sort_by_expert(sel + z, E)
        if qx:
            xq, xscale = _quant_rows(x)
            xs = (jnp.take(xq, gs.token_ids, axis=0).astype(jnp.bfloat16)
                  * jnp.take(xscale, gs.token_ids, axis=0
                             ).astype(jnp.bfloat16))
        else:
            xs = jnp.take(x, gs.token_ids, axis=0)
        h = jax.lax.ragged_dot(xs, kw, gs.group_sizes,
                               preferred_element_type=xs.dtype)
        h = jax.nn.relu(h)
        o = jax.lax.ragged_dot(h, vw, gs.group_sizes,
                               preferred_element_type=h.dtype)
        if qo:
            oq, oscale = _quant_rows(o)
            og = jnp.take(oq, gs.inv_perm, axis=0).reshape(T, k, -1)
            sg = jnp.take(oscale, gs.inv_perm, axis=0).reshape(T, k, 1)
            od = og.astype(jnp.bfloat16) * sg.astype(jnp.bfloat16)
        else:
            od = jnp.take(o, gs.inv_perm, axis=0).reshape(T, k, -1)
        out = jnp.einsum("tkv,tk->tv", od, wk.astype(od.dtype),
                         preferred_element_type=jnp.float32)
        return out.astype(x.dtype)

    variants = {
        "bf16": bf16,
        "q8_x": lambda z, *a: _pipeline(z, *a, qx=True, qo=False),
        "q8_combine": lambda z, *a: _pipeline(z, *a, qx=False, qo=True),
        "q8_both": lambda z, *a: _pipeline(z, *a, qx=True, qo=True),
    }

    # one-forward quantization error vs bf16
    ref_out = jax.jit(lambda *a: bf16(jnp.int32(0), *a))(*args)
    errs = {}
    for name, fn in variants.items():
        if name == "bf16":
            continue
        out = jax.jit(lambda *a, f=fn: f(jnp.int32(0), *a))(*args)
        errs[name] = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref_out.astype(jnp.float32))))

    times = {}
    for name, fn in variants.items():
        times[name] = round(
            delta_time(fn, args, n_iters=n_iters, reps=reps) * 1e6, 1)

    print(json.dumps({
        "metric": "quant_dispatch_ab_us_per_layer",
        "value": times["q8_both"],
        "unit": "us",
        "vs_baseline": round(times["bf16"] / max(times["q8_both"], 1e-9),
                             3),
        "detail": {
            "times_us": times,
            "max_abs_err_vs_bf16": errs,
            "tokens": tokens, "d_model": D, "n_experts": E,
            "expert_size": ES, "topk": K,
            "device": str(jax.devices()[0]),
        }}))


if __name__ == "__main__":
    main()
