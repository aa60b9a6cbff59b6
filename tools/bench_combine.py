"""A/B alternative formulations of the dispatch COMBINE stage on-chip.

The combine (inverse-perm gather + weighted reduce) measures 369 us at the
154M bench shape against a 215 us gather-bandwidth floor (docs/perf.md).
Hypothesis: XLA materializes the gathered [T*k, v] intermediate (67 MB
write + 67 MB re-read) instead of fusing the reduce into the gather.
Variants that avoid the materialization:

  current   o[inv_perm].reshape(T,k,v) -> einsum with weights (baseline)
  kgather   out = sum_j take(o, inv_perm[:,j]) * w[:,j]  — k gathers, each
            [T, v], elementwise-summed: XLA can fuse gathers as operands of
            one loop fusion whose only write is the [T, v] output
  prescale  scale o rows by w_sorted (w gathered by perm, fusable into the
            GEMM epilogue) then sum_j take(o_scaled, inv_perm[:,j]) — same
            fusion shape, moves the multiply off the reduce
  segsum    scale rows then .at[token_ids].add — scatter-add oracle (known
            slow on TPU, here to keep the rejection measured)

Each variant is checked for numerical equality against the baseline on the
same device before timing. Honest-slope methodology (selection varies per
iteration). Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, T, D, E, ES, K = 8, 1024, 512, 64, 128, 8
N_ITERS = 40


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


def make_pipeline(combine):
    """Full grouped FFN with a pluggable combine(o, gs, wk, tokens, k)."""
    from competesmoe_tpu.ops import expert_compute as ec

    def full(z, x, sel, wk, kw, vw):
        gs = ec.sort_by_expert(sel + z, E)
        xs = jnp.take(x, gs.token_ids, axis=0)
        h = jax.lax.ragged_dot(xs, kw, gs.group_sizes,
                               preferred_element_type=xs.dtype)
        h = jax.nn.relu(h)
        o = jax.lax.ragged_dot(h, vw, gs.group_sizes,
                               preferred_element_type=h.dtype)
        return combine(o, gs, wk, x.shape[0], sel.shape[-1])

    return full


def combine_current(o, gs, wk, tokens, k):
    o = jnp.take(o, gs.inv_perm, axis=0).reshape(tokens, k, o.shape[-1])
    return jnp.sum(o * wk[..., None].astype(o.dtype), axis=-2)


def combine_kgather(o, gs, wk, tokens, k):
    inv2 = gs.inv_perm.reshape(tokens, k)
    acc = jnp.take(o, inv2[:, 0], axis=0) * wk[:, 0, None].astype(o.dtype)
    for j in range(1, k):
        acc = acc + jnp.take(o, inv2[:, j], axis=0) \
            * wk[:, j, None].astype(o.dtype)
    return acc


def combine_prescale(o, gs, wk, tokens, k):
    w_sorted = jnp.take(wk.reshape(-1), gs.perm, axis=0).astype(o.dtype)
    o = o * w_sorted[:, None]
    inv2 = gs.inv_perm.reshape(tokens, k)
    acc = jnp.take(o, inv2[:, 0], axis=0)
    for j in range(1, k):
        acc = acc + jnp.take(o, inv2[:, j], axis=0)
    return acc


def combine_segsum(o, gs, wk, tokens, k):
    w_sorted = jnp.take(wk.reshape(-1), gs.perm, axis=0).astype(o.dtype)
    o = o * w_sorted[:, None]
    out = jnp.zeros((tokens, o.shape[-1]), o.dtype)
    return out.at[gs.token_ids].add(o)


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    tokens = B * T
    x = jax.random.normal(ks[0], (tokens, D), jnp.bfloat16)
    kw = jax.random.normal(ks[1], (E, D, ES), jnp.bfloat16) * 0.04
    vw = jax.random.normal(ks[2], (E, ES, D), jnp.bfloat16) * 0.01
    logits = jax.nn.softmax(jax.random.normal(ks[3], (tokens, E)))
    wk, sel = jax.lax.top_k(logits, K)
    wk = (wk / wk.sum(-1, keepdims=True)).astype(jnp.bfloat16)
    args = (x, sel, wk, kw, vw)

    variants = {
        "current": combine_current,
        "kgather": combine_kgather,
        "prescale": combine_prescale,
        "segsum": combine_segsum,
    }
    z = jnp.int32(0)
    ref = jax.jit(make_pipeline(combine_current))(z, *args)
    times, errs = {}, {}
    for name, comb in variants.items():
        fn = make_pipeline(comb)
        got = jax.jit(fn)(z, *args)
        errs[name] = float(jnp.max(jnp.abs(
            got.astype(jnp.float32) - ref.astype(jnp.float32))))
        times[name] = round(delta_time(fn, args) * 1e6, 1)
    best = min(times, key=times.get)
    print(json.dumps({
        "metric": "combine_variant_us_full_pipeline",
        "value": times[best], "unit": "us", "best": best,
        "detail": {"times_us": times, "max_abs_err_vs_current": errs,
                   "tokens": tokens, "d_model": D, "n_experts": E,
                   "expert_size": ES, "topk": K,
                   "device": str(jax.devices()[0])}}))


if __name__ == "__main__":
    main()
