"""Stage-level timing of the grouped MoE dispatch pipeline on the chip.

Breaks the 154M-shape `grouped_ffn_kv` (bench.py's headline op) into its
stages with the same honest slope methodology (selection indices vary per
iteration, so nothing is loop-hoistable):

  sort        sort_by_expert (composite-key sort + inv_perm + bounds)
  gather      xs = take(x, token_ids)
  gemm1       ragged_dot(xs, keys)
  gemm2       act + ragged_dot(h, values)
  combine     inverse-perm gather + weighted reduce
  full        the whole pipeline

Prints a JSON dict of per-stage microseconds. Run on the real TPU.
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


def main():
    from competesmoe_tpu.ops import expert_compute as ec

    tokens = B * T
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (tokens, D), jnp.bfloat16)
    keys_w = jax.random.normal(ks[1], (E, D, ES), jnp.bfloat16) * 0.04
    values_w = jax.random.normal(ks[2], (E, ES, D), jnp.bfloat16) * 0.01
    weights = jax.nn.softmax(jax.random.normal(ks[3], (tokens, E)))
    wk, sel = jax.lax.top_k(weights, K)
    wk = (wk / wk.sum(-1, keepdims=True)).astype(jnp.bfloat16)
    args = (x, sel, wk, keys_w, values_w)

    def sort_only(z, x, sel, wk, kw, vw):
        gs = ec.sort_by_expert(sel + z, E)
        return gs.perm + gs.inv_perm + gs.group_sizes.sum()

    def sort_gather(z, x, sel, wk, kw, vw):
        gs = ec.sort_by_expert(sel + z, E)
        xs = jnp.take(x, gs.token_ids, axis=0)
        return xs

    def sort_gather_gemm1(z, x, sel, wk, kw, vw):
        gs = ec.sort_by_expert(sel + z, E)
        xs = jnp.take(x, gs.token_ids, axis=0)
        return jax.lax.ragged_dot(xs, kw, gs.group_sizes,
                                  preferred_element_type=xs.dtype)

    def sort_gather_gemm12(z, x, sel, wk, kw, vw):
        gs = ec.sort_by_expert(sel + z, E)
        xs = jnp.take(x, gs.token_ids, axis=0)
        h = jax.lax.ragged_dot(xs, kw, gs.group_sizes,
                               preferred_element_type=xs.dtype)
        h = jax.nn.relu(h)
        return jax.lax.ragged_dot(h, vw, gs.group_sizes,
                                  preferred_element_type=h.dtype)

    def full(z, x, sel, wk, kw, vw):
        return ec.grouped_ffn_kv(x, sel + z, wk, kw, vw, jax.nn.relu)

    out = {}
    for name, fn in [("sort", sort_only), ("sort+gather", sort_gather),
                     ("sort+gather+gemm1", sort_gather_gemm1),
                     ("sort+gather+gemm1+gemm2", sort_gather_gemm12),
                     ("full", full)]:
        t = delta_time(fn, args)
        out[name] = round(t * 1e6, 1)
    out["combine_delta"] = round(out["full"]
                                 - out["sort+gather+gemm1+gemm2"], 1)
    out["gather_delta"] = round(out["sort+gather"] - out["sort"], 1)
    out["gemm_delta"] = round(out["sort+gather+gemm1+gemm2"]
                              - out["sort+gather"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
