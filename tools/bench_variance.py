#!/usr/bin/env python
"""Characterize the dispatch benchmark's run-to-run band (~±11%).

Rounds 2-4 quoted an 851-1066 µs run-to-run spread for the headline
dispatch number without saying where it comes from (VERDICT r4 weak #6).
Two candidate sources:

  (a) sort-input entropy — different routing draws give different
      expert-load imbalance, changing group sizes the grouped GEMM and
      the gathers see;
  (b) machine noise — tunnel RPC jitter landing inside the slope
      windows, device clock state.

This tool separates them directly: time the identical pipeline
(`bench.py`'s grouped formulation, same slope harness) R times with ONE
fixed routing draw (any spread = noise), then once per each of R
DIFFERENT routing draws (extra spread = input entropy). Prints one JSON
line with both bands.

Usage: python tools/bench_variance.py [--reps 6]
"""
from __future__ import annotations

import argparse
import json
import statistics
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import bench  # the repo-root contract harness: reuse its exact timer


def _setup(seed: int):
    from competesmoe_tpu.ops import expert_compute as ec
    B, T, D, E, ES, K = bench.B, bench.T, bench.D, bench.E, bench.ES, bench.K
    tokens = B * T
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (tokens, D), jnp.bfloat16)
    keys_w = jax.random.normal(ks[1], (E, D, ES), jnp.bfloat16) * 0.04
    values_w = jax.random.normal(ks[2], (E, ES, D), jnp.bfloat16) * 0.01
    weights = jax.nn.softmax(jax.random.normal(ks[3], (tokens, E)))
    wk, sel = jax.lax.top_k(weights, K)
    wk = (wk / wk.sum(-1, keepdims=True)).astype(jnp.bfloat16)

    def grouped(z, x, sel, wk, keys_w, values_w):
        return ec.grouped_ffn_kv(x, sel + z, wk, keys_w, values_w,
                                 jax.nn.relu)

    # expert-load imbalance stat for this draw: max/mean tokens per
    # expert — the thing hypothesis (a) says moves the time
    counts = jnp.bincount(sel.reshape(-1), length=E)
    imbalance = float(counts.max() / counts.mean())
    return grouped, (x, sel, wk, keys_w, values_w), imbalance


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    a = ap.parse_args()

    fixed_fn, fixed_args, imb0 = _setup(0)
    fixed_us = [bench._delta_time(fixed_fn, fixed_args) * 1e6
                for _ in range(a.reps)]

    varied_us, imbs = [], []
    for s in range(1, a.reps + 1):
        fn, args, imb = _setup(s)
        varied_us.append(bench._delta_time(fn, args) * 1e6)
        imbs.append(imb)

    def band(xs):
        m = statistics.median(xs)
        return {"median_us": round(m, 1), "min_us": round(min(xs), 1),
                "max_us": round(max(xs), 1),
                "spread_pct": round(100 * (max(xs) - min(xs)) / m, 1)}

    print(json.dumps({
        "metric": "dispatch_variance_decomposition",
        "reps": a.reps,
        "fixed_seed": band(fixed_us),
        "varied_seed": band(varied_us),
        "fixed_seed_imbalance": round(imb0, 3),
        "varied_seed_imbalance": [round(i, 3) for i in imbs],
        "fixed_us": [round(u, 1) for u in fixed_us],
        "varied_us": [round(u, 1) for u in varied_us],
        "reading": "fixed_seed spread = machine/tunnel noise; "
                   "varied - fixed = routing-draw (sort-input) entropy",
    }), flush=True)


if __name__ == "__main__":
    main()
