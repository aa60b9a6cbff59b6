"""Measure the chip's demonstrated bandwidth for the two access patterns
the MoE dispatch pipeline is made of: random single-row gather and
contiguous stream. Feeds bench.py's pattern-aware speed-of-light floor.

Why this exists
---------------
bench.py's `hbm_sol_us` prices every byte of the grouped-dispatch pipeline
at the v5e's peak sequential HBM bandwidth (819 GB/s). But ~40% of the
pipeline's bytes move through *random single-row gathers* (the xs dispatch
gather and the inverse-permutation combine gather), and no mechanism on
this chip moves scattered 1 KB rows at sequential-stream speed:

- XLA's gather emitter is the fastest row-gather primitive available
  (measured here; ~535 GB/s r+w at the bench shape, 2026-08-17).
- A Pallas kernel CANNOT express a finer-grained or faster gather
  (all attempts measured/failed on-chip 2026-08-17, this session):
    * per-row HBM->VMEM async DMA: Mosaic rejects 1-row slices of a
      tiled HBM memref ("Slice shape along dimension 0 must be aligned
      to tiling (8)") — bf16 HBM buffers are (8,128)-tiled, so a DMA
      cannot address a single 512-wide row;
    * reshaping to (T, 1, D) to make the row index an untiled leading
      dim: bf16 sublane packing still requires 2-row alignment
      ("memref<8192x2x512xbf16, tiled<(2,128)...>");
    * dynamic single-row loads from a VMEM-resident copy of x:
      "vector.load ... offset must be a multiple of 8";
    * in-kernel `jnp.take` vector gather: Mosaic's dynamic_gather does
      not support cross-tile sublane gathers ("Shape mismatch in input,
      indices and output").
- XLA fusion cannot eliminate the gather materializations either: the
  reduce/einsum consumers do not fuse into gather producers on TPU.
  Measured graph-level alternatives at the bench shape (full-pipeline
  µs, same slope harness; baseline 851-1066 across runs): sum-of-k
  separate gathers 1040, weight-fold + gather + sum 1513-1744, i32
  bitcast-packed gather 2467-3403. All strictly worse than the single
  `jnp.take` + einsum formulation.

Two more negative results close the book (measured 2026-08-17):
- raising XLA's scoped-VMEM budget so intermediates could live in VMEM
  (`compiler_options={"xla_tpu_scoped_vmem_limit_kib": ...}`) REGRESSES
  the pipeline: 949 µs default -> 1214 µs @64 MB -> 1803 µs @96 MB (the
  extra VMEM residency starves the gather/GEMM pipelining);
- the gathers are index-locality-bound, not implementation-sloppy: the
  same `jnp.take` over the same arrays runs 2.9x slower with uniformly
  random indices than with the pipeline's sort-structured indices
  (token_ids = 64 ascending runs; inv_perm = k-way interleaved ascending
  scan). The composite-key sort layout is already buying back most of
  the random-access penalty.

So the physically meaningful floor prices gather bytes at the chip's
*demonstrated* structured-gather bandwidth and only contiguous bytes at
stream bandwidth. This script measures those rates with the same honest
slope methodology as bench.py (indices/data vary per iteration; nothing
is loop-hoistable).

Prints one JSON line with *_us and *_gbps per pattern. Run on the TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

T, D, K = 8192, 512, 8       # bench.py's 154M shape
SLOTS = T * K
N_ITERS = 40


def _delta_time(fn, args, n_iters=N_ITERS, reps=5):
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


def measure(verbose: bool = False):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (T, D), jnp.bfloat16)
    idx_rand = jax.random.randint(ks[1], (SLOTS,), 0, T, jnp.int32)
    # 4x VMEM so the stream input cannot be cached on-chip (v5e VMEM is
    # 128 MB; a loop-invariant 64 MB operand measures VMEM, not HBM).
    big = jax.random.normal(ks[2], (SLOTS * 8, D), jnp.bfloat16)

    # The dispatch pipeline's real index patterns, from an actual top-k +
    # sort at the bench shape: token_ids is piecewise-ascending (64 sorted
    # runs, one per expert); inv_perm is a k-way interleaved ascending scan.
    from competesmoe_tpu.ops.expert_compute import sort_by_expert
    logits = jax.random.normal(ks[3], (T, 64))
    _, sel = jax.lax.top_k(logits, K)
    gs = sort_by_expert(sel, 64)
    token_ids, inv_perm = gs.token_ids, gs.inv_perm

    def gather_rand(z, x, idx):
        # z varies per iteration -> indices are never loop-invariant.
        return jnp.take(x, (idx + z) % T, axis=0)

    def gather_static_idx(z, x, idx):
        # structured indices kept exact; x varies instead so the gather
        # re-executes every iteration (plus one 8 MB elementwise pass).
        return jnp.take(x + z.astype(x.dtype), idx, axis=0)

    def gather_static_big(z, o, idx):
        return jnp.take(o + z.astype(o.dtype), idx, axis=0)

    def hbm_read(z, big):
        # the add+sum fuses into the reduction, so this measures a pure
        # 537 MB HBM *read* (no materialized write): the chip's sequential
        # read bandwidth. Measured 921 GB/s on v5e (2026-08-17) — the
        # 819 GB/s datasheet number is conservative on this part.
        return big + z.astype(big.dtype)

    o = jax.random.normal(ks[2], (SLOTS, D), jnp.bfloat16)
    t_rand = _delta_time(gather_rand, (x, idx_rand))
    t_tok = _delta_time(gather_static_idx, (x, token_ids))
    t_inv = _delta_time(gather_static_big, (o, inv_perm))
    t_read = _delta_time(hbm_read, (big,))

    # NOTE on byte accounting: each gather's output is consumed by the
    # harness reduction; XLA does not fuse reduces into gather producers
    # (measured in the pipeline: sum-over-gather variants are *slower*),
    # so r+w accounting is used for gathers and read-only for hbm_read.
    gather_bytes = 2 * (SLOTS * D + SLOTS * D)
    read_bytes = 2 * (SLOTS * 8 * D)
    out = {
        "gather_random_us": round(t_rand * 1e6, 1),
        "gather_random_gbps": round(gather_bytes / t_rand / 1e9, 1),
        "gather_tokenids_us": round(t_tok * 1e6, 1),
        "gather_tokenids_gbps": round(gather_bytes / t_tok / 1e9, 1),
        "gather_invperm_us": round(t_inv * 1e6, 1),
        "gather_invperm_gbps": round(gather_bytes / t_inv / 1e9, 1),
        "hbm_read_us": round(t_read * 1e6, 1),
        "hbm_read_gbps": round(read_bytes / t_read / 1e9, 1),
        "rows": SLOTS, "row_bytes": D * 2,
        "device": str(jax.devices()[0]),
    }
    if verbose:
        print(json.dumps(out))
    return out


if __name__ == "__main__":
    measure(verbose=True)
