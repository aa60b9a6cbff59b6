"""Fused grouped double-GEMM Pallas kernel for the MoE FFN.

The TPU re-design of the reference CVMM Triton kernel's *fused* form
(moe_pretrain_model/layers/cvmm.py:46-168 walks each M-block's overlapping
expert range; cvmm.py:460-551 fuses the reduction_weight combine). Two
designs were measured on v5e at the 154M bench shape (64 experts, 65,536
slots):

1. tile-major grid + inner dynamic expert loop with manual weight DMAs
   (the direct CVMM translation): 1673 us — the serialized per-expert
   DMA start/wait latency in the inner fori_loop dominates. RETIRED.
2. **aligned-group layout (this file)**: XLA pads each expert's row group
   to a TILE multiple while gathering tokens into sorted order, so every
   tile belongs to exactly ONE expert, known in advance. The kernel is a
   clean pipelined GEMM-act-GEMM-scale with the expert's keys/values
   blocks selected by a scalar-prefetched `tile_expert` index map —
   Pallas double-buffers the weight blocks itself and skips re-fetching
   when consecutive tiles share an expert (the common case: avg group =
   4 tiles).

Why fuse: the unfused ragged_dot pipeline writes + re-reads the [S, ES]
hidden activations through HBM; here `h` lives in VMEM. The kernel alone
measures 96 us standalone / ~280 us inside a fori harness vs 424 us for
XLA's two ragged_dots at the 154M shape (v5e, 2026-08-17).

Measured END-TO-END verdict at the 154M bench shape, honest fori-slope
harness on a quiet chip: ragged_dot pipeline 1046 us, this fused
pipeline 1203 us — the kernel's ~145 us win is erased by (a) the +25%
aligned-layout padding on the x row gather and (b) ~180 us of
pallas-call overhead inside lax.fori_loop. The ragged_dot path therefore
stays the DEFAULT; this path is opt-in (`impl='fused'` in
ops.expert_compute.moe_ffn_kv) and is expected to win at geometries
where GEMM time dominates gather time (larger expert_size / d_model, or
smaller top-k). The pipeline is gather-bound at the bench shape: sort 78
+ x-gather 192 (43% of its HBM floor — XLA gather efficiency) + GEMMs
424 + combine 266 (35%) ~= 960 us (tools/profile_dispatch.py).

Hard-won XLA-on-TPU facts encoded here (each measured, see
_small_lookup/_step_expand docstrings): many-query jnp.searchsorted
lowers to serialized per-query binary search (4.5 ms for 82k queries
into 65 boundaries); many-query scalar jnp.take is ~600 us for the same
count; one-hot compare-and-sum or scatter+cumsum step-expansion do the
same jobs in <10 us; tpu.dynamic_gather exists but is limited to one
vreg along the gather axis, so arbitrary in-kernel row gathers are off
the table.

The backward reuses the XLA ragged_dot formulation via jax.vjp —
deterministic compiler gradients (no atomics, unlike
cvmm_backward_kernel3's tl.atomic_add) at the cost of one forward
recompute (standard remat).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256


def _gmm2_kernel(tile_expert_ref, xs_ref, keys_ref, values_ref, o_ref):
    h = jnp.dot(xs_ref[:], keys_ref[0],
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h, 0.0).astype(xs_ref.dtype)
    o = jnp.dot(h, values_ref[0], preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(o_ref.dtype)


def gmm2_fused_aligned(xs: jax.Array, keys: jax.Array,
                       values: jax.Array, tile_expert: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """relu double-GEMM over group-aligned rows.

    xs:  [S', D] rows laid out so rows [t*TILE, (t+1)*TILE) all belong to
         expert tile_expert[t]. Padding rows compute harmless garbage
         that the combine never reads (it gathers only valid positions).
    keys: [E, D, ES]; values: [E, ES, D]; tile_expert: [S'/TILE] int32
    Returns [S', D] = relu(xs @ keys[e]) @ values[e].

    Pallas pipelines the per-tile blocks itself: consecutive tiles with
    the same expert (avg group = 4 tiles at the 154M shape) skip the
    weight re-fetch because the scalar-prefetched index map returns the
    same block index.
    """
    S, D = xs.shape
    E, _, ES = keys.shape
    assert S % TILE == 0, S
    n_tiles = S // TILE
    if not interpret:
        # CPU (tests, eval) has no Mosaic backend — run interpreted
        interpret = jax.devices()[0].platform == "cpu"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, D), lambda t, te: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, ES), lambda t, te: (te[t], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ES, D), lambda t, te: (te[t], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, D), lambda t, te: (t, 0),
                               memory_space=pltpu.VMEM),
    )
    flops = 2 * S * D * ES * 2
    bytes_accessed = 2 * (2 * S * D + E * D * ES * 2)
    return pl.pallas_call(
        _gmm2_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, D), xs.dtype),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(tile_expert.astype(jnp.int32), xs, keys, values)


def _small_lookup(table, idx, n: int):
    """table[idx] for a small (<=E entries) table and many indices, as a
    one-hot compare-and-sum. NOT jnp.take / jnp.searchsorted: XLA lowers
    many-query scalar gathers and searchsorted to serialized per-query
    code on TPU -- measured ~600 us / 4.5 ms respectively for 82k queries
    into 65 entries vs ~8 us for this form (tools/profile_dispatch r3)."""
    eq = idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]
    return jnp.sum(jnp.where(eq, table[None, :n], 0), axis=1)


def _step_expand(marks, deltas, size: int):
    """value[p] = sum of deltas[i] over marks[i] <= p -- a step function
    over [0, size) built from an E-sized scatter + one cumsum (the cheap
    dual of bucketizing every position)."""
    buf = jnp.zeros((size,), jnp.int32).at[marks].add(
        deltas.astype(jnp.int32), mode="drop")
    return jnp.cumsum(buf)


def _aligned_layout(sel, n_experts: int):
    """Group-aligned dispatch metadata -- every array built with sorts,
    cumsums, rolls and one-hot sums only (no scalar gathers and no
    searchsorted; see _small_lookup for why).

    Returns (gs, tok_padded [S'], tile_expert [S'/TILE], shift [E]):
      S' = TILE-aligned static bound on the padded slot count,
      tok_padded[p] = token row feeding padded slot p (garbage on
                      padding positions -- never read back),
      shift[e] = padded_position - sorted_position for expert e's rows.
    """
    from .expert_compute import sort_by_expert

    S = sel.size
    gs = sort_by_expert(sel, n_experts)
    sizes = gs.group_sizes
    bounds = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(sizes).astype(jnp.int32)])
    aligned = ((sizes + TILE - 1) // TILE) * TILE
    aoff = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(aligned).astype(jnp.int32)])
    # static TILE-multiple upper bound on sum(aligned): per-group
    # alignment adds < TILE per group
    s_pad = ((S + TILE - 1) // TILE) * TILE + n_experts * TILE
    shift = aoff[:n_experts] - bounds[:n_experts]   # [E], non-negative

    # expert id of every padded position: +1 step at each group start
    e_of_p = _step_expand(aoff[1:n_experts],
                          jnp.ones((n_experts - 1,), jnp.int32), s_pad)
    tile_expert = e_of_p.reshape(-1, TILE)[:, 0]

    # tok_padded[p] = token_ids[p - shift[e_of_p[p]]]: within each group
    # the shift is constant, so the gather is a per-group ROLL -- E rolls
    # + selects (vector ops) instead of an 82k scalar gather.
    t_ext = jnp.zeros((s_pad,), jnp.int32).at[:S].set(gs.token_ids)
    tok_padded = jnp.zeros((s_pad,), jnp.int32)
    for e in range(n_experts):
        rolled = jnp.roll(t_ext, shift[e])
        tok_padded = jnp.where(e_of_p == e, rolled, tok_padded)
    return gs, tok_padded, tile_expert, shift


def fused_grouped_ffn_kv_fwd(x, sel, weights, keys, values,
                             interpret: bool = False):
    """Full fused pipeline: aligned gather -> fused kernel -> combine.

    Same contract as ops.expert_compute.grouped_ffn_kv with relu
    activation. Padding rows flow through the kernel as (finite)
    garbage; the combine gathers only valid padded positions.
    """
    T, D = x.shape
    E = keys.shape[0]
    k = sel.shape[-1]
    gs, tok_padded, tile_expert, shift = _aligned_layout(sel, E)
    xs = jnp.take(x, tok_padded, axis=0)
    o = gmm2_fused_aligned(xs, keys, values, tile_expert,
                           interpret=interpret)
    # combine: flat slot j sits at padded position inv_perm[j] +
    # shift[expert of j]; expert of j is sel itself, so the shift lookup
    # is an E-entry one-hot sum -- no scalar gather anywhere.
    shift_of_slot = _small_lookup(shift, sel.reshape(-1).astype(jnp.int32),
                                  E)
    idx = gs.inv_perm + shift_of_slot
    gathered = jnp.take(o, idx, axis=0).reshape(T, k, D)
    return jnp.einsum("tkv,tk->tv", gathered, weights.astype(o.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)


@jax.custom_vjp
def fused_grouped_ffn_kv(x, sel, weights, keys, values):
    return fused_grouped_ffn_kv_fwd(x, sel, weights, keys, values)


def _fwd(x, sel, weights, keys, values):
    return fused_grouped_ffn_kv(x, sel, weights, keys, values), \
        (x, sel, weights, keys, values)


def _bwd(res, g):
    # Deterministic XLA backward through the unfused reference
    # formulation (ragged_dot has exact JVP/transpose rules); one forward
    # recompute, as with remat.
    from .expert_compute import grouped_ffn_kv
    x, sel, weights, keys, values = res
    _, vjp = jax.vjp(
        lambda x_, w_, k_, v_: grouped_ffn_kv(x_, sel, w_, k_, v_,
                                              jax.nn.relu),
        x, weights, keys, values)
    dx, dw, dk, dv = vjp(g)
    return dx, None, dw, dk, dv


fused_grouped_ffn_kv.defvjp(_fwd, _bwd)


def fused_path_available(x, keys, activation) -> bool:
    """The Pallas path runs on TPU for relu experts with MXU-aligned
    geometry (D, ES multiples of 128 keep the tiles on hardware shapes;
    anything else falls back to ragged_dot)."""
    if activation is not jax.nn.relu:
        return False
    try:
        if jax.devices()[0].platform != "tpu" and \
                "TPU" not in str(jax.devices()[0]).upper():
            return False
    except RuntimeError:
        return False
    D = x.shape[-1]
    ES = keys.shape[-1]
    return D % 128 == 0 and ES % 128 == 0
