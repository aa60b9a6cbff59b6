"""Pallas TPU grouped matrix multiply (GMM) — the hand-tuned kernel filling
the role of the reference's CVMM Triton kernel
(moe_pretrain_model/layers/cvmm.py:46-345).

Structure mirrors CVMM's sort -> per-expert GEMM -> combine design, mapped
to the TPU grid model instead of CUDA blocks:

  * rows of `lhs` are pre-sorted by expert; `group_sizes[g]` rows belong to
    expert g (the caller does the sort — see expert_compute.sort_by_expert);
  * the grid is a sequence of (m-tile, group) visits. A tile fully inside a
    group is visited once; a tile straddling a group boundary is visited
    once per overlapping group, with out-of-group rows masked to zero and
    the partial products accumulated in place (exact: the row sets are
    disjoint, so each accumulation adds zeros to finished rows);
  * per-visit metadata (tile id, group id, row range) is computed with
    plain jnp ops and handed to the kernel via PrefetchScalarGridSpec, so
    BlockSpec index maps can follow the ragged group structure — the TPU
    version of CVMM's `sel_first..sel_last` walk (cvmm.py:60-100);
  * the backward pass uses the same kernel for dx (transposed weights) and
    a per-group outer-product kernel (`tgmm`) for dw, accumulated
    deterministically — replacing CVMM's nondeterministic
    `tl.atomic_add` backward (cvmm.py:171-345).

Weight gradients accumulate in an f32 VMEM scratch regardless of input
dtype.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


# ---------------------------------------------------------------------------
# Visit metadata
# ---------------------------------------------------------------------------

def _make_visit_metadata(group_sizes: jax.Array, m_padded: int, block_m: int,
                         n_groups: int) -> Tuple[jax.Array, jax.Array,
                                                 jax.Array, jax.Array, int]:
    """Per-grid-step (tile, group, row-range) arrays, statically sized.

    Worst case: every group adds one boundary revisit -> num_tiles + E steps.
    Unused steps get an empty row range (mask selects nothing; they re-add
    zeros to the final tile).
    """
    num_tiles = m_padded // block_m
    max_steps = num_tiles + n_groups

    sizes = group_sizes.astype(jnp.int32)
    ends = jnp.cumsum(sizes)
    starts = ends - sizes

    first_tile = starts // block_m
    # Last tile index a group touches; empty groups touch none.
    last_tile = jnp.where(sizes > 0, (ends - 1) // block_m, first_tile - 1)
    steps_per_group = jnp.maximum(last_tile - first_tile + 1, 0)
    step_ends = jnp.cumsum(steps_per_group)
    step_starts = step_ends - steps_per_group
    total_steps = step_ends[-1]

    step_idx = jnp.arange(max_steps, dtype=jnp.int32)
    # group of step s: number of groups whose step range started at or
    # before s (searchsorted on the exclusive ends).
    group_ids = jnp.searchsorted(step_ends, step_idx, side="right")
    group_ids = jnp.minimum(group_ids, n_groups - 1).astype(jnp.int32)
    tile_ids = first_tile[group_ids] + (step_idx - step_starts[group_ids])
    valid = step_idx < total_steps
    # Unused trailing steps join the LAST tile/group with an empty row range:
    # they extend the final accumulation chain by adding zeros, and never
    # start a fresh chain that could overwrite finished output
    # (the last real tile is always num_tiles-1 because group sizes sum to M
    # and M > m_padded - block_m).
    tile_ids = jnp.where(valid, tile_ids, num_tiles - 1).astype(jnp.int32)
    row_start = jnp.maximum(starts[group_ids], tile_ids * block_m)
    row_end = jnp.minimum(ends[group_ids], (tile_ids + 1) * block_m)
    row_start = jnp.where(valid, row_start, 0).astype(jnp.int32)
    row_end = jnp.where(valid, row_end, 0).astype(jnp.int32)
    group_ids = jnp.where(valid, group_ids, n_groups - 1).astype(jnp.int32)
    return tile_ids, group_ids, row_start, row_end, max_steps


# ---------------------------------------------------------------------------
# Forward kernel: out[M, N] = concat_g( lhs[rows_g] @ rhs[g] )
# ---------------------------------------------------------------------------

def _gmm_kernel(tile_ids, group_ids, row_start, row_end,
                lhs_ref, rhs_ref, out_ref, acc_ref, *, block_m: int):
    s = pl.program_id(0)
    tile = tile_ids[s]
    start = row_start[s]
    end = row_end[s]

    rows = jax.lax.broadcasted_iota(jnp.int32, (block_m, 1), 0) + tile * block_m
    mask = (rows >= start) & (rows < end)

    lhs = jnp.where(mask, lhs_ref[...], jnp.zeros((), lhs_ref.dtype))
    partial = jnp.dot(lhs, rhs_ref[0], preferred_element_type=jnp.float32)

    prev = tile_ids[jnp.maximum(s - 1, 0)]
    is_first = (s == 0) | (tile != prev)
    nxt = tile_ids[jnp.minimum(s + 1, pl.num_programs(0) - 1)]
    is_last = (s == pl.num_programs(0) - 1) | (tile != nxt)

    @pl.when(is_first)
    def _():
        acc_ref[...] = partial

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_ref[...] += partial

    @pl.when(is_last)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _gmm_raw(lhs: jax.Array, rhs: jax.Array, group_sizes: jax.Array,
             block_m: int = 512) -> jax.Array:
    """lhs [M, K] (rows sorted by group), rhs [E, K, N] -> [M, N]."""
    m, k = lhs.shape
    n_groups, rk, n = rhs.shape
    assert rk == k, (rk, k)

    block_m = min(block_m, _round_up(m, 128))
    m_pad = _round_up(m, block_m)
    if m_pad != m:
        lhs = jnp.pad(lhs, ((0, m_pad - m), (0, 0)))

    tile_ids, group_ids, row_start, row_end, max_steps = _make_visit_metadata(
        group_sizes, m_pad, block_m, n_groups)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(max_steps,),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda s, t, g, rs, re: (t[s], 0)),
            pl.BlockSpec((1, k, n), lambda s, t, g, rs, re: (g[s], 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, n),
                               lambda s, t, g, rs, re: (t[s], 0)),
        scratch_shapes=[pltpu.VMEM((block_m, n), jnp.float32)],
    )

    out = pl.pallas_call(
        functools.partial(_gmm_kernel, block_m=block_m),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), lhs.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n, transcendentals=0,
            bytes_accessed=(m * k + n_groups * k * n + m * n)
            * lhs.dtype.itemsize),
    )(tile_ids, group_ids, row_start, row_end, lhs, rhs)
    return out[:m]


# ---------------------------------------------------------------------------
# Weight-gradient kernel: dw[g] = lhs[rows_g].T @ dy[rows_g]
# ---------------------------------------------------------------------------

def _tgmm_kernel(tile_ids, group_ids, row_start, row_end,
                 lhs_ref, dy_ref, out_ref, acc_ref, *, block_m: int):
    s = pl.program_id(0)
    tile = tile_ids[s]
    start = row_start[s]
    end = row_end[s]

    rows = jax.lax.broadcasted_iota(jnp.int32, (block_m, 1), 0) + tile * block_m
    mask = (rows >= start) & (rows < end)

    lhs = jnp.where(mask, lhs_ref[...], jnp.zeros((), lhs_ref.dtype))
    partial = jax.lax.dot_general(
        lhs, dy_ref[...], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [K, N]

    group = group_ids[s]
    prev = group_ids[jnp.maximum(s - 1, 0)]
    is_first = (s == 0) | (group != prev)
    nxt = group_ids[jnp.minimum(s + 1, pl.num_programs(0) - 1)]
    is_last = (s == pl.num_programs(0) - 1) | (group != nxt)

    @pl.when(is_first)
    def _():
        acc_ref[...] = partial

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_ref[...] += partial

    @pl.when(is_last)
    def _():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _tgmm_raw(lhs: jax.Array, dy: jax.Array, group_sizes: jax.Array,
              n_groups: int, block_m: int = 512) -> jax.Array:
    """lhs [M, K], dy [M, N] (both row-sorted by group) -> [E, K, N]."""
    m, k = lhs.shape
    m2, n = dy.shape
    assert m == m2

    block_m = min(block_m, _round_up(m, 128))
    m_pad = _round_up(m, block_m)
    if m_pad != m:
        lhs = jnp.pad(lhs, ((0, m_pad - m), (0, 0)))
        dy = jnp.pad(dy, ((0, m_pad - m), (0, 0)))

    tile_ids, group_ids, row_start, row_end, max_steps = _make_visit_metadata(
        group_sizes, m_pad, block_m, n_groups)

    # Visits are ordered by group (outer) then tile (inner), so revisits of
    # the same out block (one per group) are consecutive — accumulate in
    # scratch, write back on the group's last visit. Empty trailing steps
    # map to group 0 with an empty mask: they re-add zeros.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(max_steps,),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda s, t, g, rs, re: (t[s], 0)),
            pl.BlockSpec((block_m, n), lambda s, t, g, rs, re: (t[s], 0)),
        ],
        out_specs=pl.BlockSpec((1, k, n),
                               lambda s, t, g, rs, re: (g[s], 0, 0)),
        scratch_shapes=[pltpu.VMEM((k, n), jnp.float32)],
    )

    out = pl.pallas_call(
        functools.partial(_tgmm_kernel, block_m=block_m),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups, k, n), lhs.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n, transcendentals=0,
            bytes_accessed=(m * k + m * n + n_groups * k * n)
            * lhs.dtype.itemsize),
    )(tile_ids, group_ids, row_start, row_end, lhs, dy)
    # Blocks of groups with zero rows are never visited (undefined memory);
    # their true gradient is zero.
    return jnp.where((group_sizes > 0)[:, None, None], out,
                     jnp.zeros((), out.dtype))


# ---------------------------------------------------------------------------
# Public API with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gmm(lhs: jax.Array, rhs: jax.Array, group_sizes: jax.Array,
        block_m: int = 512) -> jax.Array:
    """Grouped GEMM with deterministic custom VJP (CVMM equivalent).

    lhs: [M, K] rows sorted by group; rhs: [E, K, N]; group_sizes: [E].
    Returns [M, N] in lhs.dtype (f32 accumulation).
    """
    return _gmm_raw(lhs, rhs, group_sizes, block_m)


def _gmm_fwd(lhs, rhs, group_sizes, block_m):
    return _gmm_raw(lhs, rhs, group_sizes, block_m), (lhs, rhs, group_sizes)


def _gmm_bwd(block_m, res, dy):
    lhs, rhs, group_sizes = res
    # dx = dy @ rhs[g].T — same grouped GEMM with swapped contraction.
    rhs_t = jnp.swapaxes(rhs, 1, 2)
    dlhs = _gmm_raw(dy, rhs_t, group_sizes, block_m)
    # dw[g] = lhs[rows_g].T @ dy[rows_g] — deterministic segment outer
    # product (replaces CVMM's atomic_add backward).
    drhs = _tgmm_raw(lhs, dy, group_sizes, rhs.shape[0], block_m)
    return dlhs.astype(lhs.dtype), drhs.astype(rhs.dtype), None


gmm.defvjp(_gmm_fwd, _gmm_bwd)
