"""Explicit expert-parallel MoE dispatch: shard_map + all-to-all.

The reference replicates every expert on every rank and only synchronizes
aux losses (SURVEY.md §2h). This module provides the TPU-native upgrade
the north star asks for: experts sharded over the mesh `expert` axis and
tokens exchanged with `lax.all_to_all` over ICI.

Dataflow per device (capacity-based, megablocks-style):
  1. route: each local token-slot's expert id maps to (shard, local id)
  2. pack: slots destined to shard s are ranked within s and scattered
     into a [n_ep, CAP, d] send buffer (rank >= CAP drops, `mode=drop`;
     CAP defaults to the lossless worst case T_local*k)
  3. all_to_all over the expert axis (payload + local-expert-id metadata)
  4. local grouped expert FFN over the received slots (E/n_ep experts)
  5. all_to_all back; each slot's output is gathered from [shard, rank]
     and combined with the routing weights.

Competition (all-expert) steps use a different layout: tokens are gathered
to data-row granularity (in_spec P('data')), each expert shard runs its
E/n_ep experts densely on that block, affinities are all-gathered (tiny,
[T, E]) for the global top-k, and only the *selected* outputs are summed
back with one psum — no [T, E, v] all-gather ever materializes. This is
the sharded answer to SURVEY §7's "competition steps are dense" hard part.

Everything is static-shape; the collectives ride ICI. Both MoE layer trees
route through these paths automatically when `parallel.ep_context` has an
active mesh (see ops/expert_compute.py).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import expert_compute as ec
from ..ops import routing as R


def _ep_dispatch(x, sel, weights, compute_local, v_dim, expert_axis,
                 n_experts_global, capacity=None):
    """Generic pack → all_to_all → local compute → all_to_all → combine.

    x: [T_loc, d]; sel/weights: [T_loc, k]; compute_local(flat_x [N, d],
    flat_eid [N]) -> [N, v_dim] runs the shard's local experts.
    """
    T, d = x.shape
    k = sel.shape[-1]
    n_ep = jax.lax.axis_size(expert_axis)
    e_loc = n_experts_global // n_ep
    slots = T * k
    cap = capacity or slots

    sel_flat = sel.reshape(-1).astype(jnp.int32)
    dest = sel_flat // e_loc                       # target shard
    local_eid = sel_flat % e_loc

    # rank of each slot within its destination shard
    order = jnp.argsort(dest, stable=True).astype(jnp.int32)
    sorted_dest = dest[order]
    counts = jnp.bincount(dest, length=n_ep)
    offsets = jnp.cumsum(counts) - counts
    rank_sorted = jnp.arange(slots, dtype=jnp.int32) - \
        offsets[sorted_dest].astype(jnp.int32)
    rank = jnp.zeros((slots,), jnp.int32).at[order].set(
        rank_sorted, unique_indices=True)

    # pack send buffers; over-capacity slots drop
    x_rep = jnp.take(x, jnp.arange(slots) // k, axis=0)
    send_x = jnp.zeros((n_ep, cap, d), x.dtype).at[dest, rank].set(
        x_rep, mode="drop", unique_indices=True)
    send_eid = jnp.zeros((n_ep, cap), jnp.int32).at[dest, rank].set(
        local_eid, mode="drop", unique_indices=True)

    recv_x = jax.lax.all_to_all(send_x, expert_axis, split_axis=0,
                                concat_axis=0, tiled=True)
    recv_eid = jax.lax.all_to_all(send_eid, expert_axis, split_axis=0,
                                  concat_axis=0, tiled=True)

    # local expert compute over all received slots (invalid padding
    # slots run through expert 0; their outputs return to padded
    # buffer positions nobody reads)
    out_local = compute_local(recv_x.reshape(n_ep * cap, d),
                              recv_eid.reshape(-1))

    send_back = out_local.reshape(n_ep, cap, v_dim)
    recv_back = jax.lax.all_to_all(send_back, expert_axis,
                                   split_axis=0, concat_axis=0,
                                   tiled=True)

    # combine: each slot reads its processed value back from
    # [dest shard, rank]; dropped slots contribute zero
    in_cap = rank < cap
    safe_rank = jnp.minimum(rank, cap - 1)
    slot_out = recv_back[dest, safe_rank]
    slot_out = jnp.where(in_cap[:, None], slot_out, 0.0)
    slot_out = slot_out.reshape(T, k, v_dim)
    out = jnp.einsum("tkv,tk->tv", slot_out,
                     weights.astype(slot_out.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def make_ep_ffn_kv(mesh: Mesh, activation: Callable,
                   capacity: Optional[int] = None,
                   data_axis: str = "data", expert_axis: str = "expert",
                   with_bias: bool = False):
    """Build an expert-parallel MoE FFN (MoEUT keys/values experts).

    Returns fn(x [T, d], sel [T, k], weights [T, k], keys [E, d, h],
    values [E, h, v][, b1 [E, h]]) -> [T, v], where x/sel/weights are
    sharded over the whole mesh (token dim) and keys/values/b1 over the
    expert axis.
    """
    token_spec = P((data_axis, expert_axis))
    expert_spec = P(expert_axis)
    n_ep = mesh.shape[expert_axis]
    in_specs = (token_spec, token_spec, token_spec, expert_spec, expert_spec)
    if with_bias:
        in_specs = in_specs + (expert_spec,)

    @partial(shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=token_spec, check_vma=False)
    def ep_ffn(x, sel, weights, keys, values, *rest):
        b1 = rest[0] if rest else None
        ones_dtype = x.dtype

        def compute_local(flat_x, flat_eid):
            ones = jnp.ones((flat_x.shape[0], 1), ones_dtype)
            return ec.grouped_ffn_kv(flat_x, flat_eid[:, None], ones,
                                     keys, values, activation, b1=b1)

        return _ep_dispatch(x, sel, weights, compute_local,
                            values.shape[-1], expert_axis,
                            keys.shape[0] * n_ep, capacity)

    return ep_ffn


def make_ep_ffn_mlp2(mesh: Mesh, activation: Callable,
                     capacity: Optional[int] = None,
                     data_axis: str = "data", expert_axis: str = "expert"):
    """Expert-parallel MoE FFN for the multimodal tree's 2-layer
    Linear/act/Linear experts (moe_model/model/moe/moe.py:34-44).

    Returns fn(x, sel, weights, w1 [E, d, h], b1 [E, h], w2 [E, h, v],
    b2 [E, v]) -> [T, v].
    """
    token_spec = P((data_axis, expert_axis))
    expert_spec = P(expert_axis)
    n_ep = mesh.shape[expert_axis]

    @partial(shard_map, mesh=mesh,
             in_specs=(token_spec, token_spec, token_spec, expert_spec,
                       expert_spec, expert_spec, expert_spec),
             out_specs=token_spec, check_vma=False)
    def ep_ffn(x, sel, weights, w1, b1, w2, b2):
        def compute_local(flat_x, flat_eid):
            ones = jnp.ones((flat_x.shape[0], 1), x.dtype)
            return ec.grouped_ffn_mlp2(flat_x, flat_eid[:, None], ones,
                                       w1, b1, w2, b2, activation)

        return _ep_dispatch(x, sel, weights, compute_local,
                            w2.shape[-1], expert_axis,
                            w1.shape[0] * n_ep, capacity)

    return ep_ffn


def make_ep_ffn_swiglu(mesh: Mesh, capacity: Optional[int] = None,
                       data_axis: str = "data",
                       expert_axis: str = "expert"):
    """Expert-parallel MoE FFN for Mixtral-style SwiGLU experts
    (w2(silu(w1 x) * w3 x), no biases — MixtralMoELayer). The reference
    replicates Mixtral's experts per rank (smoe_mixtral_helper.py); this
    is the sharded upgrade, same all-to-all dataflow as the other trees.

    Returns fn(x, sel, weights, w1 [E, d, h], w3 [E, d, h],
    w2 [E, h, v]) -> [T, v].
    """
    token_spec = P((data_axis, expert_axis))
    expert_spec = P(expert_axis)
    n_ep = mesh.shape[expert_axis]

    @partial(shard_map, mesh=mesh,
             in_specs=(token_spec, token_spec, token_spec, expert_spec,
                       expert_spec, expert_spec),
             out_specs=token_spec, check_vma=False)
    def ep_ffn(x, sel, weights, w1, w3, w2):
        def compute_local(flat_x, flat_eid):
            ones = jnp.ones((flat_x.shape[0], 1), x.dtype)
            return ec.grouped_ffn_swiglu(flat_x, flat_eid[:, None], ones,
                                         w1, w3, w2)

        return _ep_dispatch(x, sel, weights, compute_local,
                            w2.shape[-1], expert_axis,
                            w1.shape[0] * n_ep, capacity)

    return ep_ffn


def _competition_combine(outs_loc, expert_axis, topk):
    """Shared tail of the sharded competition step.

    outs_loc: [T_blk, E_loc, v] this shard's expert outputs on the
    data-row token block. Returns (affinity [T_blk, E], topk_outputs
    [T_blk, k, v], sel [T_blk, k]) — replicated over the expert axis.
    """
    e_loc = outs_loc.shape[1]
    aff_loc = jnp.mean(jax.nn.softplus(outs_loc), axis=-1)
    # [T_blk, E]: tiny (affinities, not activations) — the only gather
    affinity = jax.lax.all_gather(aff_loc, expert_axis, axis=1, tiled=True)
    _, sel = R.top_k(affinity, topk)
    e0 = jax.lax.axis_index(expert_axis) * e_loc
    local_sel = sel - e0
    valid = (local_sel >= 0) & (local_sel < e_loc)
    safe = jnp.clip(local_sel, 0, e_loc - 1)
    tk = jnp.take_along_axis(outs_loc, safe[..., None], axis=-2)
    tk = jnp.where(valid[..., None], tk, jnp.zeros((), tk.dtype))
    # each selected output lives on exactly one shard -> psum is exact
    tk = jax.lax.psum(tk, expert_axis)
    return affinity, tk, sel


def make_ep_all_experts_kv(mesh: Mesh, activation: Callable, topk: int,
                           data_axis: str = "data",
                           expert_axis: str = "expert",
                           with_bias: bool = False):
    """Sharded CompeteSMoE competition step (keys/values experts).

    fn(x [T, d], keys [E, d, h], values [E, h, v][, b1]) ->
    (affinity [T, E], topk_outputs [T, k, v], sel [T, k]).
    Matches the replicated dense path bit-for-bit: local dense compute,
    affinity all-gather, global top-k, psum of the selected outputs.
    """
    in_specs = (P(data_axis), P(expert_axis), P(expert_axis))
    if with_bias:
        in_specs = in_specs + (P(expert_axis),)
    out_specs = (P(data_axis), P(data_axis), P(data_axis))

    @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
             check_vma=False)
    def comp(x, keys, values, *rest):
        b1 = rest[0] if rest else None
        outs = ec.dense_all_experts_kv(x, keys, values, activation, b1=b1)
        return _competition_combine(outs.reshape(x.shape[0], keys.shape[0],
                                                 values.shape[-1]),
                                    expert_axis, topk)

    return comp


def make_ep_all_experts_mlp2(mesh: Mesh, activation: Callable, topk: int,
                             data_axis: str = "data",
                             expert_axis: str = "expert"):
    """Sharded competition step for 2-layer Linear/act/Linear experts."""
    in_specs = (P(data_axis), P(expert_axis), P(expert_axis),
                P(expert_axis), P(expert_axis))
    out_specs = (P(data_axis), P(data_axis), P(data_axis))

    @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
             check_vma=False)
    def comp(x, w1, b1, w2, b2):
        outs = ec.dense_all_experts_mlp2(x, w1, b1, w2, b2, activation)
        return _competition_combine(outs, expert_axis, topk)

    return comp
