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

Everything is static-shape; the two all_to_alls ride ICI. XLA's automatic
sharding (pjit over parallel/mesh.py specs) reaches the same topology for
small expert counts; this explicit path guarantees the communication
pattern at scale.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import expert_compute as ec


def make_ep_ffn_kv(mesh: Mesh, activation: Callable,
                   capacity: Optional[int] = None,
                   data_axis: str = "data", expert_axis: str = "expert"):
    """Build an expert-parallel MoE FFN over `mesh`.

    Returns fn(x [T, d], sel [T, k], weights [T, k], keys [E, d, h],
    values [E, h, v]) -> [T, v], where x/sel/weights are sharded over the
    whole mesh (token dim) and keys/values over the expert axis.
    """
    token_spec = P((data_axis, expert_axis))
    expert_spec = P(expert_axis)

    @partial(shard_map, mesh=mesh,
             in_specs=(token_spec, token_spec, token_spec, expert_spec,
                       expert_spec),
             out_specs=token_spec, check_vma=False)
    def ep_ffn(x, sel, weights, keys, values):
        T, d = x.shape
        k = sel.shape[-1]
        n_ep = jax.lax.axis_size(expert_axis)
        e_loc = keys.shape[0]
        v_dim = values.shape[-1]
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
        flat_x = recv_x.reshape(n_ep * cap, d)
        flat_eid = recv_eid.reshape(-1)
        ones = jnp.ones((n_ep * cap, 1), x.dtype)
        out_local = ec.grouped_ffn_kv(
            flat_x, flat_eid[:, None], ones, keys, values, activation)

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

    return ep_ffn
