"""Expert computation paths: dense (all-experts) and grouped (sorted
ragged GEMM) — the TPU-native role of the reference's CVMM Triton kernel
(ref: moe_pretrain_model/layers/cvmm.py).

Design
------
The CVMM kernel's structure is: sort token-slots by expert id, run one GEMM
per expert over its contiguous slice, then weighted-scatter the results back
to token order. On TPU we express exactly that as:

  1. `sort_by_expert` — composite-key sort of the flattened selection (the
     analog of `cvmm_prepare_sel2`), producing a permutation, per-expert
     group sizes, and token ids (all static shapes, jit-friendly);
  2. `jax.lax.ragged_dot` — XLA's grouped GEMM over the expert-sorted rows.
     A hand-written Pallas grouped-GEMM was benchmarked on the chip and
     RETIRED: 343 µs vs ragged_dot's 276 µs for the double GEMM at the
     154M shape (65k slots, E=64, d=512, es=128, bf16, v5e, 2026-08-16) —
     XLA's kernel pipelines the ragged groups better, and its
     compiler-generated gradients are already deterministic on TPU;
  3. an inverse-permutation gather + weighted reduce that folds in the
     top-k combine weights (the analog of CVMM's fused `reduction_weight`).

For small expert counts (the multimodal tree: 4 experts, top-2) computing
ALL experts densely on the MXU and gathering the top-k is faster than any
dispatch, so dense paths are provided and selected automatically.

Everything here is shape-static and differentiable (ragged_dot has
JVP/transpose rules; the scatter-add is a standard XLA op), replacing the
reference's custom autograd.Function + atomic-add backward
(cvmm.py:460-551) with deterministic compiler-generated gradients.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

Activation = Callable[[jax.Array], jax.Array]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GroupedSel:
    """Sorted dispatch metadata (the analog of the reference's CVMMSel,
    cvmm.py:431-457). All arrays have static shapes.

    perm:        [T*k] slot permutation such that sel.ravel()[perm] is sorted
    token_ids:   [T*k] source row in x for each sorted slot (= perm // k)
    sel_sorted:  [T*k] expert id of each sorted slot
    group_sizes: [E]   tokens assigned to each expert
    """

    perm: jax.Array
    inv_perm: jax.Array
    token_ids: jax.Array
    sel_sorted: jax.Array
    group_sizes: jax.Array


def sort_by_expert(sel: jax.Array, n_experts: int) -> GroupedSel:
    """Build grouped-dispatch metadata from a top-k selection.

    Args:
      sel: [T, k] (or any leading shape + k) integer expert ids.
      n_experts: number of experts E.
    """
    k = sel.shape[-1]
    sel_flat = sel.reshape(-1).astype(jnp.int32)
    n = sel_flat.shape[0]
    if n_experts * n < 2**31:
        # Composite-key sort: one non-stable value sort of sel*n + slot
        # yields perm AND sel_sorted with stable-sort semantics (the slot
        # index tie-breaks toward lower index, matching the reference's
        # `sel.sort(stable=True)` in cvmm_prepare_sel2). 12x faster on TPU
        # than stable argsort + bincount + scatter (1.42 ms -> 0.11 ms at
        # 65k slots, v5e): bincount/scatter lower to serialized
        # scatter-adds while sort/searchsorted are vectorized.
        comp = sel_flat * n + jnp.arange(n, dtype=jnp.int32)
        comp_sorted = jnp.sort(comp)
        perm = (comp_sorted % n).astype(jnp.int32)
        sel_sorted = (comp_sorted // n).astype(jnp.int32)
    else:
        perm = jnp.argsort(sel_flat, stable=True).astype(jnp.int32)
        sel_sorted = sel_flat[perm]
    # inv_perm[slot] = rank of slot in sorted order: argsort of a
    # permutation (unique keys, so non-stable is exact) — a gather-free
    # combine index, much cheaper than a scatter on TPU.
    inv_perm = jnp.argsort(perm).astype(jnp.int32)
    bounds = jnp.searchsorted(sel_sorted,
                              jnp.arange(n_experts + 1, dtype=jnp.int32),
                              side="left")
    group_sizes = (bounds[1:] - bounds[:-1]).astype(jnp.int32)
    token_ids = perm // k
    return GroupedSel(perm=perm, inv_perm=inv_perm, token_ids=token_ids,
                      sel_sorted=sel_sorted, group_sizes=group_sizes)


def _ragged_dot(x: jax.Array, w: jax.Array, group_sizes: jax.Array) -> jax.Array:
    """Grouped GEMM: x [M, d] against per-group w [E, d, out] where the first
    group_sizes[0] rows use w[0], etc. Output in x.dtype (the TPU MXU
    accumulates in f32 internally; keeping the output in bf16 halves the HBM
    traffic of the intermediate)."""
    return jax.lax.ragged_dot(x, w, group_sizes,
                              preferred_element_type=x.dtype)


def combine_topk(expert_outputs: jax.Array, sel: jax.Array,
                 weights: jax.Array) -> jax.Array:
    """Weighted combine of per-expert outputs.

    expert_outputs: [T, E, v]; sel: [T, k]; weights: [T, k] → [T, v]
    """
    gathered = jnp.take_along_axis(expert_outputs, sel[..., None], axis=-2)
    return jnp.sum(gathered * weights[..., None].astype(expert_outputs.dtype),
                   axis=-2)


def gather_topk_outputs(expert_outputs: jax.Array, sel: jax.Array) -> jax.Array:
    """[T, E, v], [T, k] → [T, k, v] (the reference's torch.gather over the
    expert dim, competesmoe.py:256-258)."""
    return jnp.take_along_axis(expert_outputs, sel[..., None], axis=-2)


# ---------------------------------------------------------------------------
# Dense all-expert paths (small E / competition policy)
# ---------------------------------------------------------------------------

def dense_all_experts_kv(x: jax.Array, keys: jax.Array, values: jax.Array,
                         activation: Activation,
                         b1: Optional[jax.Array] = None) -> jax.Array:
    """Run ALL experts on every token with MoEUT-style keys/values.

    x: [T, d]; keys: [E, d, e]; values: [E, e, v] → [T, E, v]
    (the TPU form of competition_policy_mlp_faster's two batched matmuls,
    layers/moe/competesmoe.py:381-414)
    """
    h = jnp.einsum("td,edh->teh", x, keys,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if b1 is not None:
        h = h + b1[None, :, :].astype(h.dtype)
    h = activation(h)
    out = jnp.einsum("teh,ehv->tev", h, values,
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def dense_all_experts_mlp2(x: jax.Array, w1: jax.Array, b1: jax.Array,
                           w2: jax.Array, b2: jax.Array,
                           activation: Activation = jax.nn.gelu) -> jax.Array:
    """Run ALL experts on every token with 2-layer Linear/GELU/Linear experts
    (the multimodal tree's nn.Sequential experts, moe_model/model/moe/moe.py:34-44).

    x: [T, d]; w1: [E, d, h]; b1: [E, h]; w2: [E, h, v]; b2: [E, v] → [T, E, v]
    """
    h = jnp.einsum("td,edh->teh", x, w1,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + b1[None].astype(h.dtype)
    h = activation(h)
    out = jnp.einsum("teh,ehv->tev", h, w2,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return out + b2[None].astype(out.dtype)


# ---------------------------------------------------------------------------
# Grouped (sparse) paths
# ---------------------------------------------------------------------------

def grouped_ffn_kv(x: jax.Array, sel: jax.Array, weights: jax.Array,
                   keys: jax.Array, values: jax.Array,
                   activation: Activation,
                   b1: Optional[jax.Array] = None,
                   gs: Optional[GroupedSel] = None) -> jax.Array:
    """Sparse MoE FFN with MoEUT-style stacked keys/values.

    x: [T, d]; sel/weights: [T, k]; keys: [E, d, e]; values: [E, e, v].
    Returns [T, v]. Equivalent to the CVMM double-GEMM with fused
    reduction-weight combine (layers/moe/moe.py:397-435).
    """
    T = x.shape[0]
    n_experts = keys.shape[0]
    k = sel.shape[-1]
    if gs is None:
        gs = sort_by_expert(sel, n_experts)
    xs = jnp.take(x, gs.token_ids, axis=0)
    h = _ragged_dot(xs, keys, gs.group_sizes)
    if b1 is not None:
        h = h + jnp.take(b1, gs.sel_sorted, axis=0).astype(h.dtype)
    h = activation(h)
    o = _ragged_dot(h, values, gs.group_sizes)
    # Combine via inverse-permutation gather + per-token reduction — every
    # token owns exactly k sorted slots, so no scatter-add is needed.
    o = jnp.take(o, gs.inv_perm, axis=0).reshape(T, k, o.shape[-1])
    out = jnp.einsum("tkv,tk->tv", o, weights.astype(o.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def grouped_ffn_swiglu(x: jax.Array, sel: jax.Array, weights: jax.Array,
                       w1: jax.Array, w3: jax.Array, w2: jax.Array,
                       gs: Optional[GroupedSel] = None) -> jax.Array:
    """Sparse MoE FFN with Mixtral-style SwiGLU experts — per expert
    `w2 @ (silu(w1 @ x) * (w3 @ x))`, no biases (HF
    MixtralBlockSparseTop2MLP). The reference keeps Mixtral's own experts
    and loops over them with index_add
    (moe_model/model/language_model/smoe_mixtral_helper.py:55-75); this is
    the same math as sorted grouped GEMMs.

    x: [T, d]; sel/weights: [T, k]; w1/w3: [E, d, h]; w2: [E, h, v].
    """
    T = x.shape[0]
    n_experts = w1.shape[0]
    k = sel.shape[-1]
    if gs is None:
        gs = sort_by_expert(sel, n_experts)
    xs = jnp.take(x, gs.token_ids, axis=0)
    g = _ragged_dot(xs, w1, gs.group_sizes)
    u = _ragged_dot(xs, w3, gs.group_sizes)
    h = jax.nn.silu(g) * u
    o = _ragged_dot(h, w2, gs.group_sizes)
    o = jnp.take(o, gs.inv_perm, axis=0).reshape(T, k, o.shape[-1])
    out = jnp.einsum("tkv,tk->tv", o, weights.astype(o.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def grouped_ffn_mlp2(x: jax.Array, sel: jax.Array, weights: jax.Array,
                     w1: jax.Array, b1: jax.Array, w2: jax.Array,
                     b2: jax.Array, activation: Activation = jax.nn.gelu,
                     gs: Optional[GroupedSel] = None) -> jax.Array:
    """Sparse MoE FFN with 2-layer Linear/GELU/Linear experts (the multimodal
    tree's loop-over-experts dispatch, moe.py:172-213, as one grouped GEMM)."""
    T = x.shape[0]
    n_experts = w1.shape[0]
    k = sel.shape[-1]
    if gs is None:
        gs = sort_by_expert(sel, n_experts)
    xs = jnp.take(x, gs.token_ids, axis=0)
    h = _ragged_dot(xs, w1, gs.group_sizes)
    h = h + jnp.take(b1, gs.sel_sorted, axis=0).astype(h.dtype)
    h = activation(h)
    o = _ragged_dot(h, w2, gs.group_sizes)
    o = o + jnp.take(b2, gs.sel_sorted, axis=0).astype(o.dtype)
    o = jnp.take(o, gs.inv_perm, axis=0).reshape(T, k, o.shape[-1])
    out = jnp.einsum("tkv,tk->tv", o, weights.astype(o.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Auto-dispatch
# ---------------------------------------------------------------------------

def _ep_mesh(impl: str):
    """The active expert-parallel mesh, if this impl should use it.

    impl='ep' demands it (raises without one); impl='auto' upgrades to the
    explicit all-to-all path whenever `parallel.ep_context` has an active
    mesh with a non-trivial expert axis.
    """
    if impl not in ("auto", "ep"):
        return None
    from ..parallel import ep_context
    mesh = ep_context.current_ep_mesh()
    if impl == "ep" and mesh is None:
        raise ValueError(
            "impl='ep' requires an active expert-parallel mesh; wrap the "
            "jit trace in parallel.ep_context.use_expert_parallel(mesh)")
    return mesh


def moe_ffn_kv(x: jax.Array, sel: jax.Array, weights: jax.Array,
               keys: jax.Array, values: jax.Array, activation: Activation,
               b1: Optional[jax.Array] = None, impl: str = "auto") -> jax.Array:
    """MoE FFN dispatcher (keys/values parameterization).

    impl: 'auto' | 'dense' | 'grouped' | 'ep' | 'fused' (opt-in Pallas
    path, see ops/gmm_fused.py). 'auto' computes all experts
    densely when the overcompute factor E/k <= 2 (MXU-friendly, zero
    dispatch cost), otherwise sorts + grouped-GEMMs; with an active EP mesh
    (parallel.ep_context) it dispatches tokens over the expert axis with
    lax.all_to_all instead.
    """
    mesh = _ep_mesh(impl)
    if mesh is not None:
        from ..parallel import ep_context
        from ..parallel.expert_parallel import make_ep_ffn_kv
        data_axis, expert_axis = ep_context.ep_axes()
        fn = make_ep_ffn_kv(mesh, activation, data_axis=data_axis,
                            expert_axis=expert_axis,
                            with_bias=b1 is not None)
        args = (x, sel, weights, keys, values)
        return fn(*args, b1) if b1 is not None else fn(*args)
    n_experts, k = keys.shape[0], sel.shape[-1]
    if impl == "fused":
        # opt-in Pallas aligned-group double-GEMM (ops/gmm_fused.py) —
        # measured slower e2e at the 154M bench shape (gather-bound, see
        # the module docstring) but wins when GEMM time dominates
        from .gmm_fused import fused_grouped_ffn_kv, fused_path_available
        if b1 is None and fused_path_available(x, keys, activation):
            return fused_grouped_ffn_kv(x, sel, weights, keys, values)
        impl = "grouped"
    if impl in ("auto", "ep"):
        impl = "dense" if n_experts <= 2 * k else "grouped"
    if impl == "dense":
        outs = dense_all_experts_kv(x, keys, values, activation, b1=b1)
        return combine_topk(outs, sel, weights)
    return grouped_ffn_kv(x, sel, weights, keys, values, activation, b1=b1)


def moe_ffn_swiglu(x: jax.Array, sel: jax.Array, weights: jax.Array,
                   w1: jax.Array, w3: jax.Array, w2: jax.Array,
                   impl: str = "auto") -> jax.Array:
    """MoE FFN dispatcher (Mixtral SwiGLU expert parameterization):
    grouped GEMMs single-device, explicit all-to-all under an active
    expert-parallel mesh."""
    mesh = _ep_mesh(impl)
    if mesh is not None:
        from ..parallel import ep_context
        from ..parallel.expert_parallel import make_ep_ffn_swiglu
        data_axis, expert_axis = ep_context.ep_axes()
        fn = make_ep_ffn_swiglu(mesh, data_axis=data_axis,
                                expert_axis=expert_axis)
        return fn(x, sel, weights, w1, w3, w2)
    return grouped_ffn_swiglu(x, sel, weights, w1, w3, w2)


def moe_ffn_mlp2(x: jax.Array, sel: jax.Array, weights: jax.Array,
                 w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
                 activation: Activation = jax.nn.gelu,
                 impl: str = "auto") -> jax.Array:
    """MoE FFN dispatcher (2-layer GELU expert parameterization)."""
    mesh = _ep_mesh(impl)
    if mesh is not None:
        from ..parallel import ep_context
        from ..parallel.expert_parallel import make_ep_ffn_mlp2
        data_axis, expert_axis = ep_context.ep_axes()
        fn = make_ep_ffn_mlp2(mesh, activation, data_axis=data_axis,
                              expert_axis=expert_axis)
        return fn(x, sel, weights, w1, b1, w2, b2)
    n_experts, k = w1.shape[0], sel.shape[-1]
    if impl in ("auto", "ep"):
        impl = "dense" if n_experts <= 2 * k else "grouped"
    if impl == "dense":
        outs = dense_all_experts_mlp2(x, w1, b1, w2, b2, activation)
        return combine_topk(outs, sel, weights)
    return grouped_ffn_mlp2(x, sel, weights, w1, b1, w2, b2, activation)


# ---------------------------------------------------------------------------
# Competition (all-expert) steps — replicated and expert-parallel layouts
# ---------------------------------------------------------------------------

def competition_all_experts_kv(x: jax.Array, keys: jax.Array,
                               values: jax.Array, activation: Activation,
                               topk: int, b1: Optional[jax.Array] = None,
                               impl: str = "auto"):
    """CompeteSMoE competition step, keys/values experts.

    x: [T, d] -> (affinity [T, E], topk_outputs [T, k, v], sel [T, k]).
    affinity = mean(softplus(expert_out)) per expert
    (competesmoe.py:237-242); sel = top-k of the raw affinity (identical
    indices for any monotone transform of the scores, e.g. sigmoid).
    With an active EP mesh the all-expert pass runs sharded: each expert
    shard computes its E/n_ep experts, only affinities are all-gathered,
    and the selected outputs return via one psum.
    """
    mesh = _ep_mesh(impl)
    if mesh is not None:
        from ..parallel import ep_context
        from ..parallel.expert_parallel import make_ep_all_experts_kv
        data_axis, expert_axis = ep_context.ep_axes()
        fn = make_ep_all_experts_kv(mesh, activation, topk,
                                    data_axis=data_axis,
                                    expert_axis=expert_axis,
                                    with_bias=b1 is not None)
        args = (x, keys, values)
        return fn(*args, b1) if b1 is not None else fn(*args)
    outs = dense_all_experts_kv(x, keys, values, activation, b1=b1)
    affinity = jnp.mean(jax.nn.softplus(outs), axis=-1)
    _, sel = jax.lax.top_k(affinity, topk)
    return affinity, gather_topk_outputs(outs, sel), sel


def competition_all_experts_mlp2(x: jax.Array, w1: jax.Array, b1: jax.Array,
                                 w2: jax.Array, b2: jax.Array,
                                 activation: Activation, topk: int,
                                 impl: str = "auto"):
    """Competition step for 2-layer Linear/act/Linear experts; see
    competition_all_experts_kv."""
    mesh = _ep_mesh(impl)
    if mesh is not None:
        from ..parallel import ep_context
        from ..parallel.expert_parallel import make_ep_all_experts_mlp2
        data_axis, expert_axis = ep_context.ep_axes()
        fn = make_ep_all_experts_mlp2(mesh, activation, topk,
                                      data_axis=data_axis,
                                      expert_axis=expert_axis)
        return fn(x, w1, b1, w2, b2)
    outs = dense_all_experts_mlp2(x, w1, b1, w2, b2, activation)
    affinity = jnp.mean(jax.nn.softplus(outs), axis=-1)
    _, sel = jax.lax.top_k(affinity, topk)
    return affinity, gather_topk_outputs(outs, sel), sel
