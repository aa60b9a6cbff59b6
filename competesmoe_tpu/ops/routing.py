"""Top-k routing primitives.

Parity notes (vs. the PyTorch reference, Fsoft-AIC/CompeteSMoE):
- `torch.topk` and `jax.lax.top_k` both return values sorted descending, so
  for distinct scores (the generic case for float routing logits) the
  selected experts match index-for-index. On exact ties torch's order is
  *unspecified* (its CPU kernel is an unstable partial sort) while
  jax.lax.top_k deterministically prefers the lower index — same selected
  value set, deterministic order.
  (ref: moe_model/model/moe/moe.py:113-132, layers/moe/moe.py:373-393)
- The reference always computes the routing softmax in float32
  (`F.softmax(..., dtype=torch.float32)`); we do the same.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def top_k(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Top-k along the last axis. Values sorted descending, ties broken
    toward the lower index (torch.topk-compatible)."""
    return jax.lax.top_k(scores, k)


def softmax_f32(logits: jax.Array) -> jax.Array:
    """Softmax over the last axis computed in float32 (stays float32)."""
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def normalize_weights(weights: jax.Array, dtype=None) -> jax.Array:
    """`w / w.sum(-1, keepdims=True)` — the reference's post-top-k weight
    normalization (moe.py:232). If `dtype` is given the *denominator* is cast
    to it first, mirroring `torch.sum(...).to(x.dtype)`."""
    denom = jnp.sum(weights, axis=-1, keepdims=True)
    if dtype is not None:
        denom = denom.astype(dtype)
    return weights / denom


def topk_softmax(logits: jax.Array, k: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Standard SMoE gating: softmax (f32) then top-k of the probabilities.

    Returns (weights, selected_experts, gate_softmax); weights are the raw
    top-k probabilities (not renormalized).
    ref: moe_model/model/moe/smoe.py:19-38
    """
    gate_softmax = softmax_f32(logits)
    weights, selected = top_k(gate_softmax, k)
    return weights, selected, gate_softmax


def topk_sigmoid(logits: jax.Array, k: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """MoEUT-style sigmoid gating: top-k over sigmoid(logits); the f32
    softmax is still returned for aux losses.
    ref: moe_model/model/moe/smoe_sigmoidgating.py:18-38
    """
    gate_softmax = softmax_f32(logits)
    gate_sigmoid = jax.nn.sigmoid(logits)
    weights, selected = top_k(gate_sigmoid, k)
    return weights, selected, gate_softmax


def topk_logits_softmax_weights(
    logits: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """DeepSeek-V2-style: top-k over raw logits, weights = softmax over the
    k selected logits. ref: layers/moe/deepseekv2.py:150-153"""
    gate_softmax = softmax_f32(logits)
    raw, selected = top_k(logits, k)
    weights = jax.nn.softmax(raw.astype(jnp.float32), axis=-1)
    return weights, selected, gate_softmax


def cosine_logits(x_reduced: jax.Array, expert_embeddings: jax.Array,
                  eps: float = 1e-4) -> jax.Array:
    """XMoE cosine-similarity router logits.

    Normalizes the (low-dim projected) inputs in float32 and takes the inner
    product with the (externally renormed) expert embeddings, returning the
    result cast back to the input dtype.
    ref: moe_model/model/moe/xmoe.py:117-136
    """
    dtype = x_reduced.dtype
    xf = x_reduced.astype(jnp.float32)
    norm = jnp.linalg.norm(xf, axis=-1, keepdims=True)
    xn = xf / jnp.maximum(norm, eps)
    sim = xn @ expert_embeddings.astype(jnp.float32).T
    return sim.astype(dtype)


def make_finite(scores: jax.Array) -> jax.Array:
    """Replace non-finite scores with the row's minimum finite score
    (XMoE NaN guard; ref xmoe.py:138-143).

    The reference reduces over the whole tensor; here the reduction is
    per row (last axis) so one token's NaN can't change another token's
    routing through batch composition — routing stays batch-invariant
    under jit/vmap (the forward is identical whenever inputs are finite,
    which the parity suite asserts)."""
    ok = jnp.isfinite(scores)
    min_ok = jnp.min(jnp.where(ok, scores, jnp.inf), axis=-1,
                     keepdims=True)
    # a fully non-finite row degenerates to 0 (uniform routing)
    min_ok = jnp.where(jnp.isfinite(min_ok), min_ok, 0.0)
    return jnp.where(ok, scores, min_ok)
