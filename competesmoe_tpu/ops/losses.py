"""Auxiliary losses for MoE routing.

Each function mirrors a loss in the reference (file:line cited per function)
but is written as a pure JAX function of explicit inputs. Under `jit` over a
device mesh these operate on the *global* batch, so the reference's explicit
differentiable all-reduces (framework/utils/distributed_ops.py) are not
needed — the compiler inserts the collectives.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def z_loss(gate_logits: jax.Array) -> jax.Array:
    """Router z-loss: mean(logsumexp(logits, -1)^2).
    ref: moe_model/model/moe/moe.py:71-88"""
    z = jax.nn.logsumexp(gate_logits.astype(jnp.float32), axis=-1)
    return jnp.mean(jnp.square(z))


def switch_balance_loss(gate_softmax: jax.Array, selected_experts: jax.Array,
                        n_experts: int) -> jax.Array:
    """Switch-style balance loss over the *top-1* selection.

    density_proxy = mean over tokens of gate_softmax;
    density       = mean over tokens of one_hot(top-1 expert);
    loss = mean(density_proxy * density) * E^2.

    Note the reference's `one_hot(rearrange(sel, '... k -> k ...'))[0]` keeps
    only the FIRST selected expert — replicated here on purpose.
    ref: moe_model/model/moe/moe.py:90-110
    """
    gate_softmax = gate_softmax.astype(jnp.float32)
    density_proxy = jnp.mean(gate_softmax, axis=-2)  # [..., E]
    top1 = selected_experts[..., 0]
    one_hot = jax.nn.one_hot(top1, n_experts, dtype=jnp.float32)
    density = jnp.mean(one_hot, axis=-2)  # [..., E]
    return jnp.mean(density_proxy * density) * float(n_experts**2)


def entropy_from_logprobs(logp: jax.Array) -> jax.Array:
    """entropy_l: -(l * exp(l)).sum(-1).
    ref: framework/utils/entropy.py:21-22"""
    return -jnp.sum(logp * jnp.exp(logp), axis=-1)


def entropy(probs: jax.Array, eps: Optional[float] = None) -> jax.Array:
    """-(p * log(max(p, eps))).sum(-1). ref: framework/utils/entropy.py:5-6"""
    if eps is None:
        eps = float(jnp.finfo(probs.dtype).eps)
    return -jnp.sum(jnp.log(jnp.clip(probs, eps)) * probs, axis=-1)


def log_mean(x: jax.Array, axis: int = 0) -> jax.Array:
    """log(mean(exp(x))) along `axis` in float32.
    ref: framework/utils/distributed_ops.py:48-58 (single-process branch;
    the distributed branch is subsumed by global-batch jit semantics)."""
    x = x.astype(jnp.float32)
    return jax.nn.logsumexp(x, axis=axis) - math.log(x.shape[axis])


def entropy_balance_loss(gate_logits: jax.Array) -> jax.Array:
    """MoEUT entropy balance: maximize the entropy of the token-averaged
    routing distribution.

    gate_logits: [..., T, E] — flattened token dims in -2 (the reference does
    `sel.flatten(1, -2)` then log-mean over tokens). Returns
    `-mean(entropy(softmax-averaged distribution))`.
    ref: moe_pretrain_model/layers/moe/moe.py:323-332
    """
    logp = jax.nn.log_softmax(gate_logits.astype(jnp.float32), axis=-1)
    mean_logp = log_mean(logp, axis=-2)  # [..., E]
    return -jnp.mean(entropy_from_logprobs(mean_logp))


def diversity_loss(topk_expert_outputs: jax.Array) -> jax.Array:
    """Mean pairwise cosine similarity between the top-k experts' outputs,
    diagonal removed but *included in the mean's denominator* (the reference
    masks the diagonal to zero and then takes `.mean()` over all K*K entries).
    topk_expert_outputs: [..., K, D].
    ref: moe_model/model/moe/competesmoe.py:180-218
    """
    x = topk_expert_outputs.astype(jnp.float32)
    k = x.shape[-2]
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    xn = x / jnp.maximum(norm, 1e-12)
    sim = jnp.einsum("...kd,...jd->...kj", xn, xn)
    sim = sim * (1.0 - jnp.eye(k, dtype=sim.dtype))
    return jnp.mean(sim)


def router_mse_loss(gate_softmax: jax.Array, affinity_softmax: jax.Array) -> jax.Array:
    """Router-distillation MSE between gate and (detached) affinity softmax.
    The caller is responsible for stop_gradient on the affinity side.
    ref: moe_model/model/moe/competesmoe.py:322-335"""
    a = gate_softmax.astype(jnp.float32)
    b = affinity_softmax.astype(jnp.float32)
    return jnp.mean(jnp.square(a - b))


def topk_agreement(sel_router: jax.Array, sel_affinity: jax.Array) -> jax.Array:
    """Mean per-token overlap |router top-k ∩ affinity top-k| / k.

    The CompeteSMoE distillation-health metric: the router loss distills
    the affinity distribution into the gate
    (moe_model/model/moe/competesmoe.py:322-335), so if distillation is
    working, the router's own top-k should increasingly match the
    competition outcome on flip steps. The reference logs router-loss
    magnitudes but never this agreement; emitted here on every flip step
    (telemetry only, stop-gradient at the call site).

    sel_*: [..., K] int expert indices. Returns a scalar in [0, 1].
    """
    m = (sel_router[..., :, None] == sel_affinity[..., None, :]).any(axis=-1)
    return jnp.mean(m.astype(jnp.float32))


def relative_perplexity(probs: jax.Array) -> jax.Array:
    """exp(entropy(p)) / E. ref: framework/utils/entropy.py:13-18"""
    return jnp.exp(entropy(probs)) / probs.shape[-1]
