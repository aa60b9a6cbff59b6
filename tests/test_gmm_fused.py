"""Fused grouped double-GEMM (ops/gmm_fused.py) — interpret-mode parity
with the ragged_dot reference path, forward and backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from competesmoe_tpu.ops import expert_compute as ec
from competesmoe_tpu.ops import gmm_fused


def _case(T=64, D=128, E=8, ES=128, K=2, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (T, D), jnp.float32)
    kw = jax.random.normal(ks[1], (E, D, ES), jnp.float32) * 0.04
    vw = jax.random.normal(ks[2], (E, ES, D), jnp.float32) * 0.01
    wei = jax.nn.softmax(jax.random.normal(ks[3], (T, E)))
    wk, sel = jax.lax.top_k(wei, K)
    wk = wk / wk.sum(-1, keepdims=True)
    return x, sel, wk, kw, vw


def test_fused_forward_matches_reference():
    x, sel, wk, kw, vw = _case()
    ref = ec.grouped_ffn_kv(x, sel, wk, kw, vw, jax.nn.relu)
    got = gmm_fused.fused_grouped_ffn_kv_fwd(x, sel, wk, kw, vw,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_forward_skewed_groups():
    """Extremely unbalanced selection (most tokens on one expert) — the
    aligned layout's padding/rolls must stay correct."""
    x, _, wk, kw, vw = _case()
    sel = jnp.zeros((64, 2), jnp.int32).at[:, 1].set(7)
    sel = sel.at[:3, 0].set(3)
    ref = ec.grouped_ffn_kv(x, sel, wk, kw, vw, jax.nn.relu)
    got = gmm_fused.fused_grouped_ffn_kv_fwd(x, sel, wk, kw, vw,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_backward_matches_reference():
    """custom_vjp backward (XLA ragged_dot recompute) == grads of the
    reference path (forward auto-interprets on CPU)."""
    x, sel, wk, kw, vw = _case()

    def loss_ref(x, wk, kw, vw):
        o = ec.grouped_ffn_kv(x, sel, wk, kw, vw, jax.nn.relu)
        return (o.astype(jnp.float32) ** 2).sum()

    def loss_fused(x, wk, kw, vw):
        o = gmm_fused.fused_grouped_ffn_kv(x, sel, wk, kw, vw)
        return (o.astype(jnp.float32) ** 2).sum()

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, wk, kw, vw)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, wk, kw, vw)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)
