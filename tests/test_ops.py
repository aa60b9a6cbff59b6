"""Kernel-level op tests: routing tie-breaks, grouped vs dense parity,
gradient parity of the grouped path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from competesmoe_tpu.ops import expert_compute as ec
from competesmoe_tpu.ops import losses as L
from competesmoe_tpu.ops import routing as R


def test_topk_on_ties_selects_same_values():
    # torch.topk's tie order is UNSPECIFIED (its CPU partial sort is not
    # stable); jax.lax.top_k is deterministic lowest-index-first. For tied
    # inputs only the selected *values* are comparable.
    rng = np.random.default_rng(0)
    x = rng.integers(0, 4, size=(64, 8)).astype(np.float32)  # many ties
    tv, _ = torch.topk(torch.from_numpy(x), 3)
    jv, ji = R.top_k(jnp.asarray(x), 3)
    np.testing.assert_array_equal(np.asarray(jv), tv.numpy())
    # jax indices are deterministic: strictly increasing within equal values
    jv_np, ji_np = np.asarray(jv), np.asarray(ji)
    for r in range(x.shape[0]):
        for a in range(2):
            if jv_np[r, a] == jv_np[r, a + 1]:
                assert ji_np[r, a] < ji_np[r, a + 1]


def test_topk_matches_torch_random():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(128, 16)).astype(np.float32)
    tv, ti = torch.topk(torch.from_numpy(x), 5)
    jv, ji = R.top_k(jnp.asarray(x), 5)
    np.testing.assert_allclose(np.asarray(jv), tv.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ji), ti.numpy())


def test_sort_by_expert():
    sel = jnp.array([[2, 0], [1, 1], [0, 2]])
    gs = ec.sort_by_expert(sel, 4)
    np.testing.assert_array_equal(np.asarray(gs.group_sizes), [2, 2, 2, 0])
    assert np.all(np.diff(np.asarray(gs.sel_sorted)) >= 0)
    # token_ids map each sorted slot back to its source row
    sel_flat = np.asarray(sel).reshape(-1)
    np.testing.assert_array_equal(
        sel_flat[np.asarray(gs.perm)], np.asarray(gs.sel_sorted))


@pytest.mark.parametrize("T,E,k,d,h", [(37, 8, 2, 16, 32), (64, 4, 2, 8, 8),
                                       (50, 16, 4, 24, 12)])
def test_grouped_matches_dense_kv(T, E, k, d, h):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (T, d), jnp.float32)
    keys = jax.random.normal(ks[1], (E, d, h), jnp.float32) * 0.1
    values = jax.random.normal(ks[2], (E, h, d), jnp.float32) * 0.1
    sel = jax.random.randint(ks[3], (T, k), 0, E)
    w = jax.nn.softmax(jax.random.normal(ks[4], (T, k)))

    dense = ec.combine_topk(
        ec.dense_all_experts_kv(x, keys, values, jax.nn.relu), sel, w)
    grouped = ec.grouped_ffn_kv(x, sel, w, keys, values, jax.nn.relu)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(grouped),
                               rtol=1e-5, atol=1e-5)


def test_grouped_matches_dense_mlp2():
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 7)
    T, E, k, d, o = 41, 6, 3, 12, 20
    x = jax.random.normal(ks[0], (T, d))
    w1 = jax.random.normal(ks[1], (E, d, o)) * 0.2
    b1 = jax.random.normal(ks[2], (E, o)) * 0.1
    w2 = jax.random.normal(ks[3], (E, o, o)) * 0.2
    b2 = jax.random.normal(ks[4], (E, o)) * 0.1
    sel = jax.random.randint(ks[5], (T, k), 0, E)
    w = jax.nn.softmax(jax.random.normal(ks[6], (T, k)))

    dense = ec.combine_topk(
        ec.dense_all_experts_mlp2(x, w1, b1, w2, b2), sel, w)
    grouped = ec.grouped_ffn_mlp2(x, sel, w, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(grouped),
                               rtol=1e-5, atol=1e-5)


def test_grouped_grads_match_dense():
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 5)
    T, E, k, d, h = 33, 8, 2, 10, 14
    x = jax.random.normal(ks[0], (T, d))
    keys = jax.random.normal(ks[1], (E, d, h)) * 0.3
    values = jax.random.normal(ks[2], (E, h, d)) * 0.3
    sel = jax.random.randint(ks[3], (T, k), 0, E)
    w = jax.nn.softmax(jax.random.normal(ks[4], (T, k)))

    def loss_dense(keys, values, x, w):
        out = ec.combine_topk(
            ec.dense_all_experts_kv(x, keys, values, jax.nn.relu), sel, w)
        return jnp.sum(out**2)

    def loss_grouped(keys, values, x, w):
        out = ec.grouped_ffn_kv(x, sel, w, keys, values, jax.nn.relu)
        return jnp.sum(out**2)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(keys, values, x, w)
    gg = jax.grad(loss_grouped, argnums=(0, 1, 2, 3))(keys, values, x, w)
    for a, b in zip(gd, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_losses_match_torch_formulas():
    rng = np.random.default_rng(5)
    B, N, E, k = 2, 13, 4, 2
    logits = rng.normal(size=(B, N, E)).astype(np.float32)
    tl = torch.from_numpy(logits)

    # z-loss
    want = torch.logsumexp(tl, -1).square().mean().item()
    got = float(L.z_loss(jnp.asarray(logits)))
    assert abs(want - got) < 1e-5

    # switch balance loss (top-1 one-hot quirk)
    sm = torch.softmax(tl, dim=-1)
    w, sel = torch.topk(sm, k)
    density_proxy = sm.mean(dim=1)
    one_hot = torch.nn.functional.one_hot(sel.permute(2, 0, 1), E).float()[0]
    density = one_hot.mean(dim=1)
    want = (density_proxy * density).mean().item() * E**2
    got = float(L.switch_balance_loss(jnp.asarray(np.asarray(sm)),
                                      jnp.asarray(np.asarray(sel)), E))
    assert abs(want - got) < 1e-5

    # entropy balance
    lp = torch.log_softmax(tl.float(), -1)
    mean_lp = lp.logsumexp(dim=-2) - np.log(N)
    want = -(-(mean_lp * mean_lp.exp()).sum(-1)).mean().item()
    got = float(L.entropy_balance_loss(jnp.asarray(logits)))
    assert abs(want - got) < 1e-5

    # diversity loss (diagonal masked but counted in mean)
    outs = rng.normal(size=(B, N, k, 8)).astype(np.float32)
    t = torch.from_numpy(outs)
    normalized = torch.nn.functional.normalize(t, p=2, dim=-1)
    simm = torch.einsum("bnkd,bnjd->bnkj", normalized, normalized)
    simm = simm * (1 - torch.eye(k))
    want = simm.mean().item()
    got = float(L.diversity_loss(jnp.asarray(outs)))
    assert abs(want - got) < 1e-5
