"""Pallas grouped-GEMM kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from competesmoe_tpu.ops.gmm_pallas import _make_visit_metadata, gmm


def ref_gmm(lhs, rhs, gs):
    outs, start = [], 0
    for g in range(rhs.shape[0]):
        sz = int(gs[g])
        outs.append(np.asarray(lhs[start:start + sz]) @ np.asarray(rhs[g]))
        start += sz
    return np.concatenate(outs, 0)


def random_group_sizes(m, e, seed=0):
    cuts = np.sort(np.random.default_rng(seed).integers(0, m + 1, size=e - 1))
    return jnp.asarray(np.diff(np.concatenate([[0], cuts, [m]])), jnp.int32)


def test_visit_metadata_covers_all_rows():
    gs = jnp.asarray([100, 0, 60, 92, 0, 120, 80, 60], jnp.int32)
    m = int(gs.sum())
    block_m = 128
    m_pad = ((m + block_m - 1) // block_m) * block_m
    tiles, groups, rs, re, max_steps = jax.tree_util.tree_map(
        np.asarray, _make_visit_metadata(gs, m_pad, block_m, 8))
    covered = np.zeros(m, dtype=int)
    for s in range(len(tiles)):
        covered[rs[s]:re[s]] += 1
    # every row visited exactly once, by its own group
    np.testing.assert_array_equal(covered, 1)
    starts = np.concatenate([[0], np.cumsum(np.asarray(gs))[:-1]])
    for s in range(len(tiles)):
        if re[s] > rs[s]:
            g = groups[s]
            assert rs[s] >= starts[g] and re[s] <= starts[g] + int(gs[g])


@pytest.mark.parametrize("m,k,n,e", [(256, 64, 32, 8), (300, 64, 32, 8),
                                     (128, 128, 128, 4)])
def test_gmm_interpret_matches_reference(m, k, n, e):
    key = jax.random.PRNGKey(0)
    lhs = jax.random.normal(key, (m, k), jnp.float32)
    rhs = jax.random.normal(key, (e, k, n), jnp.float32) * 0.1
    gs = random_group_sizes(m, e)
    with pltpu.force_tpu_interpret_mode():
        out = gmm(lhs, rhs, gs, 128)
    want = ref_gmm(lhs, rhs, np.asarray(gs))
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-5, atol=2e-5)


def test_gmm_grads_match_ragged_dot():
    m, k, n, e = 256, 32, 16, 4
    key = jax.random.PRNGKey(1)
    lhs = jax.random.normal(key, (m, k), jnp.float32)
    rhs = jax.random.normal(key, (e, k, n), jnp.float32) * 0.1
    gs = jnp.asarray([80, 0, 100, 76], jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(lambda l, r: (gmm(l, r, gs, 128)**2).sum(),
                      argnums=(0, 1))(lhs, rhs)
    gx = jax.grad(lambda l, r: (jax.lax.ragged_dot(l, r, gs)**2).sum(),
                  argnums=(0, 1))(lhs, rhs)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_gmm_empty_group_weight_grad_is_zero():
    m, k, n, e = 128, 32, 16, 4
    key = jax.random.PRNGKey(2)
    lhs = jax.random.normal(key, (m, k), jnp.float32)
    rhs = jax.random.normal(key, (e, k, n), jnp.float32)
    gs = jnp.asarray([0, 128, 0, 0], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        _, drhs = jax.grad(lambda l, r: (gmm(l, r, gs, 128)**2).sum(),
                           argnums=(0, 1))(lhs, rhs)
    d = np.asarray(drhs)
    assert np.all(d[0] == 0) and np.all(d[2] == 0) and np.all(d[3] == 0)
    assert np.any(d[1] != 0)
