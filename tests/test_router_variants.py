"""Coverage of the CompeteSMoE router-loss and gating variants
(hybrid / tribrid / in_topk / norm_sigmoid / is_cosine / is_norm_weight /
balance_affinity) on both trees."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from competesmoe_tpu.moe import MoEArgs, get_moe, get_pretrain_moe

B, N, D = 2, 9, 16
FLIPS = np.ones(8, dtype=bool)


def run_pretrain(args: MoEArgs, step=0):
    layer = get_pretrain_moe("competesmoe")(
        dmodel=D, n_experts=8, expert_size=8, n_heads=2, args=args,
        flip_schedule=FLIPS, step_warm=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    params = layer.init(jax.random.PRNGKey(1), x)

    def loss_fn(p):
        y, aux = layer.apply(p, x, train=True, step=step)
        return jnp.mean(y**2) + aux.aux_loss, aux

    (val, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    return float(val), aux


@pytest.mark.parametrize("variant", [
    dict(hybrid=True, router_theta=0.5),
    dict(tribrid=True, router_theta=0.5),
    dict(in_topk=True),
    dict(norm_sigmoid=True, scale_weight=2.0),
    dict(is_cosine=True),
    dict(is_norm_weight=True),
    dict(balance_affinity=True),
])
def test_pretrain_competesmoe_variants(variant):
    val, aux = run_pretrain(MoEArgs(**variant))
    assert np.isfinite(val)
    assert float(aux.losses["mlp_router_loss"]) != 0.0


def test_router_loss_variants_differ():
    """plain / hybrid / tribrid / in_topk must produce different router
    losses for the same weights (they weight different terms)."""
    losses = {}
    for name, kw in [("plain", {}), ("hybrid", dict(hybrid=True)),
                     ("tribrid", dict(tribrid=True)),
                     ("in_topk", dict(in_topk=True))]:
        _, aux = run_pretrain(MoEArgs(router_theta=0.7, **kw))
        losses[name] = float(aux.losses["mlp_router_loss"])
    vals = list(losses.values())
    assert len(set(round(v, 10) for v in vals)) == len(vals), losses


def test_mm_competesmoe_hybrid():
    layer = get_moe("competesmoe")(
        in_dim=D, out_dim=D, n_experts=4, n_selected=2,
        args=MoEArgs(hybrid=True, router_theta=0.3),
        flip_schedule=FLIPS, step_warm=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    params = layer.init(jax.random.PRNGKey(1), x)
    y, aux = layer.apply(params, x, train=True, step=0)
    assert float(aux.losses["routerloss"]) > 0.0
    # hybrid adds a nonnegative top-k term: loss >= plain loss
    plain = get_moe("competesmoe")(
        in_dim=D, out_dim=D, n_experts=4, n_selected=2, args=MoEArgs(),
        flip_schedule=FLIPS, step_warm=0)
    _, aux_plain = plain.apply(params, x, train=True, step=0)
    assert float(aux.losses["routerloss"]) >= \
        float(aux_plain.losses["routerloss"]) - 1e-9


def test_mm_competesmoe_norm_sigmoid_routes_by_sigmoid():
    args = MoEArgs(norm_sigmoid=True)
    layer = get_moe("competesmoe")(
        in_dim=D, out_dim=D, n_experts=4, n_selected=2, args=args,
        flip_schedule=FLIPS, step_warm=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    params = layer.init(jax.random.PRNGKey(1), x)
    y, aux = layer.apply(params, x, train=True, step=0)
    assert np.isfinite(float(aux.aux_loss))
