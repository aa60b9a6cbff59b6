"""Layer-zoo smoke + behavior tests (both trees)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from competesmoe_tpu.moe import (
    MoEArgs,
    build_flip_schedule,
    get_moe,
    get_pretrain_moe,
)

MM_NAMES = ["smoe", "smoe_sigmoidgating", "xmoe", "smoe_perturbed",
            "smoe_share", "deepseekv3", "competesmoe"]
PT_NAMES = ["smoe", "smoe_sigmoid", "xmoe", "smoe_perturbed", "deepseekv2",
            "deepseekv3", "competesmoe"]

B, N, D = 2, 9, 16

pytestmark = pytest.mark.slow



def _mk_mm(name, **kw):
    cls = get_moe(name)
    return cls(in_dim=D, out_dim=D, n_experts=4, n_selected=2,
               args=MoEArgs(), **kw)


@pytest.mark.parametrize("name", MM_NAMES)
def test_multimodal_layer_forward(name):
    layer = _mk_mm(name)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    params = layer.init(jax.random.PRNGKey(1), x)
    y, aux = layer.apply(params, x, train=True, step=0)
    assert y.shape == (B, N, D)
    assert np.isfinite(float(aux.aux_loss))
    # eval path has zero aux loss for the train-gated layers
    y2, aux2 = layer.apply(params, x, train=False)
    assert y2.shape == (B, N, D)


@pytest.mark.parametrize("name", MM_NAMES)
def test_multimodal_layer_jit_and_grad(name):
    layer = _mk_mm(name)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    params = layer.init(jax.random.PRNGKey(1), x)

    @jax.jit
    def loss_fn(params, x):
        y, aux = layer.apply(params, x, train=True, step=3)
        return jnp.mean(y**2) + aux.aux_loss

    g = jax.grad(loss_fn)(params, x)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(t))) for t in flat)


def _mk_pt(name, **kw):
    cls = get_pretrain_moe(name)
    return cls(dmodel=D, n_experts=8, expert_size=12, n_heads=2,
               args=MoEArgs(), **kw)


@pytest.mark.parametrize("name", PT_NAMES)
def test_pretrain_layer_forward(name):
    layer = _mk_pt(name)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    params = layer.init(jax.random.PRNGKey(1), x)
    y, aux = layer.apply(params, x, train=True, step=0)
    assert y.shape == (B, N, D)
    assert np.isfinite(float(aux.aux_loss))


@pytest.mark.parametrize("name", PT_NAMES)
def test_pretrain_layer_grad(name):
    layer = _mk_pt(name)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    params = layer.init(jax.random.PRNGKey(1), x)

    @jax.jit
    def loss_fn(params, x):
        y, aux = layer.apply(params, x, train=True, step=1)
        return jnp.mean(y**2) + aux.aux_loss

    g = jax.grad(loss_fn)(params, x)
    assert all(np.all(np.isfinite(np.asarray(t)))
               for t in jax.tree_util.tree_leaves(g))


@pytest.mark.parametrize("tree", ["mm", "pt"])
def test_competesmoe_flip_switches_selection(tree):
    """On a flip step the layer must route by affinity, not the gate."""
    sched = build_flip_schedule(1, 10, 0.0, 1.0, 8, seed=0)
    assert sched.flips.all()  # rate 1.0 -> all steps compete
    if tree == "mm":
        cls = get_moe("competesmoe")
        layer = cls(in_dim=D, out_dim=D, n_experts=4, n_selected=2,
                    args=MoEArgs(), flip_schedule=sched.flips[0],
                    step_warm=sched.step_warm)
    else:
        cls = get_pretrain_moe("competesmoe")
        layer = cls(dmodel=D, n_experts=8, expert_size=12, n_heads=2,
                    args=MoEArgs(), flip_schedule=sched.flips[0],
                    step_warm=sched.step_warm)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    params = layer.init(jax.random.PRNGKey(1), x)

    y_comp, aux_comp = layer.apply(params, x, train=True, step=0)
    y_eval, aux_eval = layer.apply(params, x, train=False)
    # Competition must fire on the flip step: router-distillation loss > 0.
    assert float(aux_comp.losses["routerloss" if tree == "mm"
                                 else "mlp_router_loss"]) > 0.0
    # Eval path (router policy) generally selects different experts.
    assert aux_comp.selected_experts is not None


def test_competesmoe_no_flip_matches_plain_router():
    """With an all-False schedule the layer behaves like the router path."""
    sched = build_flip_schedule(1, 10, 0.0, 0.0, 8, seed=0)
    cls = get_moe("competesmoe")
    layer = cls(in_dim=D, out_dim=D, n_experts=4, n_selected=2,
                args=MoEArgs(), flip_schedule=sched.flips[0],
                step_warm=sched.step_warm)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    params = layer.init(jax.random.PRNGKey(1), x)
    y_flip, aux = layer.apply(params, x, train=True, step=5)
    layer_ns = cls(in_dim=D, out_dim=D, n_experts=4, n_selected=2,
                   args=MoEArgs())
    y_plain, _ = layer_ns.apply(params, x, train=True, step=5)
    np.testing.assert_allclose(np.asarray(y_flip), np.asarray(y_plain),
                               rtol=1e-5, atol=1e-6)
    assert float(aux.losses["routerloss"]) == 0.0


def test_shared_expert_combine_modes():
    """SharedE-V2 mixes 0.5/0.5; V3 adds — with identical params V3 = 2*V2."""
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, D))
    v2 = get_moe("smoe_share")(in_dim=D, out_dim=D, n_experts=4,
                               n_selected=2, args=MoEArgs())
    v3 = get_moe("deepseekv3")(in_dim=D, out_dim=D, n_experts=4,
                               n_selected=2, args=MoEArgs())
    params = v2.init(jax.random.PRNGKey(1), x)
    y2, _ = v2.apply(params, x, train=False)
    y3, _ = v3.apply(params, x, train=False)
    np.testing.assert_allclose(np.asarray(y3), 2 * np.asarray(y2), rtol=1e-5,
                               atol=1e-6)
