"""Language-model + trainer + sharding tests (virtual 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from competesmoe_tpu.models.lm import LMConfig, MoELanguageModel, lm_loss_fn
from competesmoe_tpu.moe import MoEArgs, build_flip_schedule
from competesmoe_tpu.parallel import (
    batch_sharding,
    make_mesh,
    make_param_shardings,
)
from competesmoe_tpu.train import OptConfig, TrainState, make_optimizer, \
    make_train_step


def tiny_cfg(**kw):
    base = dict(vocab_size=128, d_model=32, n_layers=2, n_heads=2,
                n_experts=4, expert_size=8, moe_topk=2,
                moe_name="smoe", moe_args=MoEArgs())
    base.update(kw)
    return LMConfig(**base)


def test_lm_forward_shapes():
    cfg = tiny_cfg()
    model = MoELanguageModel(cfg)
    tokens = jnp.zeros((2, 9), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    logits, aux = model.apply(params, tokens, train=True)
    assert logits.shape == (2, 9, 128)
    assert "total_aux_loss" in aux
    assert np.isfinite(float(aux["total_aux_loss"]))


def test_lm_universal_sharing_reduces_params():
    cfg_full = tiny_cfg(n_layers=4)
    cfg_shared = tiny_cfg(n_layers=4, universal_group_size=2)
    tokens = jnp.zeros((1, 5), jnp.int32)
    p_full = MoELanguageModel(cfg_full).init(jax.random.PRNGKey(0), tokens)
    p_shared = MoELanguageModel(cfg_shared).init(jax.random.PRNGKey(0),
                                                 tokens)
    n_full = sum(x.size for x in jax.tree_util.tree_leaves(p_full))
    n_shared = sum(x.size for x in jax.tree_util.tree_leaves(p_shared))
    assert n_shared < n_full


def test_lm_layer_order():
    cfg = tiny_cfg(n_layers=4, universal_group_size=2,
                   universal_group_type="abab")
    assert cfg.layer_order() == [0, 1, 0, 1]
    cfg = tiny_cfg(n_layers=4, universal_group_size=2,
                   universal_group_type="aabb")
    assert cfg.layer_order() == [0, 0, 1, 1]


def test_lm_loss_ignore_index():
    logits = jnp.zeros((1, 4, 8))
    targets = jnp.array([[1, 2, -100, 3]])
    loss, n = lm_loss_fn(logits, targets)
    assert int(n) == 3
    np.testing.assert_allclose(float(loss), np.log(8), rtol=1e-5)


def test_competesmoe_lm_train_step_on_mesh():
    """Full CompeteSMoE LM train step over a (data=4, expert=2) mesh."""
    cfg = tiny_cfg(moe_name="competesmoe", n_experts=8, moe_topk=2)
    sched = build_flip_schedule(cfg.n_layers, 10, 0.0, 1.0, 4, seed=0)
    model = MoELanguageModel(cfg, flip_schedule=sched)
    mesh = make_mesh(n_expert=2)
    tokens = jnp.zeros((8, 9), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens[:, :-1])["params"]
    optimizer = make_optimizer(OptConfig(total_steps=10, warmup_steps=2))
    with mesh:
        params = jax.device_put(params, make_param_shardings(mesh, params))
        state = TrainState.create(params, optimizer)
        tokens = jax.device_put(tokens, batch_sharding(mesh))
        train_step = make_train_step(model, optimizer, donate=False)
        state1, m1 = train_step(state, tokens)
        state2, m2 = train_step(state1, tokens)
    assert int(state2.step) == 2
    assert np.isfinite(float(m2["loss/total"]))
    # Expert params must actually be sharded over the expert axis.
    keys = state2.params["blocks_0"]["moe"]["keys"]
    spec = keys.sharding.spec
    assert spec[0] == "expert", spec


def test_train_step_router_agreement_channel():
    """The distillation-health metric: on steps where at least one layer
    flips, `competesmoe/router_agreement` is the mean router-vs-
    competition top-k overlap in [0, 1] and `n_flip_layers` counts the
    flipped layers; on non-flip steps it is the -1 mask sentinel. This
    is the channel the reference never logged (simple_task.py:341-352
    scrapes loss magnitudes only) and the A/B study reads."""
    cfg = tiny_cfg(moe_name="competesmoe", n_experts=8, moe_topk=2)
    sched = build_flip_schedule(cfg.n_layers, 12, warm_up=0.5,
                                rate_flip=1.0, max_compete_in_iter=2,
                                seed=3)
    model = MoELanguageModel(cfg, flip_schedule=sched)
    tokens = jnp.asarray(np.random.default_rng(0).integers(
        1, 128, (4, 9)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens[:, :-1])["params"]
    optimizer = make_optimizer(OptConfig(total_steps=12))
    state = TrainState.create(params, optimizer)
    train_step = make_train_step(model, optimizer, donate=False)
    saw_flip = saw_noflip = False
    for step in range(8):
        n_expected = sum(sched.is_flip(li, step)
                         for li in range(cfg.n_layers))
        state, m = train_step(state, tokens)
        assert int(m["competesmoe/n_flip_layers"]) == n_expected
        agree = float(m["competesmoe/router_agreement"])
        if n_expected:
            assert 0.0 <= agree <= 1.0
            saw_flip = True
        else:
            assert agree == -1.0
            saw_noflip = True
    assert saw_flip and saw_noflip, "schedule never exercised both arms"


def test_expert_sharding_rules():
    mesh = make_mesh(n_expert=2)
    cfg = tiny_cfg()
    tokens = jnp.zeros((2, 5), jnp.int32)
    params = MoELanguageModel(cfg).init(jax.random.PRNGKey(0),
                                        tokens)["params"]
    shardings = make_param_shardings(mesh, params)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    seen_expert = False
    for path, sh in flat:
        names = [getattr(p, "key", "") for p in path]
        if names[-1] in ("keys", "values"):
            assert sh.spec[0] == "expert"
            seen_expert = True
    assert seen_expert


def test_lr_schedule_shapes():
    from competesmoe_tpu.train import make_lr_schedule
    sched = make_lr_schedule(OptConfig(lr=1e-3, warmup_steps=10,
                                       total_steps=100))
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-5)
    assert float(sched(99)) < 1e-3


def test_act_pondering_lm():
    """SUT-style ACT: shared block pondered with halting; ponder cost in
    the aux losses; outputs finite and differentiable."""
    cfg = tiny_cfg(n_layers=2, universal_group_size=2, act_max_steps=3)
    cfg = LMConfig(**{**cfg.__dict__, "act_loss": 0.01})
    model = MoELanguageModel(cfg)
    tokens = jnp.zeros((2, 7), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    logits, aux = model.apply(params, tokens, train=True)
    assert logits.shape == (2, 7, 128)
    ponders = [v for k, v in aux.items() if k.endswith("ponder_cost")]
    assert ponders and all(1.0 <= float(p) <= 3.0 + 1e-3 for p in ponders)

    @jax.jit
    def loss(params):
        logits, aux = model.apply(params, tokens, train=True)
        return jnp.mean(logits**2) + aux["total_aux_loss"]

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(g))


def test_resolve_attn_backend():
    from competesmoe_tpu.models.lm import resolve_attn_backend

    # explicit settings pass through
    assert resolve_attn_backend("einsum", 8192, 128, "tpu") == "einsum"
    assert resolve_attn_backend("flash", 128, 96, "cpu") == "flash"
    # auto: flash only on TPU at long seq with lane-aligned head dim
    assert resolve_attn_backend("auto", 4096, 128, "tpu") == "flash"
    assert resolve_attn_backend("auto", 1024, 128, "tpu") == "einsum"
    assert resolve_attn_backend("auto", 4096, 96, "tpu") == "einsum"
    assert resolve_attn_backend("auto", 4096, 128, "cpu") == "einsum"


def test_lm_remat_loss_and_grads_identical():
    """-remat (per-block jax.checkpoint): loss identical, grads equal to
    f32 reassociation noise, param tree unchanged — with the competesmoe
    flip schedule active so the rematted branch includes lax.cond."""
    sched = build_flip_schedule(2, total_steps=10, warm_up=0.0,
                                rate_flip=1.0, max_compete_in_iter=2,
                                seed=0)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(1, 120, (2, 17)), jnp.int32)

    def loss_and_grads(remat):
        cfg = tiny_cfg(moe_name="competesmoe", dtype=jnp.float32,
                       remat=remat)
        model = MoELanguageModel(cfg, flip_schedule=sched)
        params = model.init(jax.random.PRNGKey(0), tokens[:, :-1])

        def f(p):
            logits, aux = model.apply(p, tokens[:, :-1], train=True,
                                      step=jnp.int32(1))
            loss, _ = lm_loss_fn(logits, tokens[:, 1:])
            return loss + aux["total_aux_loss"]

        return jax.jit(jax.value_and_grad(f))(params)

    (l0, g0), (l1, g1) = loss_and_grads(False), loss_and_grads(True)
    assert jax.tree_util.tree_structure(g0) == \
        jax.tree_util.tree_structure(g1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)
