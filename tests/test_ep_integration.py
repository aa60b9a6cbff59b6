"""Expert parallelism integrated into the models (VERDICT r1 item 2).

Verifies that with an active EP mesh (parallel.ep_context):
- both MoE layer trees produce the same outputs/losses as the replicated
  single-shard path (router branch AND competition branch),
- a full -n_expert_shards 2 style train step matches the single-shard
  loss/grads, and
- the jitted EP step really contains `all_to_all` (tokens move over the
  expert axis; it's not just XLA auto-sharding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from competesmoe_tpu.moe import MoEArgs, build_flip_schedule
from competesmoe_tpu.moe.layers import CompeteSMoELayer
from competesmoe_tpu.moe.pretrain_layers import PretrainCompeteSMoE, PretrainSMoE
from competesmoe_tpu.parallel import make_mesh, use_expert_parallel
from competesmoe_tpu.parallel.mesh import batch_sharding, make_param_shardings

pytestmark = pytest.mark.slow



def make_ep_mesh(n_expert=2, n_total=4):
    return make_mesh(n_expert=n_expert, devices=jax.devices()[:n_total])


def tree_allclose(a, b, **kw):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


def test_ep_kv_layer_router_branch_matches():
    mesh = make_ep_mesh()
    layer = PretrainSMoE(dmodel=32, n_experts=8, expert_size=16, n_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 32))
    params = layer.init(jax.random.PRNGKey(1), x)
    ref, _ = jax.jit(lambda p, x: layer.apply(p, x, train=True))(params, x)
    with use_expert_parallel(mesh):
        ep, _ = jax.jit(lambda p, x: layer.apply(p, x, train=True))(params, x)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ep_kv_competition_branch_matches():
    mesh = make_ep_mesh()
    sched = np.ones(4, dtype=bool)
    layer = PretrainCompeteSMoE(dmodel=32, n_experts=8, expert_size=16,
                                n_heads=2, args=MoEArgs(),
                                flip_schedule=sched, step_warm=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 32))
    params = layer.init(jax.random.PRNGKey(1), x)

    def run(p, x):
        return layer.apply(p, x, train=True, step=jnp.int32(1))

    ref, ref_aux = jax.jit(run)(params, x)
    with use_expert_parallel(mesh):
        ep, ep_aux = jax.jit(run)(params, x)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(ep_aux.aux_loss), float(ref_aux.aux_loss),
                               rtol=1e-5, atol=1e-7)
    # competition actually fired
    assert float(ref_aux.losses["mlp_router_loss"]) > 0.0


def test_ep_mlp2_layer_both_branches_match():
    mesh = make_ep_mesh()
    sched = np.array([False, True, False, True])
    layer = CompeteSMoELayer(in_dim=24, out_dim=24, n_experts=8,
                             n_selected=2, args=MoEArgs(), impl="grouped",
                             flip_schedule=sched, step_warm=0)
    ep_layer = CompeteSMoELayer(in_dim=24, out_dim=24, n_experts=8,
                                n_selected=2, args=MoEArgs(), impl="ep",
                                flip_schedule=sched, step_warm=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 24))
    params = layer.init(jax.random.PRNGKey(1), x)
    for step in (0, 1):  # router branch, competition branch
        ref, ref_aux = jax.jit(
            lambda p, x, s: layer.apply(p, x, train=True, step=s)
        )(params, x, jnp.int32(step))
        with use_expert_parallel(mesh):
            ep, ep_aux = jax.jit(
                lambda p, x, s: ep_layer.apply(p, x, train=True, step=s)
            )(params, x, jnp.int32(step))
        np.testing.assert_allclose(np.asarray(ep), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(ep_aux.aux_loss),
                                   float(ref_aux.aux_loss),
                                   rtol=1e-5, atol=1e-7)


def test_ep_impl_requires_mesh():
    layer = PretrainSMoE(dmodel=16, n_experts=4, expert_size=8, n_heads=2,
                         impl="ep")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16))
    with pytest.raises(ValueError, match="expert-parallel mesh"):
        layer.init(jax.random.PRNGKey(1), x)


def _train_setup(moe_impl="auto"):
    from competesmoe_tpu.models.lm import LMConfig, MoELanguageModel
    from competesmoe_tpu.train import OptConfig, TrainState, make_optimizer, \
        make_train_step

    cfg = LMConfig(vocab_size=64, d_model=32, n_layers=2, n_heads=2,
                   n_experts=8, expert_size=8, moe_topk=2,
                   moe_name="competesmoe", moe_args=MoEArgs(),
                   moe_impl=moe_impl, dtype=jnp.float32)
    sched = build_flip_schedule(cfg.n_layers, total_steps=4, warm_up=0.0,
                                rate_flip=1.0, max_compete_in_iter=2, seed=0)
    model = MoELanguageModel(cfg, flip_schedule=sched)
    tokens = jax.random.randint(jax.random.PRNGKey(3), (8, 17), 0, 64)
    params = model.init(jax.random.PRNGKey(0), tokens[:, :-1])["params"]
    opt = make_optimizer(OptConfig(total_steps=4, warmup_steps=0))
    state = TrainState.create(params, opt)
    step = make_train_step(model, opt, donate=False)
    return model, state, step, tokens


def test_ep_train_step_matches_single_shard():
    """Full CompeteSMoE train step: EP mesh vs replicated — loss and the
    resulting params must match (VERDICT 'matches single-device loss to
    ~1e-5')."""
    _, state, step_fn, tokens = _train_setup()
    ref_state, ref_metrics = step_fn(state, tokens)

    mesh = make_ep_mesh()
    _, ep_state0, ep_step, _ = _train_setup()
    with use_expert_parallel(mesh):
        shardings = make_param_shardings(mesh, ep_state0.params)
        ep_params = jax.device_put(state.params, shardings)
        ep_state = ep_state0.replace(params=ep_params)
        ep_tokens = jax.device_put(tokens, batch_sharding(mesh))
        ep_state, ep_metrics = ep_step(ep_state, ep_tokens)

    np.testing.assert_allclose(float(ep_metrics["loss/total"]),
                               float(ref_metrics["loss/total"]),
                               rtol=2e-5, atol=1e-6)
    tree_allclose(ep_state.params, ref_state.params, rtol=2e-4, atol=2e-5)


def test_ep_path_emits_all_to_all():
    """The EP-integrated model step must actually move tokens with
    lax.all_to_all — assert on the lowered HLO."""
    mesh = make_ep_mesh()
    model, state, step_fn, tokens = _train_setup()
    with use_expert_parallel(mesh):
        ep_tokens = jax.device_put(tokens, batch_sharding(mesh))
        lowered = step_fn.lower(state, ep_tokens)
    hlo = lowered.as_text()
    assert "all-to-all" in hlo or "all_to_all" in hlo, \
        "EP model step lowered without any all_to_all collective"
    # And without the EP context it must not be there.
    lowered_ref = step_fn.lower(state, tokens)
    hlo_ref = lowered_ref.as_text()
    assert "all-to-all" not in hlo_ref and "all_to_all" not in hlo_ref


def test_ep_ffn_kv_with_bias():
    """Bias-carrying kv experts go through the EP path correctly."""
    from competesmoe_tpu.ops import expert_compute as ec

    mesh = make_ep_mesh()
    keys = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 8)) * 0.1
    values = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 16)) * 0.1
    b1 = jax.random.normal(jax.random.PRNGKey(2), (8, 8)) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(3), (32, 16))
    sel = jax.random.randint(jax.random.PRNGKey(4), (32, 2), 0, 8)
    w = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(5), (32, 2)))
    ref = ec.moe_ffn_kv(x, sel, w, keys, values, jax.nn.relu, b1=b1,
                        impl="grouped")
    with use_expert_parallel(mesh):
        ep = jax.jit(lambda *a: ec.moe_ffn_kv(*a, activation=jax.nn.relu,
                                              b1=b1, impl="ep")
                     )(x, sel, w, keys, values)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
