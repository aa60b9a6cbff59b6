"""Sharded multimodal training: mesh parity, grad accumulation, resume,
LoRA training.

The reference trains its flagship 5.1B with DeepSpeed ZeRO-3 + MoE leaf
modules (scripts/zero3.json, moe_model/train/train.py:1480) and gradient
accumulation in the forked trainer loop (llava_trainer.py:427-953); these
tests prove the jit-over-mesh equivalents produce the same numbers as the
single-device step on the virtual 8-device CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from competesmoe_tpu.models.llava import IMAGE_TOKEN_INDEX, LlavaModel
from competesmoe_tpu.parallel.ep_context import use_expert_parallel
from competesmoe_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_param_shardings,
)
from competesmoe_tpu.train.lm_trainer import TrainState
from competesmoe_tpu.train.mm_task import (
    MMTrainConfig,
    build_mm_schedules,
    make_mm_eval_step,
    make_mm_optimizer,
    make_mm_train_step,
)
from tests.test_llava import tiny_llava_cfg

pytestmark = pytest.mark.slow



def mm_batch(B=8, L=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, 60, (B, L)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    mask = np.ones((B, L), np.int32)
    px = rng.normal(size=(B, 28, 28, 3)).astype(np.float32)
    return {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(ids),
            "attention_mask": jnp.asarray(mask),
            "images": jnp.asarray(px)}


def build(total_steps=4, moe_name="competesmoe"):
    import dataclasses
    cfg = tiny_llava_cfg(moe=True)
    cfg = dataclasses.replace(
        cfg,
        vision=dataclasses.replace(cfg.vision, moe_name=moe_name),
        projector=dataclasses.replace(cfg.projector, moe_name=moe_name))
    tcfg = MMTrainConfig(stage="sft", total_steps=total_steps,
                         rate_flip=1.0, max_compete_in_iter=3,
                         learning_rate=1e-3)
    vs, ps = build_mm_schedules(cfg, tcfg)
    model = LlavaModel(cfg, vision_flip_schedule=vs,
                       projector_flip_schedule=ps)
    return model, cfg, tcfg


def init_state(model, tcfg, batch):
    params = model.init(jax.random.PRNGKey(0), batch["input_ids"],
                        batch["images"], labels=batch["labels"],
                        attention_mask=batch["attention_mask"])["params"]
    optimizer = make_mm_optimizer(tcfg, params)
    return params, optimizer


def test_sharded_mm_step_matches_single_device():
    """fsdp + expert-parallel mm train step == single-device step.

    Uses SGD(1.0) so the post-step param delta IS the gradient — the
    loss/grad parity the sharded path must preserve (Adam would amplify
    reduction-order fp noise on near-zero grads into relative blowups)."""
    import optax

    model, cfg, tcfg = build()
    batch = mm_batch()
    params, _ = init_state(model, tcfg, batch)
    optimizer = optax.sgd(1.0)

    # single-device reference
    step1 = make_mm_train_step(model, optimizer, donate=False)
    s1, m1 = step1(TrainState.create(params, optimizer), batch)
    jax.block_until_ready(m1)

    # sharded: experts on 'expert' (EP all-to-all), dense fsdp over 'data'
    mesh = make_mesh(n_expert=2)
    with mesh, use_expert_parallel(mesh):
        shardings = make_param_shardings(mesh, params, fsdp=True,
                                         fsdp_min_size=64)
        p2 = jax.device_put(params, shardings)
        b2 = {k: jax.device_put(v, batch_sharding(mesh))
              for k, v in batch.items()}
        step2 = make_mm_train_step(model, optimizer, donate=False)
        s2, m2 = step2(TrainState.create(p2, optimizer), b2)
        jax.block_until_ready(m2)

    assert np.allclose(float(m1["loss/total"]), float(m2["loss/total"]),
                       rtol=1e-5, atol=1e-5)
    assert np.allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                       rtol=1e-4)
    # param deltas = -grads under sgd(1.0): elementwise grad parity
    flat0 = jax.tree_util.tree_leaves(params)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat2 = jax.tree_util.tree_leaves(s2.params)
    for p0, a, b in zip(flat0, flat1, flat2):
        g1 = np.asarray(a) - np.asarray(p0)
        g2 = np.asarray(b) - np.asarray(p0)
        np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-5)


def test_grad_accum_matches_full_batch():
    """n_microbatch=2 == full batch when microbatches are homogeneous."""
    import optax

    model, cfg, tcfg = build()
    batch = mm_batch(B=8)
    params, _ = init_state(model, tcfg, batch)
    optimizer = optax.sgd(1.0)
    step1 = make_mm_train_step(model, optimizer, donate=False,
                               n_microbatch=1)
    step2 = make_mm_train_step(model, optimizer, donate=False,
                               n_microbatch=2)
    s1, m1 = step1(TrainState.create(params, optimizer), batch)
    s2, m2 = step2(TrainState.create(params, optimizer), batch)
    assert np.allclose(float(m1["loss/total"]), float(m2["loss/total"]),
                       rtol=1e-5, atol=1e-6)
    for p0, a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
        g1 = np.asarray(a) - np.asarray(p0)
        g2 = np.asarray(b) - np.asarray(p0)
        np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-5)


def test_mm_checkpoint_resume_identical_loss(tmp_path):
    """Kill-and-resume: save at step 2, restore, continue — losses match a
    straight-through run exactly (train.py:1501-1505 resume role)."""
    from competesmoe_tpu.train.checkpoint import Saver

    model, cfg, tcfg = build(total_steps=5)
    params, optimizer = init_state(model, tcfg, mm_batch())
    step = make_mm_train_step(model, optimizer, donate=False)

    # straight-through run, recording losses
    state = TrainState.create(params, optimizer)
    losses = []
    mid_state = None
    for i in range(4):
        state, m = step(state, mm_batch(seed=i))
        losses.append(float(m["loss/total"]))
        if i == 1:
            mid_state = state

    # save at step 2, restore into a fresh process-state, continue
    saver = Saver(tmp_path / "ck")
    saver["state"] = mid_state
    saver.save(2)

    saver2 = Saver(tmp_path / "ck")
    saver2["state"] = TrainState.create(params, optimizer)
    restored_step = saver2.restore()
    assert restored_step == 2
    state2 = saver2["state"]
    # restored leaves are numpy; the step consumes them directly
    resumed = []
    for i in range(2, 4):
        state2, m = step(state2, mm_batch(seed=i))
        resumed.append(float(m["loss/total"]))
    np.testing.assert_allclose(resumed, losses[2:4], rtol=1e-6)


def test_lora_training_step():
    """LoRA: B=0 init reproduces the base model at step 0; training moves
    only the factors; the merged model changes (train.py:1310-1340)."""
    from competesmoe_tpu.train.lora import (
        apply_lora,
        init_lora_params,
        lora_scaling,
        make_mm_lora_train_step,
    )
    import optax

    model, cfg, tcfg = build()
    batch = mm_batch()
    params, _ = init_state(model, tcfg, batch)
    lora = init_lora_params(params, rank=4, rng=jax.random.PRNGKey(1))
    assert lora, "no kernels matched the LoRA filter"
    # filter excludes vision tower + projector (find_all_linear_names)
    assert not any(k.startswith(("vision_tower", "mm_projector"))
                   for k in lora)

    scaling = lora_scaling(4, 8.0)
    eff0 = apply_lora(params, lora, scaling)
    for a, b in zip(jax.tree_util.tree_leaves(eff0),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    optimizer = optax.adam(1e-2)
    step = make_mm_lora_train_step(model, optimizer, scaling, donate=False)
    state = TrainState.create(lora, optimizer)
    state, metrics = step(state, params, batch)
    assert np.isfinite(float(metrics["loss/total"]))
    # the B factors moved, so the merged model now differs from base
    eff1 = apply_lora(params, state.params, scaling)
    diffs = [np.abs(np.asarray(a) - np.asarray(b)).max()
             for a, b in zip(jax.tree_util.tree_leaves(eff1),
                             jax.tree_util.tree_leaves(params))]
    assert max(diffs) > 0


def test_lora_filter_excludes_lm_head():
    """Reference find_all_linear_names removes 'lm_head' from the LoRA
    target set (train.py:264-265); adapter trees must match."""
    from competesmoe_tpu.train.lora import init_lora_params

    params = {
        "lm_head": {"kernel": jnp.zeros((8, 64))},
        "decoder": {"lm_head": {"kernel": jnp.zeros((8, 64))},
                    "layers_0": {"q_proj": {"kernel": jnp.zeros((8, 8))}}},
    }
    lora = init_lora_params(params, rank=2, rng=jax.random.PRNGKey(0))
    assert any("layers_0" in k for k in lora)
    assert not any("lm_head" in k for k in lora)


def test_lora_grad_accum_matches_full_batch():
    """make_mm_lora_train_step(n_microbatch=2) == one full-batch step
    (same homogeneous-microbatch identity as the dense step)."""
    import optax

    from competesmoe_tpu.train.lora import (
        init_lora_params,
        lora_scaling,
        make_mm_lora_train_step,
    )

    model, cfg, tcfg = build()
    batch = mm_batch(B=8)
    params, _ = init_state(model, tcfg, batch)
    lora = init_lora_params(params, rank=4, rng=jax.random.PRNGKey(1))
    scaling = lora_scaling(4, 8.0)
    optimizer = optax.sgd(1.0)
    step1 = make_mm_lora_train_step(model, optimizer, scaling,
                                    donate=False, n_microbatch=1)
    step2 = make_mm_lora_train_step(model, optimizer, scaling,
                                    donate=False, n_microbatch=2)
    s1, m1 = step1(TrainState.create(lora, optimizer), params, batch)
    s2, m2 = step2(TrainState.create(lora, optimizer), params, batch)
    assert np.allclose(float(m1["loss/total"]), float(m2["loss/total"]),
                       rtol=1e-5, atol=1e-6)
    for p0, a, b in zip(jax.tree_util.tree_leaves(lora),
                        jax.tree_util.tree_leaves(s1.params),
                        jax.tree_util.tree_leaves(s2.params)):
        g1 = np.asarray(a) - np.asarray(p0)
        g2 = np.asarray(b) - np.asarray(p0)
        np.testing.assert_allclose(g1, g2, rtol=1e-3, atol=1e-5)


def test_mm_eval_step():
    model, cfg, tcfg = build()
    batch = mm_batch()
    params, _ = init_state(model, tcfg, batch)
    ev = make_mm_eval_step(model)
    loss = float(ev(params, batch))
    assert np.isfinite(loss) and loss > 0
