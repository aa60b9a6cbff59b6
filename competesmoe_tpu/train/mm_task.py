"""Multimodal (LLaVA-style) training: the 3-stage CompeteSMoE recipe.

Re-design of `moe_model/train/{train,llava_trainer}.py`:
- stage "pretrain": only the mm projector trains (lr 1e-3, zero2) —
  scripts/train/phi35mini/siglip/pretrain.sh
- stage "pft": full model trains — pft.sh
- stage "sft": MoE-ified vision tower + projector (sparse upcycling),
  competition schedules installed, separate mm_projector_lr —
  sft.sh + llava_trainer param groups (:252-330)
- the LLaVACallback flip-schedule chaining (llava_trainer.py:1025-1081)
  becomes deterministic schedule construction: vision-tower layers chain
  first, then the projector layer (same layer-order semantics as
  `set_total_steps` walking modules in order).

Parameter freezing is an optax.multi_transform over path labels; frozen
groups get `set_to_zero`, matching requires_grad_(False).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.llava import LlavaConfig, LlavaModel
from ..moe.schedule import FlipSchedule, build_flip_schedule
from .lm_trainer import TrainState


@dataclasses.dataclass(frozen=True)
class MMTrainConfig:
    stage: str = "sft"               # pretrain | pft | sft
    learning_rate: float = 4e-6
    mm_projector_lr: Optional[float] = None
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    grad_clip: float = 1.0
    weight_decay: float = 0.0
    lr_sched: str = "cos"
    # hold Adam mu/nu blockwise-int8 (train/quant_opt.py) — the lever
    # that fits the reference's seq-2048 sft on v5e-8 (docs/sharding.md)
    opt_state_8bit: bool = False
    # CompeteSMoE schedule
    rate_flip: float = 0.05
    warm_up: float = 0.0
    max_compete_in_iter: int = 2
    schedule_seed: int = 0


def build_mm_schedules(cfg: LlavaConfig, tcfg: MMTrainConfig
                       ) -> Tuple[Optional[FlipSchedule],
                                  Optional[FlipSchedule]]:
    """Chained schedules: vision layers 0..V-1 then the projector as layer
    V (the callback walks vision tower modules then mm_projector,
    llava_trainer.py:1035-1060)."""
    needs = []
    if cfg.vision.moe_name == "competesmoe":
        needs.append("vision")
    if (cfg.projector.projector_type == "moe"
            and cfg.projector.moe_name == "competesmoe"):
        needs.append("projector")
    if not needs:
        return None, None
    n_vision = cfg.vision.num_hidden_layers if "vision" in needs else 0
    n_total = n_vision + (1 if "projector" in needs else 0)
    full = build_flip_schedule(
        n_total, tcfg.total_steps, tcfg.warm_up, tcfg.rate_flip,
        tcfg.max_compete_in_iter, seed=tcfg.schedule_seed)
    vis = proj = None
    if "vision" in needs:
        vis = FlipSchedule(step_warm=full.step_warm,
                           flip_steps=full.flip_steps,
                           flips=full.flips[:n_vision])
    if "projector" in needs:
        proj = FlipSchedule(step_warm=full.step_warm,
                            flip_steps=full.flip_steps,
                            flips=full.flips[n_vision:])
    return vis, proj


def _top_label(path) -> str:
    names = [getattr(p, "key", "") for p in path]
    if names and names[0] == "mm_projector":
        return "projector"
    if names and names[0] == "vision_tower":
        return "vision"
    return "decoder"


def param_labels(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _top_label(path), params)


def make_mm_optimizer(tcfg: MMTrainConfig, params) -> optax.GradientTransformation:
    warmup = int(tcfg.warmup_ratio * tcfg.total_steps)

    def sched_for(lr):
        base = optax.cosine_decay_schedule(
            lr, max(tcfg.total_steps - warmup, 1), alpha=0.0) \
            if tcfg.lr_sched == "cos" else optax.constant_schedule(lr)
        if warmup > 0:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup), base], [warmup])
        return base

    def adamw(lr):
        if tcfg.opt_state_8bit:
            from .quant_opt import quantized_adamw
            inner = quantized_adamw(sched_for(lr), b1=0.9, b2=0.999,
                                    eps=1e-8,
                                    weight_decay=tcfg.weight_decay)
        else:
            inner = optax.adamw(sched_for(lr), b1=0.9, b2=0.999,
                                eps=1e-8,
                                weight_decay=tcfg.weight_decay)
        return optax.chain(
            optax.clip_by_global_norm(tcfg.grad_clip), inner)

    base_lr = tcfg.learning_rate
    proj_lr = tcfg.mm_projector_lr or base_lr
    if tcfg.stage == "pretrain":
        transforms = {
            "projector": adamw(proj_lr if tcfg.mm_projector_lr else 1e-3),
            "vision": optax.set_to_zero(),
            "decoder": optax.set_to_zero(),
        }
    else:
        transforms = {
            "projector": adamw(proj_lr),
            "vision": adamw(base_lr),
            "decoder": adamw(base_lr),
        }
    return optax.multi_transform(transforms, param_labels(params))


def make_mm_train_step(model: LlavaModel,
                       optimizer: optax.GradientTransformation,
                       donate: bool = True,
                       n_microbatch: int = 1) -> Callable:
    """Jitted multimodal train step.

    Sharding is positional, not explicit: run the returned function under a
    `Mesh` with `state.params` placed by `parallel.mesh.make_param_shardings`
    (experts on the 'expert' axis, dense params fsdp over 'data' — the
    ZeRO-3 + set_z3_leaf_modules analog of scripts/zero3.json +
    train/train.py:1480) and the batch placed by `batch_sharding`; jit
    propagates the shardings and XLA inserts the ICI collectives. With
    `parallel.ep_context` active, the MoE layers dispatch tokens over the
    expert axis via all-to-all instead of gathering expert weights.

    n_microbatch > 1 accumulates gradients over B/n_microbatch slices via
    lax.scan before one optimizer update — the reference's gradient
    accumulation in the forked trainer loop (llava_trainer.py:427-953).
    """

    def loss_for(params, step, batch):
        def loss_fn(params):
            out = model.apply(
                {"params": params}, batch["input_ids"],
                batch.get("images"), labels=batch["labels"],
                attention_mask=batch["attention_mask"], step=step,
                train=True)
            return out.loss, out
        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def step_fn(state: TrainState, batch: Dict[str, jax.Array]):
        if n_microbatch > 1:
            b = batch["input_ids"].shape[0]
            if b % n_microbatch:
                raise ValueError(f"batch {b} not divisible by "
                                 f"{n_microbatch} microbatches")
            micro = {k: v.reshape(n_microbatch, b // n_microbatch,
                                  *v.shape[1:])
                     for k, v in batch.items() if v is not None}

            def scan_body(carry, mb):
                acc_grads, acc = carry
                (loss, out), grads = loss_for(state.params, state.step, mb)
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads,
                                                   grads)
                acc = (acc[0] + loss, acc[1] + out.aux_mlp,
                       acc[2] + out.aux_clip)
                return (acc_grads, acc), None

            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            zeros = (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
            (grads, acc), _ = jax.lax.scan(scan_body, (zero_grads, zeros),
                                           micro)
            inv = 1.0 / n_microbatch
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            loss, aux_mlp, aux_clip = (a * inv for a in acc)
        else:
            (loss, out), grads = loss_for(state.params, state.step, batch)
            aux_mlp, aux_clip = out.aux_mlp, out.aux_clip

        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss/total": loss,
            "loss/aux_mlp": aux_mlp,
            "loss/aux_clip": aux_clip,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(params=new_params, opt_state=new_opt,
                          step=state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_mm_eval_step(model: LlavaModel) -> Callable:
    """Jitted `eval_step(params, batch) -> loss` for eval-during-training
    (the reference's _maybe_log_save_evaluate, llava_trainer.py:982-1021)."""

    def step_fn(params, batch):
        out = model.apply(
            {"params": params}, batch["input_ids"], batch.get("images"),
            labels=batch["labels"],
            attention_mask=batch["attention_mask"], train=False)
        return out.loss

    return jax.jit(step_fn)
