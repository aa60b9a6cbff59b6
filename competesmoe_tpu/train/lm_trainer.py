"""LM pretraining step: optimizer, LR schedules, jitted train/eval steps.

Re-design of `moe_pretrain_model/framework/task/{task,simple_task}.py`'s
loop internals as pure jitted functions:

- cosine LR + linear warmup (task.py:172-186 `set_lr` equivalents)
- bf16 forward with f32 params/optimizer (simple_task.py's autocast+scaler;
  bf16 needs no loss scaling on TPU)
- aux-reg collection folded into the loss (LayerRegularizer.get,
  regularized_layer.py:92-104)
- manual per-tensor grad all-reduce (simple_task.py:403-413) is subsumed by
  jit-over-mesh: gradients of replicated params are reduced by XLA.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.lm import MoELanguageModel, lm_loss_fn


@dataclasses.dataclass(frozen=True)
class OptConfig:
    """Mirrors the reference sweep's optimizer block
    (sweeps/slimpajama_moe_no_attmoe_154M_competesmoe.yaml: lr 2.5e-4,
    lr_sched cos, lr_warmup, grad clip)."""

    lr: float = 2.5e-4
    lr_sched: str = "cos"          # 'cos' | 'step' | 'constant'
    warmup_steps: int = 0
    total_steps: int = 100_000
    final_lr_fraction: float = 0.1
    grad_clip: float = 0.25
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    weight_decay: float = 0.0
    # hold Adam mu/nu blockwise-int8 (train/quant_opt.py); the 154M LM
    # fits a chip easily, but the flag keeps the two trainers symmetric
    state_8bit: bool = False


def make_lr_schedule(cfg: OptConfig) -> optax.Schedule:
    if cfg.lr_sched == "constant":
        base = optax.constant_schedule(cfg.lr)
    elif cfg.lr_sched == "cos":
        base = optax.cosine_decay_schedule(
            cfg.lr, max(cfg.total_steps - cfg.warmup_steps, 1),
            alpha=cfg.final_lr_fraction)
    else:
        raise ValueError(f"unknown lr_sched {cfg.lr_sched!r}")
    if cfg.warmup_steps > 0:
        warm = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
        return optax.join_schedules([warm, base], [cfg.warmup_steps])
    return base


def make_optimizer(cfg: OptConfig) -> optax.GradientTransformation:
    sched = make_lr_schedule(cfg)
    chain = []
    if cfg.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    if cfg.state_8bit:
        from .quant_opt import quantized_adamw
        chain.append(quantized_adamw(sched, b1=cfg.adam_b1,
                                     b2=cfg.adam_b2, eps=cfg.adam_eps,
                                     weight_decay=cfg.weight_decay))
    elif cfg.weight_decay > 0:
        chain.append(optax.adamw(sched, b1=cfg.adam_b1, b2=cfg.adam_b2,
                                 eps=cfg.adam_eps,
                                 weight_decay=cfg.weight_decay))
    else:
        chain.append(optax.adam(sched, b1=cfg.adam_b1, b2=cfg.adam_b2,
                                eps=cfg.adam_eps))
    return optax.chain(*chain)


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar

    @classmethod
    def create(cls, params, optimizer):
        return cls(params=params, opt_state=optimizer.init(params),
                   step=jnp.zeros((), jnp.int32))


def make_train_step(model: MoELanguageModel,
                    optimizer: optax.GradientTransformation,
                    ignore_index: int = -100,
                    donate: bool = True,
                    n_microbatch: int = 1) -> Callable:
    """Returns jitted `train_step(state, tokens) -> (state, metrics)`.

    tokens: [B, T+1] int32 — inputs tokens[:, :-1], targets tokens[:, 1:]
    (the reference's shift, language_model_interface.py:58-74).

    n_microbatch > 1 accumulates gradients over B/n_microbatch slices via
    lax.scan before one optimizer update (simple_task.py's run_ubatch
    microbatching, :286-312), keeping peak activation memory bounded.
    """

    def loss_for(params, step, tokens):
        inputs = tokens[:, :-1]
        targets = tokens[:, 1:]

        def loss_fn(params):
            logits, aux = model.apply({"params": params}, inputs,
                                      step=step, train=True)
            ce, n_tok = lm_loss_fn(logits, targets, ignore_index)
            total = ce + aux["total_aux_loss"]
            # distillation-health telemetry: router-vs-competition top-k
            # agreement, summed over layers that flipped this step
            # (layer channels are zero off-flip, so sums are exact).
            # Mirrors the reference's reg-loss scrape points
            # (framework/task/simple_task.py:341-352) with the one metric
            # it never logged.
            agree = jnp.zeros((), jnp.float32)
            ncomp = jnp.zeros((), jnp.float32)
            for k, v in aux.items():
                if k.endswith("router_agreement"):
                    agree = agree + v
                elif k.endswith("is_comp"):
                    ncomp = ncomp + v
            return total, (ce, aux["total_aux_loss"], n_tok, agree, ncomp)

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def step_fn(state: TrainState, tokens: jax.Array):
        if n_microbatch > 1:
            b = tokens.shape[0]
            if b % n_microbatch:
                raise ValueError(f"batch {b} not divisible by "
                                 f"{n_microbatch} microbatches")
            micro = tokens.reshape(n_microbatch, b // n_microbatch,
                                   *tokens.shape[1:])

            def scan_body(carry, mb):
                acc_grads, acc = carry
                (total, (ce, reg, n_tok, agree, ncomp)), grads = loss_for(
                    state.params, state.step, mb)
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                acc = (acc[0] + total, acc[1] + ce, acc[2] + reg,
                       acc[3] + n_tok, acc[4] + agree, acc[5] + ncomp)
                return (acc_grads, acc), None

            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            zeros = (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()),
                     jnp.zeros((), jnp.int32), jnp.zeros(()), jnp.zeros(()))
            (grads, acc), _ = jax.lax.scan(scan_body, (zero_grads, zeros),
                                           micro)
            inv = 1.0 / n_microbatch
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            total, ce, reg, n_tok = (acc[0] * inv, acc[1] * inv,
                                     acc[2] * inv, acc[3])
            # every microbatch sees the same step, hence the same flips:
            # un-sum so n_flip_layers reports true layer counts (the
            # agreement ratio is scale-invariant either way)
            agree, ncomp = acc[4] * inv, acc[5] * inv
        else:
            (total, (ce, reg, n_tok, agree, ncomp)), grads = loss_for(
                state.params, state.step, tokens)

        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss/total": total,
            "loss/ce": ce,
            "loss/reg": reg,
            "n_tokens": n_tok,
            "grad_norm": optax.global_norm(grads),
            # mean router-vs-competition top-k agreement over the layers
            # that flipped this step; -1 on non-flip steps (no layer
            # competed) so consumers can mask instead of seeing a fake 0
            "competesmoe/router_agreement": jnp.where(
                ncomp > 0, agree / jnp.maximum(ncomp, 1.0), -1.0),
            "competesmoe/n_flip_layers": ncomp,
        }
        new_state = TrainState(params=new_params, opt_state=new_opt,
                               step=state.step + 1)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model: MoELanguageModel,
                   ignore_index: int = -100) -> Callable:
    """Jitted `eval_step(params, tokens) -> (sum_nll, n_tokens)` for
    perplexity accumulation (task.py validation loop equivalent)."""

    def step_fn(params, tokens):
        inputs = tokens[:, :-1]
        targets = tokens[:, 1:]
        logits, _ = model.apply({"params": params}, inputs, train=False)
        ce, n_tok = lm_loss_fn(logits, targets, ignore_index)
        return ce * n_tok, n_tok

    return jax.jit(step_fn)
