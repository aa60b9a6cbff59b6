"""LoRA *training* for the multimodal stack.

Re-design of the reference's PEFT wiring (moe_model/train/train.py:1310-1340:
`LoraConfig(r, lora_alpha, target_modules=find_all_linear_names(model))` +
`get_peft_model`): instead of wrapping modules, LoRA lives as a separate
low-rank parameter pytree and is folded into the frozen base parameters
functionally inside the jitted loss — `W_eff = W + (alpha/r) * A @ B`.
Gradients flow only to the A/B factors; the base tree is a closed-over
constant the compiler keeps sharded/donated as usual.

The reference's `find_all_linear_names` (train.py:237-250) targets every
linear layer EXCEPT the vision tower and mm projector; `default_lora_filter`
mirrors that. Merging for export/serving reuses the same fold
(models/builder.py:merge_lora_checkpoint does the load-time equivalent).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .lm_trainer import TrainState

_EXCLUDE_TOP = ("vision_tower", "mm_projector")


def _path_names(path) -> Tuple[str, ...]:
    return tuple(str(getattr(p, "key", getattr(p, "idx", p)))
                 for p in path)


def default_lora_filter(names: Tuple[str, ...], leaf) -> bool:
    """Reference find_all_linear_names semantics: 2-D linear kernels
    outside the vision tower / mm projector, and never the lm_head
    (train.py:237-250 excludes the multimodal keys; train.py:264-265
    explicitly removes 'lm_head' from the target set, so adapter trees
    match reference PEFT checkpoints and don't adapt the large-vocab
    output head)."""
    return (len(names) >= 2 and names[-1] == "kernel"
            and getattr(leaf, "ndim", 0) == 2
            and names[0] not in _EXCLUDE_TOP
            and "lm_head" not in names)


def init_lora_params(params, rank: int, rng: jax.Array,
                     filter_fn: Callable = default_lora_filter,
                     dtype=jnp.float32) -> Dict[str, Dict[str, jax.Array]]:
    """Low-rank factor tree keyed by 'a/b/c'-joined param paths.

    A ~ N(0, 1/rank), B = 0 — the PEFT init (output delta starts at 0 so
    step 0 reproduces the base model exactly)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    lora: Dict[str, Dict[str, jax.Array]] = {}
    for path, leaf in flat:
        names = _path_names(path)
        if not filter_fn(names, leaf):
            continue
        rng, ka = jax.random.split(rng)
        d_in, d_out = leaf.shape
        lora["/".join(names)] = {
            "a": (jax.random.normal(ka, (d_in, rank), dtype)
                  / jnp.sqrt(rank)),
            "b": jnp.zeros((rank, d_out), dtype),
        }
    return lora


def apply_lora(params, lora: Dict[str, Dict[str, jax.Array]],
               scaling: float):
    """W_eff = W + scaling * A @ B at every adapted kernel (the
    merge_and_unload fold, done per-step inside jit)."""
    def upd(path, leaf):
        key = "/".join(_path_names(path))
        ab = lora.get(key)
        if ab is None:
            return leaf
        delta = (ab["a"] @ ab["b"]) * scaling
        return leaf + delta.astype(leaf.dtype)
    return jax.tree_util.tree_map_with_path(upd, params)


def lora_scaling(rank: int, alpha: float) -> float:
    return alpha / rank


def make_mm_lora_train_step(model, optimizer: optax.GradientTransformation,
                            scaling: float, donate: bool = True,
                            n_microbatch: int = 1) -> Callable:
    """Jitted LoRA train step: state.params is the LoRA factor tree; the
    frozen base params are a separate argument (sharded like full training;
    XLA re-materializes W_eff = W + sAB at use sites, so base weights are
    never duplicated in optimizer state).

    n_microbatch > 1 accumulates factor gradients over B/n_microbatch
    slices via lax.scan before one optimizer update — same semantics as
    make_mm_train_step (the reference trainer's gradient accumulation,
    llava_trainer.py:427-953, applies to PEFT runs too)."""

    def loss_for(lora, base_params, step, batch):
        def loss_fn(lora):
            eff = apply_lora(base_params, lora, scaling)
            out = model.apply(
                {"params": eff}, batch["input_ids"], batch.get("images"),
                labels=batch["labels"],
                attention_mask=batch["attention_mask"], step=step,
                train=True)
            return out.loss, out
        return jax.value_and_grad(loss_fn, has_aux=True)(lora)

    def step_fn(state: TrainState, base_params, batch):
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
                (loss, out), grads = loss_for(state.params, base_params,
                                              state.step, mb)
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
            (loss, out), grads = loss_for(state.params, base_params,
                                          state.step, batch)
            aux_mlp, aux_clip = out.aux_mlp, out.aux_clip
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_lora = optax.apply_updates(state.params, updates)
        metrics = {
            "loss/total": loss,
            "loss/aux_mlp": aux_mlp,
            "loss/aux_clip": aux_clip,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(params=new_lora, opt_state=new_opt,
                          step=state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
