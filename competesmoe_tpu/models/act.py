"""Adaptive Computation Time wrapper (Sparse Universal Transformer).

Re-design of `moe_pretrain_model/layers/transformer/halting.py` +
the `ACTWrapper` used by the "act" transformer variants
(tasks/transformer_lm_mixin.py:177-179): a shared block is pondered up to
`max_steps` times per token; a sigmoid halting unit accumulates
probability mass, tokens stop contributing once they cross the threshold,
and the output is the halting-weighted mix of intermediate states.
The ponder cost (N(t) + remainder, Graves 2016) is returned as an aux
loss scaled by `act_loss` (transformer.act_loss flag).

Static-shape formulation: always runs `max_steps` block applications with
masks (no data-dependent trip counts — jit-friendly; halted tokens'
updates are masked out of the weighted sum).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..moe.layers import MoEAux


class ACTBlock(nn.Module):
    """Ponder a (usually parameter-shared) block with ACT halting."""

    block: nn.Module
    max_steps: int = 4
    threshold: float = 0.99
    act_loss_coef: float = 0.0

    @nn.compact
    def __call__(self, x, step=None, train: bool = False, flips=None,
                 prev_state=None, pos_offset: int = 0,
                 return_id_experts: bool = False
                 ) -> Tuple[jax.Array, MoEAux]:
        # signature mirrors MoETransformerBlock so the LM's positional
        # block call (required by nn.remat's static_argnums) works for
        # ACT-wrapped blocks too
        block_kwargs = dict(step=step, train=train, flips=flips,
                            prev_state=prev_state, pos_offset=pos_offset,
                            return_id_experts=return_id_experts)
        B, T, D = x.shape
        halt_dense = nn.Dense(1, name="halting",
                              kernel_init=nn.initializers.zeros,
                              bias_init=nn.initializers.constant(1.0))

        acc = jnp.zeros((B, T), jnp.float32)
        remainders = jnp.zeros((B, T), jnp.float32)
        n_updates = jnp.zeros((B, T), jnp.float32)
        out = jnp.zeros_like(x)
        state = x
        total_aux = jnp.zeros((), jnp.float32)
        losses: Dict[str, jax.Array] = {}

        for step_i in range(self.max_steps):
            p = jax.nn.sigmoid(
                halt_dense(state.astype(jnp.float32))[..., 0])
            still = acc < self.threshold
            last = step_i == self.max_steps - 1
            crossing = still & ((acc + p >= self.threshold) | last)
            use_p = jnp.where(crossing, 1.0 - acc, p)
            use_p = jnp.where(still, use_p, 0.0)

            new_state, aux = self.block(state, **block_kwargs)
            out = out + use_p[..., None].astype(x.dtype) * new_state
            remainders = remainders + jnp.where(crossing, 1.0 - acc, 0.0)
            n_updates = n_updates + still.astype(jnp.float32)
            acc = acc + use_p
            state = new_state
            total_aux = total_aux + aux.aux_loss
            for k, v in aux.losses.items():
                losses[f"ponder{step_i}/{k}"] = v

        ponder_cost = jnp.mean(n_updates + remainders)
        total = total_aux + self.act_loss_coef * ponder_cost
        losses["ponder_cost"] = jax.lax.stop_gradient(ponder_cost)
        return out, MoEAux(aux_loss=total, losses=losses)
