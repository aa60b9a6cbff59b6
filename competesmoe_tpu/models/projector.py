"""Multimodal projector: linear / mlpNx_gelu / MoE / identity.

Re-design of `moe_model/model/multimodal_projector/builder.py:26-99`.
The MoE variant (`MLPMoE`) wraps a registry routing layer whose experts are
Sequential(Linear(mm_channels, channels), GELU, Linear(channels, channels))
— exactly our MoeLayerBase default expert geometry.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..moe.config import MoEArgs
from ..moe.layers import MoEAux, gelu_exact, zero_aux
from ..moe.registry import get_moe


@dataclasses.dataclass(frozen=True)
class ProjectorConfig:
    projector_type: str = "moe"        # linear | mlpNx_gelu | moe | identity
    mm_hidden_size: int = 1152
    hidden_size: int = 3072
    n_scales: int = 1                  # len(config.scales) for S²
    moe_name: str = "smoe"
    num_experts: int = 4
    num_selected: int = 2
    moe_args: MoEArgs = MoEArgs()
    dtype: Any = jnp.float32

    @property
    def mm_channels(self) -> int:
        return self.mm_hidden_size * self.n_scales


def _moe_schedule_kwargs(moe_cls, flip_schedule):
    """Constructor kwargs wiring a FlipSchedule into a registry layer
    that supports competition (CompeteSMoELayer: flip_schedule row 0 +
    step_warm; competesmoe.py:347's `current_steps >= step_warm and
    prob_flips[current_steps - step_warm]`). Other layers get nothing."""
    fields = getattr(moe_cls, "__dataclass_fields__", {})
    if flip_schedule is None or "step_warm" not in fields:
        return {}
    return {"flip_schedule": flip_schedule.flips[0],
            "step_warm": flip_schedule.step_warm}


class MLPMoE(nn.Module):
    """MoE projector (builder.py:47-77)."""

    cfg: ProjectorConfig
    flip_schedule: Any = dataclasses.field(
        default=None, compare=False, hash=False)

    def setup(self):
        cfg = self.cfg
        moe_cls = get_moe(cfg.moe_name)
        self.moelayer = moe_cls(
            in_dim=cfg.mm_channels, out_dim=cfg.hidden_size,
            n_experts=cfg.num_experts, n_selected=cfg.num_selected,
            args=cfg.moe_args,
            **_moe_schedule_kwargs(moe_cls, self.flip_schedule))

    def __call__(self, x, *, step=None, train=False,
                 return_id_experts=False):
        return self.moelayer(x, step=step, train=train,
                             return_id_experts=return_id_experts)


class VisionProjector(nn.Module):
    """Dispatch on projector_type (builder.py:79-99). Returns (y, MoEAux)."""

    cfg: ProjectorConfig
    flip_schedule: Any = dataclasses.field(
        default=None, compare=False, hash=False)

    def setup(self):
        cfg = self.cfg
        t = cfg.projector_type
        if t == "moe":
            # named `moelayer` to match the released checkpoints' param
            # paths (mm_projector.moelayer.*)
            moe_cls = get_moe(cfg.moe_name)
            self.moelayer = moe_cls(
                in_dim=cfg.mm_channels, out_dim=cfg.hidden_size,
                n_experts=cfg.num_experts, n_selected=cfg.num_selected,
                args=cfg.moe_args,
                **_moe_schedule_kwargs(moe_cls, self.flip_schedule))
        elif t == "linear":
            self.fc = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc")
        elif t == "identity":
            pass
        else:
            m = re.match(r"^mlp(\d+)x_gelu$", t)
            if not m:
                raise ValueError(f"Unknown projector type: {t}")
            depth = int(m.group(1))
            self.mlp_layers = [nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                                        name=f"mlp_{i}")
                               for i in range(depth)]

    def __call__(self, x, *, step=None, train=False,
                 return_id_experts=False) -> Tuple[jax.Array, MoEAux]:
        cfg = self.cfg
        t = cfg.projector_type
        if t == "moe":
            return self.moelayer(x, step=step, train=train,
                                 return_id_experts=return_id_experts)
        if t == "identity":
            return x, zero_aux(x)
        if t == "linear":
            return self.fc(x), zero_aux(x)
        h = x
        for i, layer in enumerate(self.mlp_layers):
            if i > 0:
                h = gelu_exact(h)
            h = layer(h)
        return h, zero_aux(h)
