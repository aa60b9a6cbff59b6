"""String-keyed MoE layer registries.

Two registries mirror the reference's two trees:
- `register_moe` / `get_moe` — the "multimodal" zoo (2-layer GELU experts;
  ref moe_model/model/moe/register.py:4-22)
- `register_pretrain_moe` / `get_pretrain_moe` — the MoEUT-style zoo
  (stacked keys/values experts; ref moe_pretrain_model/layers/moe/register.py)
"""

from __future__ import annotations

from typing import Dict, Type

MOE_REGISTRY: Dict[str, type] = {}
PRETRAIN_MOE_REGISTRY: Dict[str, type] = {}


def _register(registry: Dict[str, type], names):
    def decorate(cls):
        for name in names:
            existing = registry.get(name)
            if existing is not None and existing is not cls:
                raise ValueError(
                    f"MoE name {name!r} already registered to {existing!r}")
            registry[name] = cls
        return cls
    return decorate


def register_moe(*names):
    return _register(MOE_REGISTRY, names)


def register_pretrain_moe(*names):
    return _register(PRETRAIN_MOE_REGISTRY, names)


def _get(registry: Dict[str, type], name: str, kind: str) -> Type:
    try:
        return registry[name]
    except KeyError:
        raise ValueError(
            f"Unknown {kind} MoE {name!r}. Registered: "
            f"{', '.join(sorted(registry))}") from None


def get_moe(name: str) -> Type:
    return _get(MOE_REGISTRY, name, "multimodal")


def get_pretrain_moe(name: str) -> Type:
    return _get(PRETRAIN_MOE_REGISTRY, name, "pretrain")
