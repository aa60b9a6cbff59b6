"""Process-global expert-parallel context.

The MoE layers are flax modules constructed from hashable configs, so the
device mesh can't live on the module itself. Instead the training task (or
a test) activates expert parallelism for the process with `set_ep_mesh` /
`use_expert_parallel`, and `ops.expert_compute.moe_ffn_*` consult
`current_ep_mesh()` at trace time: with an active mesh whose `expert` axis
is >1, `impl='auto'` (and `impl='ep'`) dispatch through the shard_map
all-to-all path in `parallel.expert_parallel` instead of relying on XLA
auto-sharding of replicated-token compute.

This replaces the reference's implicit "experts replicated per rank"
layout (SURVEY.md §2h, Expert parallel row) with true expert sharding.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

from jax.sharding import Mesh

_EP_MESH: Optional[Mesh] = None
_DATA_AXIS = "data"
_EXPERT_AXIS = "expert"


def set_ep_mesh(mesh: Optional[Mesh], data_axis: str = "data",
                expert_axis: str = "expert") -> None:
    """Activate (or with None, deactivate) expert parallelism globally."""
    global _EP_MESH, _DATA_AXIS, _EXPERT_AXIS
    if mesh is not None:
        if expert_axis not in mesh.axis_names:
            raise ValueError(
                f"mesh {mesh.axis_names} has no {expert_axis!r} axis")
    _EP_MESH = mesh
    _DATA_AXIS = data_axis
    _EXPERT_AXIS = expert_axis


def current_ep_mesh() -> Optional[Mesh]:
    """The active EP mesh, or None if the expert axis is trivial/absent."""
    if _EP_MESH is not None and _EP_MESH.shape[_EXPERT_AXIS] > 1:
        return _EP_MESH
    return None


def ep_axes() -> tuple:
    return _DATA_AXIS, _EXPERT_AXIS


@contextmanager
def use_expert_parallel(mesh: Mesh, data_axis: str = "data",
                        expert_axis: str = "expert"):
    """Scoped activation (tests / one-off jit traces)."""
    prev, prev_axes = _EP_MESH, (_DATA_AXIS, _EXPERT_AXIS)
    set_ep_mesh(mesh, data_axis, expert_axis)
    try:
        yield
    finally:
        set_ep_mesh(prev, *prev_axes)
