"""Process-global sequence-parallel (context-parallel) mesh context.

Mirror of `ep_context` for the sequence axis: activating a mesh whose
`seq` axis is >1 makes `models.lm.FastRopeAttention` route plain causal
self-attention through `parallel.ring_attention` (K/V blocks rotating
over ICI) instead of materializing the full [B, h, T, T] score matrix on
one chip. Everything else in the model stays globally written — XLA
partitions it from the operand shardings.

The reference has no sequence parallelism of any kind (SURVEY §2h).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

from jax.sharding import Mesh

_SEQ_MESH: Optional[Mesh] = None
_SEQ_AXIS = "seq"


def set_seq_mesh(mesh: Optional[Mesh], seq_axis: str = "seq") -> None:
    global _SEQ_MESH, _SEQ_AXIS
    if mesh is not None and seq_axis not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no {seq_axis!r} axis")
    _SEQ_MESH = mesh
    _SEQ_AXIS = seq_axis


def current_seq_mesh() -> Optional[Mesh]:
    if _SEQ_MESH is not None and _SEQ_MESH.shape[_SEQ_AXIS] > 1:
        return _SEQ_MESH
    return None


def seq_axis() -> str:
    return _SEQ_AXIS


@contextmanager
def use_sequence_parallel(mesh: Mesh, seq_axis: str = "seq"):
    prev, prev_axis = _SEQ_MESH, _SEQ_AXIS
    set_seq_mesh(mesh, seq_axis)
    try:
        yield
    finally:
        set_seq_mesh(prev, prev_axis)
