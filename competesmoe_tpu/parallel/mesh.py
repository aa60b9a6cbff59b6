"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's NCCL substrate
(moe_pretrain_model/framework/helpers/distributed.py, SURVEY.md §2h):
one global jit program over a Mesh with axes

  data   — batch (data parallel; gradient reduction compiled by XLA)
  expert — expert parallel: every stacked expert tensor ([E, ...] leading
           dim) is sharded over this axis, so expert dispatch becomes XLA
           all-to-all over ICI instead of replicated expert weights.

The reference replicates experts per rank and only synchronizes aux losses
(distributed_ops.py); expert sharding here is the first-class upgrade the
north star asks for.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Parameter names whose leading dim is the expert dim.
EXPERT_PARAM_NAMES = (
    "keys", "values", "bias",
    "experts_w1", "experts_b1", "experts_w2", "experts_b2",
    "experts_w3",  # Mixtral SwiGLU gate bank (MixtralMoELayer)
)


def make_mesh(n_expert: int = 1, devices: Optional[Sequence] = None,
              n_seq: int = 1) -> Mesh:
    """Mesh with ('data', 'expert') axes; expert axis size n_expert.
    n_seq > 1 adds a trailing 'seq' axis for sequence/context
    parallelism (ring attention, parallel/ring_attention.py)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % (n_expert * n_seq) != 0:
        raise ValueError(f"{n} devices not divisible by "
                         f"expert={n_expert} x seq={n_seq}")
    if n_seq > 1:
        arr = np.asarray(devices).reshape(n // (n_expert * n_seq),
                                          n_expert, n_seq)
        return Mesh(arr, ("data", "expert", "seq"))
    arr = np.asarray(devices).reshape(n // n_expert, n_expert)
    return Mesh(arr, ("data", "expert"))


def param_spec(path_names: Sequence[str], leaf,
               fsdp_size: int = 1, fsdp_min_size: int = 2**16) -> P:
    """Sharding rule for one parameter, keyed by its path.

    fsdp_size > 1 additionally shards DENSE parameters over the 'data'
    axis (largest dim divisible by the axis; small params stay
    replicated) — the ZeRO-3 / fully-sharded analog of the reference's
    DeepSpeed configs (scripts/zero3.json): XLA all-gathers each weight
    at its use site and keeps gradients + optimizer state sharded, while
    expert tensors keep their dedicated 'expert' axis (the set_z3_leaf
    role: experts are never gathered, tokens travel instead)."""
    name = path_names[-1] if path_names else ""
    if name in EXPERT_PARAM_NAMES and leaf.ndim >= 1:
        return P("expert", *([None] * (leaf.ndim - 1)))
    if fsdp_size > 1 and leaf.ndim >= 1 and leaf.size >= fsdp_min_size:
        for i in sorted(range(leaf.ndim), key=lambda i: -leaf.shape[i]):
            if leaf.shape[i] % fsdp_size == 0:
                spec = [None] * leaf.ndim
                spec[i] = "data"
                return P(*spec)
    return P()


def make_param_shardings(mesh: Mesh, params, fsdp: bool = False,
                         fsdp_min_size: int = 2**16):
    """Pytree of NamedShardings for a model's params. fsdp=True shards
    dense params over the 'data' axis (see param_spec); params smaller
    than fsdp_min_size stay replicated (gather overhead beats the
    memory saving for small tensors)."""
    fsdp_size = mesh.shape["data"] if fsdp else 1

    def to_spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p)))
                 for p in path]
        return NamedSharding(mesh, param_spec(names, leaf, fsdp_size,
                                              fsdp_min_size))
    return jax.tree_util.tree_map_with_path(to_spec, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the batch dim over the full mesh (data-major). Using both axes
    for the batch keeps all devices busy on non-expert ops while expert
    tensors live on the expert axis."""
    return NamedSharding(mesh, P(("data", "expert")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_batch(batch, mesh: Mesh,
              sharding: Optional[NamedSharding] = None):
    """Multi-host-safe batch placement.

    `jax.device_put(host_array, sharding)` requires every device in the
    sharding to be addressable — fine on one host, an error on a
    multi-host mesh. Every host builds the same global batch (the
    samplers are deterministic in the seed, the reference's
    DatasetSplitter role), and `make_array_from_callback` slices out
    just this host's addressable shards. Single-host behavior is
    identical to device_put (asserted in tests/test_fsdp.py)."""
    sharding = sharding or batch_sharding(mesh)
    arr = np.asarray(batch)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def shard_params(params, mesh: Mesh):
    """Device_put params according to the expert/replicated rules."""
    return jax.device_put(params, make_param_shardings(mesh, params))


# ---------------------------------------------------------------------------
# Tensor parallelism for the (dense) decoder — the 5.1B-on-v5e-8 story
# ---------------------------------------------------------------------------

def make_tp_mesh(n_model: int = 1,
                 devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with ('data', 'model') axes for tensor-parallel decode."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % n_model != 0:
        raise ValueError(f"{n} devices not divisible by model={n_model}")
    arr = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(arr, ("data", "model"))


# Megatron-style column/row parallel rules for the llama/phi decoder
# (models/decoder.py param names). Column-parallel layers shard their
# OUTPUT features; row-parallel layers shard their INPUT features, and
# XLA inserts the psum on the residual add.
_TP_COL = ("qkv_proj", "q_proj", "k_proj", "v_proj",
           "gate_up_proj", "gate_proj", "up_proj", "lm_head")
_TP_ROW = ("o_proj", "down_proj")


def decoder_param_spec(path_names: Sequence[str], leaf) -> P:
    """Tensor-parallel PartitionSpec for one decoder parameter."""
    module = path_names[-2] if len(path_names) >= 2 else ""
    name = path_names[-1] if path_names else ""
    if module in _TP_COL:
        if name == "kernel" and leaf.ndim == 2:
            return P(None, "model")
        if name == "bias" and leaf.ndim == 1:
            return P("model")
    if module in _TP_ROW and name == "kernel" and leaf.ndim == 2:
        return P("model", None)
    # MoE FFN expert stacks ([E, ...]) shard over the model axis too when
    # the decoder carries registry-MoE blocks
    if name in EXPERT_PARAM_NAMES and leaf.ndim >= 1:
        return P("model", *([None] * (leaf.ndim - 1)))
    return P()


def decoder_param_shardings(mesh: Mesh, params):
    def to_spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p)))
                 for p in path]
        return NamedSharding(mesh, decoder_param_spec(names, leaf))
    return jax.tree_util.tree_map_with_path(to_spec, params)


def llava_param_shardings(mesh: Mesh, params):
    """Tensor-parallel shardings for a full LlavaModel param tree: the
    decoder ('language_model' subtree) gets the Megatron column/row specs
    above; the vision tower + projector (a few hundred MB at 5.1B) stay
    replicated — they run once per request while the decoder runs per
    token, so sharding them buys nothing and costs gather latency.

    This is the serve/eval sharded-inference role of the reference
    (evaluate/lmms_eval/models/llava.py:161-169's device_map splitting,
    done as real tensor parallelism instead of naive layer placement)."""
    def to_spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p)))
                 for p in path]
        if names and names[0] == "language_model":
            return NamedSharding(mesh, decoder_param_spec(names, leaf))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(to_spec, params)


def ep_param_shardings(mesh: Mesh, params):
    """Expert-parallel INFERENCE shardings for a full model tree: every
    stacked expert bank ([E, ...] leading dim) shards over the mesh's
    'expert' axis, everything else replicates. Pair with
    `parallel.ep_context.use_expert_parallel(mesh)` around the jit trace
    so MoE dispatch runs the explicit all-to-all path — this is
    BASELINE.json config #5's "expert-parallel over ICI" serving/eval
    layout, the sharded upgrade of the reference's replicated-expert
    eval role (evaluate/lmms_eval/models/llava.py:139-169).

    ndim >= 2 guards the walk: 1-D params named 'bias' (layernorms,
    gates) are never expert banks."""
    n_ep = mesh.shape["expert"]

    def to_spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p)))
                 for p in path]
        name = names[-1] if names else ""
        if (name in EXPERT_PARAM_NAMES and leaf.ndim >= 2
                and leaf.shape[0] % n_ep == 0):
            return NamedSharding(
                mesh, P("expert", *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(to_spec, params)


def kv_cache_sharding(mesh: Mesh) -> NamedSharding:
    """KV cache [L, B, max_len, kv_heads, head_dim]: batch over 'data',
    kv heads over 'model' (each shard attends with its own heads)."""
    return NamedSharding(mesh, P(None, "data", None, "model", None))
