"""Blockwise 8-bit Adam state: the memory lever that fits the reference's
seq-2048 sft geometry on v5e-8.

The round-4 memory envelope (docs/sharding.md, tools/memory_envelope.py)
measured the 5.1B sft at seq 2048 / per-chip batch 1 / remat missing the
v5e's 15.75 GB by 0.28 GB: static 9.32 GB/chip of that is bf16 params +
Adam mu/nu (3 x 3.11 GB). Storing mu and nu at 1 byte/element instead of
2 removes ~1.56 GB/chip for every fsdp layout — arithmetic, not tuning —
which flips the row to fits.

Design (Dettmers et al., "8-bit Optimizers via Block-wise Quantization",
arXiv 2110.02861, is the precedent that blockwise-8-bit Adam matches
fp32 Adam on LM training; this is an independent TPU-shaped
implementation, not a port):

* mu (signed): blockwise absmax linear int8 along the leaf's LAST dim,
  `scale = max|x| / 127` per block, `q = round(x / scale)`.
* nu (non-negative): quantize sqrt(nu) — halving the dynamic range a
  block must span — as uint8-range int16-free trick: scale =
  max(sqrt(nu))/255, q stored in uint8. Dequant squares back.
* q keeps the PARAM'S EXACT SHAPE (int8/uint8), scales have shape
  `param.shape[:-1] + (ceil(d/block),)`. Under pjit the state therefore
  inherits the param's PartitionSpec by GSPMD propagation exactly like
  the bf16 moments do (cli/train_mm.py creates opt state inside the mesh
  context and lets jit place it), so the saving is per chip.
* leaves smaller than `min_quant_size` stay in their float dtype
  (negligible bytes; avoids degenerate blocks). Ragged last dims are
  handled by padding only inside the quantizer (static shapes).

Reference role: the optimizer states DeepSpeed ZeRO-3 shards in the sft
recipe (/root/reference/scripts/zero3.json, scripts/train/phi35mini/
siglip/sft.sh trains seq 2048 on A100-80GB; on 16 GB v5e chips the same
recipe needs this lever). Enabled by `--opt-state-8bit` in
cli/train_mm.py and `-opt.state_8bit 1` in the LM CLI.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class QuantLeaf(NamedTuple):
    """One quantized moment leaf: codes in the param's shape + blockwise
    scales. `q.dtype` is int8 (signed payload) or uint8 (sqrt(nu))."""

    q: jax.Array
    scale: jax.Array


class ScaleByQuantAdamState(NamedTuple):
    count: jax.Array
    mu: object  # tree: QuantLeaf | raw float array (small leaves)
    nu: object  # tree: QuantLeaf | raw float array


def _blocked(x: jax.Array, block: int):
    """[..., d] -> ([..., nb, block] zero-padded, d)."""
    d = x.shape[-1]
    nb = -(-d // block)
    pad = nb * block - d
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x.reshape(*x.shape[:-1], nb, block), d


def _unblocked(xb: jax.Array, d: int):
    out = xb.reshape(*xb.shape[:-2], xb.shape[-2] * xb.shape[-1])
    return out[..., :d]


def quantize_signed(x: jax.Array, block: int) -> QuantLeaf:
    xb, d = _blocked(x.astype(jnp.float32), block)
    scale = jnp.max(jnp.abs(xb), axis=-1) / 127.0
    safe = jnp.maximum(scale, 1e-30)
    q = jnp.round(xb / safe[..., None]).astype(jnp.int8)
    return QuantLeaf(q=_unblocked(q, d), scale=scale)


def dequantize_signed(leaf: QuantLeaf, block: int) -> jax.Array:
    qb, d = _blocked(leaf.q.astype(jnp.float32), block)
    return _unblocked(qb * leaf.scale[..., None], d)


def quantize_sqrt(x: jax.Array, block: int) -> QuantLeaf:
    """Non-negative x stored as uint8 codes of sqrt(x)."""
    r = jnp.sqrt(x.astype(jnp.float32))
    rb, d = _blocked(r, block)
    scale = jnp.max(rb, axis=-1) / 255.0
    safe = jnp.maximum(scale, 1e-30)
    q = jnp.round(rb / safe[..., None]).astype(jnp.uint8)
    return QuantLeaf(q=_unblocked(q, d), scale=scale)


def dequantize_sqrt(leaf: QuantLeaf, block: int) -> jax.Array:
    qb, d = _blocked(leaf.q.astype(jnp.float32), block)
    r = _unblocked(qb * leaf.scale[..., None], d)
    return r * r


def _is_quant(leaf) -> bool:
    return isinstance(leaf, QuantLeaf)


def scale_by_quant_adam(b1: float = 0.9, b2: float = 0.999,
                        eps: float = 1e-8, block: int = 256,
                        min_quant_size: int = 4096,
                        ) -> optax.GradientTransformation:
    """optax.scale_by_adam with mu/nu held in blockwise 8-bit between
    steps (dequant -> moment update -> requant each step; the update
    direction itself is computed in f32)."""

    def _quantizable(p) -> bool:
        return (jnp.issubdtype(p.dtype, jnp.floating)
                and p.size >= min_quant_size and p.ndim >= 1)

    def init_fn(params):
        def init_mu(p):
            if _quantizable(p):
                return quantize_signed(jnp.zeros(p.shape, jnp.float32),
                                       block)
            return jnp.zeros_like(p)

        def init_nu(p):
            if _quantizable(p):
                return quantize_sqrt(jnp.zeros(p.shape, jnp.float32),
                                     block)
            return jnp.zeros_like(p)

        return ScaleByQuantAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(init_mu, params),
            nu=jax.tree_util.tree_map(init_nu, params))

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)

        def upd(g, mu_leaf, nu_leaf):
            g32 = g.astype(jnp.float32)
            quant = _is_quant(mu_leaf)
            mu = (dequantize_signed(mu_leaf, block) if quant
                  else mu_leaf.astype(jnp.float32))
            nu = (dequantize_sqrt(nu_leaf, block) if quant
                  else nu_leaf.astype(jnp.float32))
            mu = b1 * mu + (1.0 - b1) * g32
            nu = b2 * nu + (1.0 - b2) * g32 * g32
            mu_hat = mu / (1.0 - b1 ** count.astype(jnp.float32))
            nu_hat = nu / (1.0 - b2 ** count.astype(jnp.float32))
            direction = mu_hat / (jnp.sqrt(nu_hat) + eps)
            new_mu = (quantize_signed(mu, block) if quant
                      else mu.astype(mu_leaf.dtype))
            new_nu = (quantize_sqrt(nu, block) if quant
                      else nu.astype(nu_leaf.dtype))
            return direction.astype(g.dtype), new_mu, new_nu

        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [upd(g, m, n) for g, m, n in zip(flat_g, flat_mu, flat_nu)]
        directions = treedef.unflatten([o[0] for o in out])
        new_mu = treedef.unflatten([o[1] for o in out])
        new_nu = treedef.unflatten([o[2] for o in out])
        return directions, ScaleByQuantAdamState(count, new_mu, new_nu)

    return optax.GradientTransformation(init_fn, update_fn)


def quantized_adamw(learning_rate, b1: float = 0.9, b2: float = 0.999,
                    eps: float = 1e-8, weight_decay: float = 0.0,
                    block: int = 256, min_quant_size: int = 4096,
                    mask: Optional[object] = None,
                    ) -> optax.GradientTransformation:
    """Drop-in for optax.adamw with 8-bit moment storage (same transform
    order: adam scaling -> decoupled weight decay -> lr)."""
    return optax.chain(
        scale_by_quant_adam(b1=b1, b2=b2, eps=eps, block=block,
                            min_quant_size=min_quant_size),
        optax.add_decayed_weights(weight_decay, mask),
        optax.scale_by_learning_rate(learning_rate))


def state_bytes(tree) -> int:
    """Total bytes of an opt-state tree (QuantLeaf-aware) — the number
    the memory envelope prices."""
    return sum(l.size * l.dtype.itemsize
               for l in jax.tree_util.tree_leaves(tree)
               if hasattr(l, "dtype"))
