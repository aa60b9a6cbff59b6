"""Ring attention: causal self-attention with the sequence sharded over a
mesh axis (context parallelism).

The reference has NO long-context mechanism at all (SURVEY.md §5
"Long-context: none" — fixed `lm.unroll` windows plus an optional
Transformer-XL carry). This module is the TPU-native capability that
removes the single-chip HBM ceiling on sequence length: each device holds
a [B, T/n, h, p] slice of q/k/v, K/V blocks rotate around the ICI ring
(`lax.ppermute`), and outputs accumulate with the flash-attention online
softmax — activation memory per chip stays O(T/n · T/n) while the math is
exactly full causal attention.

Design notes (scaling-book context-parallelism recipe):
- The rotation is a static python loop of n_shards steps: each step is a
  [B, h, T/n, T/n] block matmul (MXU) plus one neighbor ppermute (ICI).
  XLA overlaps the permute with the next block's compute.
- Causal masking is by *global* block offset: shard i's queries attend
  shard j's keys fully when j < i, diagonally when j == i, not at all
  when j > i. Fully-masked blocks keep the online-softmax state unchanged
  (their exp terms are exactly zero), so correctness needs no dynamic
  skipping; the cost of the wasted half is the standard non-load-balanced
  ring (a zigzag layout is a future optimization).
- Accumulation in f32 regardless of input dtype (the flash kernel's
  convention); the returned dtype matches the input.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

NEG_INF = float("-inf")


def _online_block(q_scaled, kb, vb, m, l, o, qpos, kpos, causal):
    """One online-softmax accumulation step over a K/V block.

    q_scaled: [B, h, Tq, p] (already scaled); kb/vb: [B, h, Tk, p];
    m/l: [B, h, Tq]; o: [B, h, Tq, p] f32; qpos/kpos: [Tq]/[Tk] global
    positions. Returns updated (m, l, o).
    """
    scores = jnp.einsum("bhqp,bhkp->bhqk", q_scaled, kb,
                        preferred_element_type=jnp.float32)
    if causal:
        mask = kpos[None, :] <= qpos[:, None]
        scores = jnp.where(mask[None, None], scores, NEG_INF)
    m_new = jnp.maximum(m, scores.max(axis=-1))
    # a fully-masked block leaves m_new at -inf: substitute any finite
    # value for the exp shifts — every exp() below is then exactly 0
    m_use = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
    p_ = jnp.exp(scores - m_use[..., None])
    alpha = jnp.exp(m - m_use)
    l = l * alpha + p_.sum(axis=-1)
    o = o * alpha[..., None] + jnp.einsum(
        "bhqk,bhkp->bhqp", p_.astype(vb.dtype), vb,
        preferred_element_type=jnp.float32)
    return m_new, l, o


def make_ring_attention(mesh: Mesh, seq_axis: str = "seq",
                        causal: bool = True):
    """Build fn(q, k, v) -> out, all [B, T, h, p] with T sharded over
    `seq_axis` (other dims replicated or sharded on other axes by the
    caller's jit). Exact full (causal) attention; memory per chip is
    O((T/n)^2) scores instead of O(T^2)."""
    spec = P(None, seq_axis, None, None)
    n = mesh.shape[seq_axis]

    @partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
             out_specs=spec, check_vma=False)
    def ring(q, k, v):
        B, Tl, h, p = q.shape
        me = jax.lax.axis_index(seq_axis)
        scale = 1.0 / math.sqrt(p)
        # [B, h, Tl, p] block layout
        qs = (q.transpose(0, 2, 1, 3) * jnp.asarray(scale, q.dtype))
        kb = k.transpose(0, 2, 1, 3)
        vb = v.transpose(0, 2, 1, 3)

        m = jnp.full((B, h, Tl), NEG_INF, jnp.float32)
        l = jnp.zeros((B, h, Tl), jnp.float32)
        o = jnp.zeros((B, h, Tl, p), jnp.float32)
        loc = jnp.arange(Tl)
        qpos = me * Tl + loc
        perm = [(i, (i + 1) % n) for i in range(n)]
        for s in range(n):
            src = (me - s) % n        # whose K/V block we hold this step
            kpos = src * Tl + loc
            m, l, o = _online_block(qs, kb, vb, m, l, o, qpos, kpos,
                                    causal)
            if s < n - 1:
                kb = jax.lax.ppermute(kb, seq_axis, perm)
                vb = jax.lax.ppermute(vb, seq_axis, perm)
        out = o / l[..., None]
        return out.astype(q.dtype).transpose(0, 2, 1, 3)

    return ring


def make_ring_attention_masked(mesh: Mesh, seq_axis: str = "seq"):
    """Ring attention with caller-supplied per-token positions and
    validity — the padded-batch form the multimodal decoder needs
    (splice-padded rows, per-row position ids).

    Returns fn(q, k, v, qpos, kpos, kvalid) -> out where q/k/v are
    [B, T, h, p] and qpos/kpos/kvalid are [B, T] (int32, int32, bool),
    all T-sharded over `seq_axis`. A key is attended iff
    `kvalid & (kpos <= qpos)` — exactly the decoder's
    `mask = (kpos <= qpos) & attention_mask` training mask
    (models/decoder.py no-cache branch). kpos/kvalid rotate around the
    ring with their K/V block."""
    spec4 = P(None, seq_axis, None, None)
    spec2 = P(None, seq_axis)
    n = mesh.shape[seq_axis]

    @partial(shard_map, mesh=mesh,
             in_specs=(spec4, spec4, spec4, spec2, spec2, spec2),
             out_specs=spec4, check_vma=False)
    def ring(q, k, v, qpos, kpos, kvalid):
        B, Tl, h, p = q.shape
        scale = 1.0 / math.sqrt(p)
        qs = (q.transpose(0, 2, 1, 3) * jnp.asarray(scale, q.dtype))
        kb = k.transpose(0, 2, 1, 3)
        vb = v.transpose(0, 2, 1, 3)

        m = jnp.full((B, h, Tl), NEG_INF, jnp.float32)
        l = jnp.zeros((B, h, Tl), jnp.float32)
        o = jnp.zeros((B, h, Tl, p), jnp.float32)
        perm = [(i, (i + 1) % n) for i in range(n)]
        kp, kv_ok = kpos, kvalid
        for s in range(n):
            scores = jnp.einsum("bhqp,bhkp->bhqk", qs, kb,
                                preferred_element_type=jnp.float32)
            ok = kv_ok[:, None, :] & (kp[:, None, :] <= qpos[:, :, None])
            scores = jnp.where(ok[:, None], scores, NEG_INF)
            m_new = jnp.maximum(m, scores.max(axis=-1))
            m_use = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
            p_ = jnp.exp(scores - m_use[..., None])
            alpha = jnp.exp(m - m_use)
            l = l * alpha + p_.sum(axis=-1)
            o = o * alpha[..., None] + jnp.einsum(
                "bhqk,bhkp->bhqp", p_.astype(vb.dtype), vb,
                preferred_element_type=jnp.float32)
            m = m_new
            if s < n - 1:
                kb = jax.lax.ppermute(kb, seq_axis, perm)
                vb = jax.lax.ppermute(vb, seq_axis, perm)
                kp = jax.lax.ppermute(kp, seq_axis, perm)
                kv_ok = jax.lax.ppermute(kv_ok, seq_axis, perm)
        # rows whose every key is masked (fully-padded) normalize by a
        # safe 1 and output zeros
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out = o / l_safe[..., None]
        return out.astype(q.dtype).transpose(0, 2, 1, 3)

    return ring
