"""MoEUT-style Transformer language model, TPU-native.

Re-design of `moe_pretrain_model/models/transformer_language_model.py` +
`layers/transformer/{relative_moe_transformer,fast_rope_attention,
rotary_pos_encoding}.py` in flax.linen:

- token embedding scaled by sqrt(d_model) (transformer_language_model.py:60,99)
- pre-LN blocks: x + attn(ln(x)); x + moe(ln(x))
  (relative_moe_transformer.py:148-166)
- FastRope attention: fused qkv projections (no bias), partial rotary
  (`rotate_fraction` of head dims, rotate-half convention, base 10000)
  (fast_rope_attention.py:10-103, rotary_pos_encoding.py:8-62)
- MoE FFN from the pretrain registry, flip-schedule row threaded per layer
  *position* so universal (shared-parameter) stacks still get per-position
  schedules (transformer_lm_mixin.py:257-268)
- universal layer sharing `abab` / `aabb` (transformer_lm_mixin.py:237-255)
- optional final LayerNorm + untied output head
  (transformer_language_model.py:70-77)

All aux losses bubble up as a dict of named scalars; the train step adds
their sum to the CE loss (the reference collects them via LayerRegularizer,
framework/task/simple_task.py:283-308).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..moe.config import MoEArgs
from ..moe.pretrain_layers import PretrainCompeteSMoE
from ..moe.registry import get_pretrain_moe
from ..moe.schedule import FlipSchedule


@dataclasses.dataclass(frozen=True)
class LMConfig:
    """Mirrors the reference's model/MoE flags (transformer_lm_mixin.py:20-105
    and the 154M sweep, sweeps/slimpajama_moe_no_attmoe_154M_competesmoe.yaml)."""

    vocab_size: int = 8000
    d_model: int = 512
    n_layers: int = 16
    n_heads: int = 4
    head_dim: Optional[int] = None       # default d_model // n_heads
    dropout: float = 0.0
    # MoE
    moe_name: str = "competesmoe"
    n_experts: int = 64
    expert_size: int = 128
    moe_topk: int = 8                    # pkm.n_heads
    moe_args: MoEArgs = MoEArgs()
    moe_impl: str = "auto"
    # RoPE
    rotate_fraction: float = 0.5
    rope_base: float = 10000.0
    # attention backend: 'einsum' (XLA), 'flash' (Pallas flash attention,
    # jax.experimental.pallas.ops.tpu), or 'auto'. Measured on v5e
    # (2026-08-16, bf16): einsum wins at the shipped unroll (855 vs
    # 1089 us at B16 h4 T1024 d128) but flash wins 2.2x at long context
    # (3620 vs 7927 us at T4096) by skipping above-diagonal blocks and
    # never materializing the [T, T] scores. 'auto' = flash on TPU when
    # T >= 2048 and head_dim is a lane multiple, einsum otherwise.
    attn_backend: str = "auto"
    # MoA — MoE-ified attention projections (the reference's -moe.att.*
    # flags, transformer_lm_mixin.py:48-65; FullMoeRopeAttention)
    att_moe: bool = False
    att_n_experts: int = 4
    att_k: int = 2
    att_q_expert: bool = True
    att_k_expert: bool = True
    att_v_expert: bool = True
    att_o_expert: bool = True
    att_v_size: Optional[int] = None
    att_expert_dropout: float = 0.0
    att_selection_dropout: float = 0.0
    # universal transformer sharing
    universal_group_size: int = 1        # 1 -> no sharing
    universal_group_type: str = "abab"
    # Transformer-XL style context carry (lm.trafo.context_blocks,
    # transformer_language_model.py:56-63,106-140); 0 = off (the shipped
    # sweeps' setting)
    n_prev_states: int = 0
    # stochastic layer drop (transformer.p_drop_layer,
    # transformer_language_model.py:168-171)
    p_drop_layer: float = 0.0
    # ACT pondering (the "act"/SUT variants, transformer.act_loss +
    # halting.py): 0 = off; >0 wraps every block in an ACTBlock
    act_max_steps: int = 0
    act_loss: float = 0.0
    # per-block rematerialization (jax.checkpoint): recompute block
    # activations in backward instead of storing n_layers of them —
    # the long-unroll/large-config memory lever (-remat). Ignored when
    # ACT wraps blocks (the ACT scan carries its own state).
    remat: bool = False


    # misc
    preln: bool = True
    norm_before_output: bool = True
    layer_std_constant: float = 2.0      # moe.layer_std_constant
    dtype: Any = jnp.float32             # activation dtype (bf16 for TPU)

    @property
    def proj_dim(self) -> int:
        return self.head_dim or (self.d_model // self.n_heads)

    def layer_order(self) -> list:
        """Map layer position -> unique-layer index (abab/aabb sharing)."""
        g, n = self.universal_group_size, self.n_layers
        if g <= 1:
            return list(range(n))
        if n % g != 0:
            raise ValueError("n_layers must be divisible by universal group size")
        reps = n // g
        if self.universal_group_type == "abab":
            return list(range(g)) * reps
        if self.universal_group_type == "aabb":
            return sum([[i] * reps for i in range(g)], [])
        raise ValueError(f"bad group type {self.universal_group_type}")

    @property
    def n_unique_layers(self) -> int:
        return len(set(self.layer_order()))


def resolve_attn_backend(backend: str, seq_len: int, head_dim: int,
                         platform: Optional[str] = None) -> str:
    """'auto' -> 'flash' only where it measured faster: TPU, long
    sequences, lane-aligned head dim (see LMConfig.attn_backend)."""
    if backend != "auto":
        return backend
    if platform is None:
        platform = jax.devices()[0].platform
    if platform == "tpu" and seq_len >= 2048 and head_dim % 128 == 0:
        return "flash"
    return "einsum"


def rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def rope_sin_cos(n_rotate: int, seq_len: int, base: float,
                 offset: int = 0, dtype=jnp.float32):
    """Non-interleaved RoPE tables (rotary_pos_encoding.py:31-55): freqs
    repeated as cat(freqs, freqs), so rotate_half pairs dim i with i+n/2."""
    inv_freq = 1.0 / (base ** (np.arange(0, n_rotate, 2,
                                         dtype=np.float32) / n_rotate))
    t = jnp.arange(offset, offset + seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, jnp.asarray(inv_freq))
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.sin(emb).astype(dtype), jnp.cos(emb).astype(dtype)


def apply_partial_rope(x: jax.Array, sin: jax.Array, cos: jax.Array,
                       n_rotate: int) -> jax.Array:
    """Rotate the first n_rotate dims of each head; pass the rest through
    (fast_rope_attention.py:35-44)."""
    if n_rotate == 0:
        return x
    r, nr = x[..., :n_rotate], x[..., n_rotate:]
    r = r * cos + rotate_half(r) * sin
    return jnp.concatenate([r, nr], axis=-1) if nr.shape[-1] else r


def _prenorm_dense_init(n_layers: int, layer_std_constant: float = 2.0):
    """Pre-LN init: std = sqrt(c / (n_layers * fan_in))
    (layers/transformer/transformer.py:10-17)."""
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        std = math.sqrt(layer_std_constant / (n_layers * fan_in))
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


class FastRopeAttention(nn.Module):
    """Causal MHA with partial rotary embedding, no projection biases
    (fast_rope_attention.py:10-103)."""

    cfg: LMConfig

    @nn.compact
    def __call__(self, x: jax.Array, *, attend_to: Optional[jax.Array] = None,
                 pos_offset: int = 0,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        """attend_to: optional [B, S+T, D] (Transformer-XL context carry,
        fast_rope_attention.py:71-99 — queries from x at positions
        pos_offset.., keys over the whole attend_to from position 0)."""
        cfg = self.cfg
        h, p = cfg.n_heads, cfg.proj_dim
        n_rotate = int(cfg.rotate_fraction * p)
        n_rotate -= n_rotate % 2
        init = _prenorm_dense_init(cfg.n_layers, cfg.layer_std_constant)

        kv_src = attend_to if attend_to is not None else x
        q = nn.Dense(h * p, use_bias=False, kernel_init=init,
                     dtype=cfg.dtype, name="q")(x)
        k = nn.Dense(h * p, use_bias=False, kernel_init=init,
                     dtype=cfg.dtype, name="k")(kv_src)
        v = nn.Dense(h * p, use_bias=False, kernel_init=init,
                     dtype=cfg.dtype, name="v")(kv_src)

        B, T, _ = x.shape
        S = kv_src.shape[1]
        q = q.reshape(B, T, h, p)
        k = k.reshape(B, S, h, p)
        v = v.reshape(B, S, h, p)

        if n_rotate > 0:
            sin, cos = rope_sin_cos(n_rotate, T, cfg.rope_base,
                                    offset=pos_offset, dtype=q.dtype)
            sin = sin[None, :, None, :]
            cos = cos[None, :, None, :]
            q = apply_partial_rope(q, sin, cos, n_rotate)
            sin0, cos0 = rope_sin_cos(n_rotate, S, cfg.rope_base, offset=0,
                                      dtype=k.dtype)
            k = apply_partial_rope(k, sin0[None, :, None, :],
                                   cos0[None, :, None, :], n_rotate)

        # sequence parallelism: with an active seq mesh, plain causal
        # attention runs as a K/V ring over ICI (context parallelism,
        # parallel/ring_attention.py) — the [B, h, T, T] score matrix
        # never materializes on one chip. RoPE above used global
        # positions, so the ring sees correctly-rotated blocks.
        from ..parallel import seq_context
        seq_mesh = seq_context.current_seq_mesh()
        if seq_mesh is not None and attend_to is None and mask is None:
            from ..parallel.ring_attention import make_ring_attention
            ring = make_ring_attention(seq_mesh,
                                       seq_axis=seq_context.seq_axis())
            out = ring(q, k, v).reshape(B, T, h * p)
            return nn.Dense(cfg.d_model, use_bias=False, kernel_init=init,
                            dtype=cfg.dtype, name="out")(out)

        # [B, h, T, p]
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        backend = resolve_attn_backend(cfg.attn_backend, T, p)
        if backend == "flash" and attend_to is None and mask is None:
            # Pallas flash attention (block-skipping causal, online
            # softmax); only the plain square-causal case — XL carry and
            # explicit masks keep the einsum path
            from jax.experimental.pallas.ops.tpu.flash_attention import \
                flash_attention
            out = flash_attention(q, k, v, causal=True,
                                  sm_scale=1.0 / math.sqrt(p))
            out = out.transpose(0, 2, 1, 3).reshape(B, T, h * p)
            return nn.Dense(cfg.d_model, use_bias=False, kernel_init=init,
                            dtype=cfg.dtype, name="out")(out)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(p)
        # causal over the suffix; full visibility of the carried prefix
        qpos = jnp.arange(T)[:, None] + (S - T)
        kpos = jnp.arange(S)[None, :]
        causal = kpos <= qpos
        if mask is not None:
            causal = causal & mask
        scores = jnp.where(causal[None, None], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, h * p)
        return nn.Dense(cfg.d_model, use_bias=False, kernel_init=init,
                        dtype=cfg.dtype, name="out")(out)


class MoETransformerBlock(nn.Module):
    """Pre-LN block: attention + registry MoE FFN
    (relative_moe_transformer.py:17-167)."""

    cfg: LMConfig
    # warm-up prefix of the flip schedule: layers must not compete while
    # step < step_warm (competesmoe.py:528's `current_steps >= step_warm`);
    # the flips row the model passes per call covers post-warm steps only
    step_warm: int = 0

    def setup(self):
        cfg = self.cfg
        if cfg.att_moe:
            from .moa import FullMoeRopeAttention
            self.attn = FullMoeRopeAttention(cfg)
        else:
            self.attn = FastRopeAttention(cfg)
        std_scale = math.sqrt(cfg.layer_std_constant / cfg.n_layers)
        moe_cls = get_pretrain_moe(cfg.moe_name)
        kw = {}
        if "step_warm" in getattr(moe_cls, "__dataclass_fields__", {}):
            kw["step_warm"] = self.step_warm
        self.moe = moe_cls(dmodel=cfg.d_model, n_experts=cfg.n_experts,
                           expert_size=cfg.expert_size, n_heads=cfg.moe_topk,
                           args=cfg.moe_args, weight_scale=std_scale,
                           impl=cfg.moe_impl, **kw)
        self.norm1 = nn.LayerNorm(dtype=cfg.dtype)
        self.norm2 = nn.LayerNorm(dtype=cfg.dtype)

    def __call__(self, x, step=None, train=False, flips=None,
                 prev_state=None, pos_offset: int = 0,
                 return_id_experts: bool = False):
        # positional-friendly: nn.remat static_argnums (train,
        # pos_offset, return_id_experts) must stay python values
        ninput = self.norm1(x)
        attend_to = None
        if prev_state is not None:
            # carried states were normalized when saved; normalize current
            # (relative_moe_transformer.py:150-151)
            attend_to = jnp.concatenate([prev_state, ninput], axis=1)
        att_aux = None
        if self.cfg.att_moe:
            attn_out, att_aux = self.attn(ninput, attend_to=attend_to,
                                          pos_offset=pos_offset, train=train)
        else:
            attn_out = self.attn(ninput, attend_to=attend_to,
                                 pos_offset=pos_offset)
        x = x + attn_out
        kwargs = {}
        if isinstance(self.moe, PretrainCompeteSMoE):
            kwargs["flips"] = flips
        moe_out, aux = self.moe(self.norm2(x), step=step, train=train,
                                return_id_experts=return_id_experts,
                                **kwargs)
        if att_aux is not None:
            aux = aux.replace(
                aux_loss=aux.aux_loss + att_aux.aux_loss,
                losses={**aux.losses, **att_aux.losses})
        return x + moe_out, aux


class MoELanguageModel(nn.Module):
    """The LM: embedding -> n_layers blocks (with optional sharing) ->
    norm -> output head (transformer_language_model.py:25-250)."""

    cfg: LMConfig
    flip_schedule: Optional[FlipSchedule] = dataclasses.field(
        default=None, compare=False, hash=False)

    def setup(self):
        cfg = self.cfg
        self.embedding = nn.Embed(
            cfg.vocab_size, cfg.d_model,
            embedding_init=nn.initializers.normal(cfg.d_model**-0.5))
        block_cls = MoETransformerBlock
        if cfg.remat and cfg.act_max_steps == 0:
            # argnums count self as 0: x1 step2 train3 flips4
            # prev_state5 pos_offset6 return_id_experts7
            block_cls = nn.remat(MoETransformerBlock,
                                 static_argnums=(3, 6, 7))
        step_warm = (self.flip_schedule.step_warm
                     if self.flip_schedule is not None else 0)
        blocks = [block_cls(cfg, step_warm=step_warm)
                  for _ in range(cfg.n_unique_layers)]
        if cfg.act_max_steps > 0:
            from .act import ACTBlock
            blocks = [ACTBlock(block=b, max_steps=cfg.act_max_steps,
                               act_loss_coef=cfg.act_loss)
                      for b in blocks]
        self.blocks = blocks
        if cfg.norm_before_output:
            self.out_norm = nn.LayerNorm(dtype=cfg.dtype)
        self.output = nn.Dense(
            cfg.vocab_size, use_bias=True,
            kernel_init=nn.initializers.normal(cfg.d_model**-0.5))

    def __call__(self, tokens: jax.Array, *, step=None, train: bool = False,
                 state: Optional[list] = None,
                 return_id_experts: bool = False
                 ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """tokens: [B, T] int32 -> (logits [B, T, V] f32, aux dict).

        state: per-layer list of carried context blocks [B, S, D] when
        cfg.n_prev_states > 0 (Transformer-XL carry,
        transformer_language_model.py:126-140); the new state is returned
        under aux["state"] (detached, like the reference's `.detach()`).
        """
        cfg = self.cfg
        net = self.embedding(tokens).astype(cfg.dtype)
        net = net * jnp.asarray(math.sqrt(cfg.d_model), cfg.dtype)

        order = cfg.layer_order()
        aux_losses: Dict[str, jax.Array] = {}
        total_aux = jnp.zeros((), jnp.float32)
        new_state = []
        pos_offset = 0
        if cfg.n_prev_states > 0 and state is not None:
            pos_offset = state[0].shape[1]
        for li, ui in enumerate(order):
            flips = None
            if self.flip_schedule is not None:
                flips = self.flip_schedule.flips[li]
            prev = None
            if cfg.n_prev_states > 0:
                prev = state[li] if state is not None else None
                # save this layer's (normalized) input for the next block
                new_state.append(jax.lax.stop_gradient(
                    self.blocks[ui].norm1(net)))
            # positional call: required by nn.remat's static_argnums
            net_o, aux = self.blocks[ui](net, step, train, flips, prev,
                                         pos_offset, return_id_experts)
            if return_id_experts and aux.selected_experts is not None:
                aux_losses[f"layer{li}/selected_experts"] = \
                    aux.selected_experts
                aux_losses[f"layer{li}/gate_softmax"] = aux.gate_softmax
            if train and cfg.p_drop_layer > 0.0:
                rng = self.make_rng("layerdrop")
                keep = jax.random.uniform(
                    rng, net_o[..., :1].shape) >= cfg.p_drop_layer
                net = jnp.where(keep, net_o, net)
            else:
                net = net_o
            total_aux = total_aux + aux.aux_loss
            for k, val in aux.losses.items():
                key = f"layer{li}/{k}"
                aux_losses[key] = val
        if cfg.norm_before_output:
            net = self.out_norm(net)
        logits = self.output(net.astype(jnp.float32))
        aux_losses["total_aux_loss"] = total_aux
        if cfg.n_prev_states > 0:
            aux_losses["state"] = new_state
        return logits, aux_losses


def lm_loss_fn(logits: jax.Array, targets: jax.Array,
               ignore_index: int = -100) -> Tuple[jax.Array, jax.Array]:
    """Token-mean cross-entropy with ignore_index masking
    (interfaces/language_model_interface.py:20-133)."""
    valid = targets != ignore_index
    safe_targets = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_targets[..., None],
                               axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / n, n
