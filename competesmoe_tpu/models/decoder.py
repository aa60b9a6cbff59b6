"""HF-style causal decoder LMs in JAX: Phi-3.5, Llama, Mistral, SmolLM
(all llama-family), plus an optional registry-MoE FFN per block (the role
of the reference's Mixtral `initialize_smoe_modules` monkey patch,
moe_model/model/language_model/smoe_mixtral_helper.py:20-77).

Re-designs the decoder side of `moe_model/model/language_model/*` — the
reference wraps unmodified HF torch models; here the decoder is native JAX
so the whole multimodal forward jits into one XLA program.

Covers: RMSNorm, rotary embeddings (plain + Phi-3 longrope su-scaling),
GQA/MHA, fused (`qkv_proj`/`gate_up_proj`, Phi-3) or split
(`q/k/v`/`gate/up`, llama) projections, SiLU-gated MLP, optional sliding
window (Mistral), KV-cache decode.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..moe.config import MoEArgs
from ..moe.layers import MoEAux, zero_aux
from ..moe.registry import get_moe


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 32064
    hidden_size: int = 3072
    intermediate_size: int = 8192
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 131072
    original_max_position_embeddings: int = 4096
    # 'longrope' with per-dim factors (Phi-3.5) or None (llama/mistral)
    rope_scaling_type: Optional[str] = None
    rope_short_factor: Optional[Tuple[float, ...]] = None
    rope_long_factor: Optional[Tuple[float, ...]] = None
    partial_rotary_factor: float = 1.0
    sliding_window: Optional[int] = None
    tie_word_embeddings: bool = False
    fused_qkv: bool = False        # Phi-3 qkv_proj / gate_up_proj layout
    # Per-layer rematerialization (jax.checkpoint): recompute block
    # activations in the backward pass instead of storing them — the
    # activation-memory lever for the 5.1B sft on 16 GB chips (the
    # reference leans on ZeRO-3 gather granularity instead). Forward-only
    # paths (decode) are unaffected: without a grad there is nothing to
    # recompute. Off by default; `--remat` on the mm train CLI.
    remat: bool = False
    attention_bias: bool = False
    # MPT-family knobs (llava_mpt backbone): alibi position bias instead
    # of RoPE, bias-free LayerNorm instead of RMSNorm, plain GELU MLP
    # instead of SiLU-GLU
    use_alibi: bool = False
    norm_type: str = "rmsnorm"     # 'rmsnorm' | 'layernorm_nobias'
    mlp_type: str = "silu_glu"     # 'silu_glu' | 'gelu'
    expansion_ratio: int = 4       # gelu MLP hidden = ratio * d
    # Optional MoE FFN (mixtral-style blocks routed via our registry)
    moe_name: Optional[str] = None
    num_experts: int = 8
    num_selected: int = 2
    moe_args: MoEArgs = MoEArgs()
    # Weight quantization for inference (the load_8bit runtime path):
    #   'int8'  — per-output-channel int8 weights, bf16 activations; XLA
    #             fuses the dequant into the dot's operand read, so HBM
    #             weight traffic halves (measured 73 vs 126 µs for the
    #             [8,3072]x[3072,16384] decode GEMM on v5e)
    #   'w8a8'  — additionally quantizes activations per row dynamically
    #             onto the int8 MXU (65 µs on the same GEMM). EXPERIMENTAL:
    #             at full 32-layer scale XLA materializes converted
    #             operands under the decode scan and OOMs 16 GB — use
    #             'int8' in production (967 tok/s/chip measured vs 578
    #             bf16, batch 8)
    quant: Optional[str] = None
    # KV-cache quantization: 'int8' stores K/V as int8 with a per
    # (layer, batch, position, kv-head) f32 scale — halves the KV read
    # bandwidth every decode step (the decode-time analog of load_8bit;
    # see boom paged-attention's quantized KV cache design)
    kv_quant: Optional[str] = None
    # Serving-mode norm-scale folding: with norm_folded=True the model
    # skips every foldable norm's per-channel scale multiply, expecting
    # params transformed by `fold_norm_scales` (the scale absorbed into
    # the following projection's kernel). Removes 2 tiny f32[d] weight
    # reads per layer per decode step, each of which profiled as a
    # ~14 µs VMEM-copy stall on v5e (~0.9 ms/step at 32 layers).
    norm_folded: bool = False
    # Deferred batched KV write on decode steps (T==1): layers attend
    # over the existing cache plus the in-register current token, and
    # one batched scatter at step end writes all layers' k/v, removing
    # the per-layer scatter-index staging stalls (~1.5 ms/step at 32
    # layers on v5e). Token-exact vs the per-layer scatter path.
    # Default OFF: a same-process A/B (v5e, 2026-08-17) measured bf16
    # 13.45 vs 13.79 ms/step (+2.6%) but int8+kv8 8.78 vs 6.97 ms/step
    # (-26%) — the end-of-step stacked scatter defeats XLA's in-place
    # cache aliasing (donation warning fires; a full cache copy per
    # step). Keep off for the quantized serving headline.
    deferred_decode: bool = False
    # Route small-M (decode-step) projections through the Pallas
    # weight-streaming matmul (ops/matvec.py). Single-chip serving only:
    # a pallas_call is opaque to the SPMD partitioner, so keep this off
    # under tensor-parallel meshes. No effect on CPU (tests) or large-M
    # (prefill/train) shapes, which use XLA's GEMM either way.
    matvec_kernel: bool = False
    # KV cache memory layout: 'stacked' = one [L, B, S, hk, d] buffer
    # per tensor, each layer scattering at (layer, b, slot); 'per_layer'
    # = a tuple of L [B, S, hk, d] buffers, every layer scattering with
    # the IDENTICAL (b, slot) index vector so XLA stages the scatter
    # indices through scoped memory once per step instead of once per
    # layer (the staging copies profiled as ~94 µs/layer stalls behind
    # the weight-stream DMA queue on v5e).
    cache_layout: str = "stacked"
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def phi35_mini_config(dtype=jnp.bfloat16) -> "DecoderConfig":
    """microsoft/Phi-3.5-mini-instruct geometry (the CompeteSMoE-5.1B
    decoder, scripts/train/phi35mini/siglip/sft.sh)."""
    # longrope factors from the released config.json
    short = (1.0,) * 48
    long = (1.0799999237060547, 1.0999999046325684, 1.1199998855590820,
            1.1399998664855957, 1.1599998474121094, 1.1799998283386230,
            1.1999998092651367, 1.2199997901916504, 1.2399997711181641,
            1.2599997520446777, 1.2799997329711914, 1.2999997138977051,
            1.3199996948242188, 1.3399996757507324, 1.3599996566772461,
            1.3799996376037598, 1.3999996185302734, 1.4199995994567871,
            1.4399995803833008, 1.4599995613098145, 1.4799995422363281,
            1.4999995231628418, 1.5199995040893555, 1.5399994850158691,
            1.5599994659423828, 1.5799994468688965, 1.5999994277954102,
            1.6199994087219238, 1.6399993896484375, 1.6599993705749512,
            1.6799993515014648, 1.6999993324279785, 1.7199993133544922,
            1.7399992942810059, 1.7599992752075195, 1.7799992561340332,
            1.7999992370605469, 1.8199992179870605, 1.8399991989135742,
            1.8599991798400879, 1.8799991607666016, 1.8999991416931152,
            1.9199991226196289, 1.9399991035461426, 1.9599990844726562,
            1.9799990653991699, 1.9999990463256836, 2.0999990701675415)
    return DecoderConfig(
        vocab_size=32064, hidden_size=3072, intermediate_size=8192,
        num_hidden_layers=32, num_attention_heads=32,
        num_key_value_heads=32, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=131072,
        original_max_position_embeddings=4096,
        rope_scaling_type="longrope", rope_short_factor=short,
        rope_long_factor=long, fused_qkv=True, tie_word_embeddings=False,
        dtype=dtype)


class RMSNorm(nn.Module):
    eps: float
    dtype: Any = jnp.float32
    # folded=True: the per-channel scale has been absorbed into the
    # following projection's kernel (fold_norm_scales) — skip the weight
    # read. Profiling showed the decode loop stalls ~14 µs/layer/step
    # waiting on the tiny f32[d] weight copies into VMEM (0.9 ms/step at
    # 32 layers on v5e, 2026-08-17); folding removes the read entirely.
    # The param is still created so checkpoints stay interchangeable.
    folded: bool = False

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        # exact 1/sqrt (lax.rsqrt is an approximation, ~1e-5 off torch)
        xf = xf / jnp.sqrt(var + self.eps)
        if self.folded:
            return xf.astype(x.dtype)
        return (xf * w.astype(jnp.float32)).astype(x.dtype)


class LayerNormNoBias(nn.Module):
    """MPT's bias-free LayerNorm (no_bias=True)."""

    eps: float
    dtype: Any = jnp.float32
    folded: bool = False   # see RMSNorm.folded

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        xf = (xf - mean) / jnp.sqrt(var + self.eps)
        if self.folded:
            return xf.astype(x.dtype)
        return (xf * w.astype(jnp.float32)).astype(x.dtype)


def make_norm(cfg: "DecoderConfig", foldable: bool = False):
    folded = bool(getattr(cfg, "norm_folded", False)) and foldable
    if cfg.norm_type == "layernorm_nobias":
        return LayerNormNoBias(cfg.rms_norm_eps, cfg.dtype, folded=folded)
    return RMSNorm(cfg.rms_norm_eps, cfg.dtype, folded=folded)


def alibi_slopes(n_heads: int) -> np.ndarray:
    """Standard ALiBi geometric slopes (HF build_mpt_alibi_tensor)."""
    import math as _m
    n = 2 ** _m.ceil(_m.log2(n_heads))
    base = 2.0 ** (-8.0 / n)
    slopes = np.power(base, np.arange(1, n + 1))
    if n != n_heads:
        slopes = np.concatenate([slopes[1::2], slopes[0::2]])[:n_heads]
    return slopes.astype(np.float32)


def rope_tables(cfg: DecoderConfig, positions: jax.Array, seq_len_cap: int
                ) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for the given positions ([..., T]).

    Implements plain RoPE and Phi-3 longrope su-scaling: per-dim frequency
    factors (short when the runtime context fits the original window, long
    otherwise) plus the sqrt(1 + log(s)/log(orig)) magnitude factor.
    """
    rot = int(cfg.head_dim * cfg.partial_rotary_factor)
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, rot, 2,
                                                   dtype=np.float64) / rot))
    attn_factor = 1.0
    if cfg.rope_scaling_type in ("longrope", "su"):
        if seq_len_cap > cfg.original_max_position_embeddings:
            factors = np.asarray(cfg.rope_long_factor, np.float64)
        else:
            factors = np.asarray(cfg.rope_short_factor, np.float64)
        inv_freq = inv_freq / factors
        scale = (cfg.max_position_embeddings
                 / cfg.original_max_position_embeddings)
        if scale > 1.0:
            attn_factor = math.sqrt(
                1.0 + math.log(scale)
                / math.log(cfg.original_max_position_embeddings))
    freqs = positions[..., None].astype(jnp.float32) * jnp.asarray(
        inv_freq, jnp.float32)[None]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return (jnp.cos(emb) * attn_factor), (jnp.sin(emb) * attn_factor)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [B, T, H, D]; cos/sin: [B, T, rot] (HF non-interleaved)."""
    rot = cos.shape[-1]
    xr, xp = x[..., :rot], x[..., rot:]
    x1, x2 = jnp.split(xr, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    out = xr * cos + rotated * sin
    return jnp.concatenate([out, xp], axis=-1) if xp.shape[-1] else out


@flax.struct.dataclass
class KVCache:
    # 'stacked' layout: one [L, B, max_len, kv_heads, head_dim] array
    # (dtype or int8) per field; 'per_layer' layout: a length-L tuple of
    # [B, max_len, kv_heads, head_dim] arrays (see
    # DecoderConfig.cache_layout). `k[i]` reads layer i's buffer under
    # either layout, which is why the attention path is layout-agnostic
    # everywhere except the scatter.
    k: Any
    v: Any
    pos: jax.Array  # [B] current length per sequence
    # int8 KV mode only: per (L, B, slot, kv-head) dequant scales
    k_scale: Any = None
    v_scale: Any = None

    @property
    def max_len(self) -> int:
        if isinstance(self.k, (list, tuple)):
            return self.k[0].shape[1]
        return self.k.shape[2]

    @classmethod
    def create(cls, cfg: DecoderConfig, batch: int, max_len: int):
        L = cfg.num_hidden_layers
        shape = (batch, max_len, cfg.num_key_value_heads, cfg.head_dim)
        per_layer = getattr(cfg, "cache_layout", "stacked") == "per_layer"

        def buf(shp, dt):
            if per_layer:
                return tuple(jnp.zeros(shp, dt) for _ in range(L))
            return jnp.zeros((L,) + shp, dt)

        if cfg.kv_quant == "int8":
            return cls(k=buf(shape, jnp.int8), v=buf(shape, jnp.int8),
                       pos=jnp.zeros((batch,), jnp.int32),
                       k_scale=buf(shape[:-1], cfg.dtype),
                       v_scale=buf(shape[:-1], cfg.dtype))
        return cls(k=buf(shape, cfg.dtype), v=buf(shape, cfg.dtype),
                   pos=jnp.zeros((batch,), jnp.int32))


def _quantize_kv(x: jax.Array):
    """Per (token, head) symmetric int8: x [B, T, hk, d] ->
    (int8 values, scales [B, T, hk])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(x.astype(jnp.float32) / scale[..., None])
    return q.clip(-127, 127).astype(jnp.int8), scale.astype(x.dtype)


def pack_int4(q):
    """int8 values in [-8, 7], [K, N] -> nibble-packed int8 [K//2, N]:
    rows [0, K/2) in the low nibble, rows [K/2, K) in the high nibble
    (split-half, NOT interleaved — so a contraction can be computed as
    x[:, :K/2] @ low + x[:, K/2:] @ high with contiguous slices, which
    both XLA and the Pallas int4 matvec kernel handle without ever
    materializing the unpacked matrix).

    Why not jnp.int4: on the axon TPU backend an int4 array cannot cross
    a jit boundary at all — the relayout in jax's `_array_shard_arg`
    re-enters device_put and recurses (repro 2026-08-17). Packing into
    int8 streams the same bytes with none of the dtype's sharp edges,
    and keeps the format under our control for Pallas kernels."""
    K = q.shape[0]
    lo = q[: K // 2] & 0x0F
    hi = q[K // 2:] & 0x0F
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4_halves(p):
    """int8 [K//2, N] -> (low, high) sign-extended int8 [K//2, N] each:
    low = original rows [0, K/2), high = rows [K/2, K). Pure elementwise
    shifts — fuse into a consumer dot's operand read."""
    lo = ((p << 4).astype(jnp.int8) >> 4).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    return lo, hi


def unpack_int4(p):
    """Inverse of pack_int4: int8 [K//2, N] -> sign-extended int8 [K, N].
    Materializes the full matrix (the concat can't fuse) — use the
    halves form in compute paths."""
    lo, hi = unpack_int4_halves(p)
    return jnp.concatenate([lo, hi], axis=0)


class QuantDense(nn.Module):
    """Weight-quantized Dense for inference (load_8bit runtime).

    Params: kernel_q int8 [in, out] + per-output-channel scale f32 [out]
    (+ bias). 'int8' dequantizes in the dot's operand read (XLA fuses the
    convert+scale, halving HBM weight traffic); 'w8a8' also quantizes the
    activations per row and runs the int8 MXU path; 'int4' (w4a16) stores
    the kernel nibble-packed two values per int8 byte (pack_int4), so
    weight reads halve again vs int8 (per-output symmetric [-7, 7])."""

    features: int
    mode: str = "int8"            # 'int8' (w8a16) | 'w8a8' | 'int4'
    use_bias: bool = False
    dtype: Any = jnp.bfloat16
    matvec_kernel: bool = False   # Pallas small-M path (int8 mode only)

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        int4 = self.mode == "int4"
        qmax = 7 if int4 else 127

        def q_init(key, shape, dtype=jnp.int8):
            w = jax.random.normal(key, (in_dim, self.features)) \
                * (in_dim ** -0.5)
            s = jnp.maximum(jnp.abs(w).max(0), 1e-8) / qmax
            q = jnp.round(w / s).clip(-qmax, qmax).astype(jnp.int8)
            return pack_int4(q) if int4 else q

        if int4 and in_dim % 2:
            raise ValueError("int4 mode needs an even input dim")
        kernel_q = self.param(
            "kernel_q", q_init,
            ((in_dim // 2, self.features) if int4
             else (in_dim, self.features)))
        scale = self.param("scale",
                           nn.initializers.constant(
                               in_dim ** -0.5 / qmax),
                           (self.features,))
        if self.mode == "w8a8":
            amax = jnp.max(jnp.abs(x), axis=-1,
                           keepdims=True).astype(jnp.float32)
            xs = x.astype(jnp.float32) * (127.0 / jnp.maximum(amax, 1e-8))
            x8 = jnp.clip(jnp.round(xs), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                x8, kernel_q, (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (amax / 127.0) * scale
        elif int4:
            from ..ops.matvec import (quant_small_m_matmul_int4,
                                      small_m_viable_int4)
            lead = x.shape[:-1]
            m = int(np.prod(lead)) if lead else 1
            if (jax.default_backend() != "cpu"
                    and small_m_viable_int4(m, in_dim, self.features)):
                # Pallas path: streams the PACKED bytes once (the whole
                # point of int4 — see quant_small_m_matmul_int4). Always
                # on at viable shapes: XLA has no non-materializing
                # lowering for packed weights.
                y = quant_small_m_matmul_int4(
                    x.reshape(m, in_dim), kernel_q,
                    scale.astype(jnp.float32)
                ).reshape(*lead, self.features)
            else:
                # fallback (CPU tests, non-tiling shapes, prefill):
                # contract each packed half against its x slice — the
                # packed buffer is read twice (int8-equivalent traffic)
                # but the unpacked matrix is never materialized
                lo, hi = unpack_int4_halves(kernel_q)
                h = in_dim // 2
                sc = scale[None, :].astype(x.dtype)
                y = (jnp.dot(x[..., :h], lo.astype(x.dtype) * sc,
                             preferred_element_type=jnp.float32)
                     + jnp.dot(x[..., h:], hi.astype(x.dtype) * sc,
                               preferred_element_type=jnp.float32))
        else:
            lead = x.shape[:-1]
            m = int(np.prod(lead)) if lead else 1
            use_pallas = False
            if self.matvec_kernel and self.mode == "int8":
                from ..ops.matvec import (MAX_QUANT_M,
                                          quant_small_m_matmul,
                                          small_m_viable)
                # quantized cap (128, not 32): the fallback materializes
                # a dequantized bf16 operand, so the kernel must also
                # cover speculative-verify shapes (M = batch*(1+k))
                use_pallas = (jax.default_backend() != "cpu"
                              and small_m_viable(m, in_dim, self.features,
                                                 max_m=MAX_QUANT_M))
            if use_pallas:
                y = quant_small_m_matmul(
                    x.reshape(m, in_dim), kernel_q,
                    scale.astype(jnp.float32)).reshape(*lead, self.features)
            else:
                wd = (kernel_q.astype(x.dtype)
                      * scale[None, :].astype(x.dtype))
                y = jnp.dot(x, wd, preferred_element_type=jnp.float32)
        y = y.astype(x.dtype)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,)).astype(y.dtype)
        return y


class PallasDense(nn.Module):
    """nn.Dense-compatible layer that routes small-M (decode-step) matmuls
    through the Pallas weight-streaming kernel (ops/matvec.py) and
    everything else through XLA's GEMM. Parameter tree ('kernel'/'bias')
    is identical to nn.Dense, so checkpoints are interchangeable."""

    features: int
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from ..ops.matvec import small_m_matmul, small_m_viable
        in_dim = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_dim, self.features))
        lead = x.shape[:-1]
        m = int(np.prod(lead)) if lead else 1
        if (jax.default_backend() != "cpu"
                and small_m_viable(m, in_dim, self.features)):
            y = small_m_matmul(x.reshape(m, in_dim),
                               kernel.astype(x.dtype)).reshape(*lead,
                                                               self.features)
        else:
            y = jnp.dot(x, kernel.astype(x.dtype),
                        preferred_element_type=jnp.float32).astype(x.dtype)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,)).astype(y.dtype)
        return y


def _make_dense(cfg: "DecoderConfig", features: int, name: str,
                use_bias: bool = False):
    if cfg.quant:
        return QuantDense(features, mode=cfg.quant, use_bias=use_bias,
                          dtype=cfg.dtype, name=name,
                          matvec_kernel=cfg.matvec_kernel)
    if cfg.matvec_kernel:
        return PallasDense(features, use_bias=use_bias, dtype=cfg.dtype,
                           name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=cfg.dtype,
                    name=name)


class DecoderAttention(nn.Module):
    cfg: DecoderConfig

    def _proj(self, x):
        cfg = self.cfg
        d = cfg.hidden_size
        kvd = cfg.num_key_value_heads * cfg.head_dim
        if cfg.fused_qkv:
            qkv = _make_dense(cfg, d + 2 * kvd, "qkv_proj",
                              cfg.attention_bias)(x)
            q, k, v = jnp.split(qkv, [d, d + kvd], axis=-1)
        else:
            q = _make_dense(cfg, d, "q_proj", cfg.attention_bias)(x)
            k = _make_dense(cfg, kvd, "k_proj", cfg.attention_bias)(x)
            v = _make_dense(cfg, kvd, "v_proj", cfg.attention_bias)(x)
        return q, k, v

    @nn.compact
    def __call__(self, x, cos, sin, *, mask=None, cache_kv=None,
                 cache_idx=None, layer_idx: int = 0,
                 attn_window: Optional[int] = None,
                 deferred: bool = False, ring_qv=None):
        """mask: [B, Tq, Tk] bool (True = attend). cache_kv: the FULL
        stacked (k, v) buffers [L, B, max_len, h_kv, d] — this layer
        scatters into its own [layer_idx] slice in place (restacking
        per-layer slices would copy the whole cache every decode step).
        cache_idx: [B, T] slot per current token; pad tokens point at the
        dump slot max_len-1, which is only legitimately written by the
        final token — so stale pad K/V is never attended.

        Decode attention stays in XLA on purpose: a Pallas
        paged-attention-style kernel (double-buffered manual KV-block
        DMAs skipping blocks past each row's length, fused int8 dequant,
        flash online softmax) was built and measured on v5e (2026-08-16,
        B=8, h=hk=32, d=96) and LOST at every geometry — e.g. window
        4096 / length 1024: 1.80 ms vs XLA's 0.48 ms bf16 (int8 KV:
        1.15 vs 0.40 ms); window 512: 0.33 vs 0.04 ms. XLA's batched
        einsum over [B,S,h,d] sustains >1.3 TB/s effective on this chip
        while single-query attention forces the kernel into per-kv-head
        [rep,d]x[d,BK] matmuls (Mosaic has no 3-D axis-0 reductions)
        whose overhead dwarfs the skipped-block DMA savings. Retired per
        the measured-justification rule (like the Pallas grouped GEMM,
        ops/expert_compute.py)."""
        cfg = self.cfg
        B, T, _ = x.shape
        h, hk, p = (cfg.num_attention_heads, cfg.num_key_value_heads,
                    cfg.head_dim)
        q, k, v = self._proj(x)
        q = q.reshape(B, T, h, p)
        k = k.reshape(B, T, hk, p)
        v = v.reshape(B, T, hk, p)
        if not cfg.use_alibi:
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)

        if ring_qv is not None and cache_kv is None and h == hk:
            # sequence-parallel training: position/validity-masked ring
            # attention over the 'seq' mesh axis — the [B, h, T, T]
            # score matrix never materializes on one chip (the dense
            # mask path below builds it). DecoderLM only passes ring_qv
            # under an active seq mesh with plain (no alibi, no window,
            # MHA) attention.
            from ..parallel import seq_context
            from ..parallel.ring_attention import \
                make_ring_attention_masked
            smesh = seq_context.current_seq_mesh()
            ring = make_ring_attention_masked(
                smesh, seq_axis=seq_context.seq_axis())
            qpos, kvalid = ring_qv
            out = ring(q, k, v, qpos.astype(jnp.int32),
                       qpos.astype(jnp.int32), kvalid.astype(bool))
            out = out.reshape(B, T, h * p)
            out = _make_dense(cfg, cfg.hidden_size, "o_proj",
                              cfg.attention_bias)(out)
            return out, None

        new_cache = None
        k_scale = v_scale = None
        k_self = v_self = None
        if cache_kv is not None and deferred:
            # Deferred batched write (decode, T==1): do NOT scatter here.
            # Attend over the existing cache plus the current token's
            # k/v held in registers; DecoderLM scatters every layer's
            # pending k/v in ONE batched scatter at step end. Rationale
            # (profiled on v5e, 2026-08-17): per-layer scatters stage
            # their s32 index vectors through a shared scoped-memory
            # slot, and each tiny index copy waits ~94 us behind the
            # weight-stream DMA queue — 16 serialized stalls = 1.5 ms of
            # a 13.8 ms bf16 step. One scatter pays that latency once.
            if len(cache_kv) == 4:
                kq, k_s = _quantize_kv(k)
                vq, v_s = _quantize_kv(v)
                new_cache = (kq, vq, k_s, v_s)   # pending, not scattered
                # quantize->dequantize the self term so deferred output
                # is bit-identical to the scatter path's cache read
                k_self = kq.astype(x.dtype) * k_s[..., None].astype(x.dtype)
                v_self = vq.astype(x.dtype) * v_s[..., None].astype(x.dtype)
                k = cache_kv[0][layer_idx]
                v = cache_kv[1][layer_idx]
                k_scale = cache_kv[2][layer_idx]
                v_scale = cache_kv[3][layer_idx]
            else:
                new_cache = (k, v)               # pending, not scattered
                k_self, v_self = k, v
                k = cache_kv[0][layer_idx]
                v = cache_kv[1][layer_idx]
            if attn_window is not None and attn_window < k.shape[1]:
                k = k[:, :attn_window]
                v = v[:, :attn_window]
                if k_scale is not None:
                    k_scale = k_scale[:, :attn_window]
                    v_scale = v_scale[:, :attn_window]
        elif cache_kv is not None:
            # In-place batched scatter into this layer's slice. Prefill
            # pads share the dump slot, so unique_indices is a promise we
            # break for garbage slots only — any duplicate pad write may
            # win; all are dead.
            b_idx = jnp.arange(B)[:, None]

            def _scatter(buf, upd):
                # per_layer layout: scatter into this layer's own array
                # with the (b, slot) index shared by every layer; the
                # tuple rebuild is Python-only (no copy of other layers)
                if isinstance(buf, (list, tuple)):
                    new = buf[layer_idx].at[b_idx, cache_idx].set(
                        upd, unique_indices=True,
                        mode='promise_in_bounds')
                    return tuple(new if i == layer_idx else a
                                 for i, a in enumerate(buf))
                return buf.at[layer_idx, b_idx, cache_idx].set(
                    upd, unique_indices=True, mode='promise_in_bounds')

            if len(cache_kv) == 4:  # int8 KV: values + per-slot scales
                ck, cv, cks, cvs = cache_kv
                kq, k_s = _quantize_kv(k)
                vq, v_s = _quantize_kv(v)
                ck = _scatter(ck, kq)
                cv = _scatter(cv, vq)
                cks = _scatter(cks, k_s)
                cvs = _scatter(cvs, v_s)
                # Do NOT dequantize the big K/V tensors here (XLA would
                # materialize bf16 copies, erasing the bandwidth win —
                # measured 8.54 vs 8.27 ms/step). The int8 values flow
                # into the attention einsums via a pure convert (which
                # fuses into the operand read) and the per-(slot, head)
                # scales are folded into the SMALL tensors instead:
                # K scales into the score matrix, V scales into the
                # softmax probabilities.
                k, v = ck[layer_idx], cv[layer_idx]
                k_scale, v_scale = cks[layer_idx], cvs[layer_idx]
                new_cache = (ck, cv, cks, cvs)
            else:
                ck, cv = cache_kv
                ck = _scatter(ck, k)
                cv = _scatter(cv, v)
                k, v = ck[layer_idx], cv[layer_idx]
                new_cache = (ck, cv)
            if attn_window is not None and attn_window < k.shape[1]:
                # Windowed KV read: every valid position is < attn_window
                # (caller contract: pos + T <= attn_window), and slots at
                # or beyond it are masked -1e30 anyway — so slicing them
                # off is token-exact while skipping their HBM reads. At
                # a 512-slot cache with ~137 live positions this removes
                # ~half the per-step KV traffic (the dominant non-weight
                # term: L*B*S*hk*d*2 bytes/step).
                k = k[:, :attn_window]
                v = v[:, :attn_window]
                if k_scale is not None:
                    k_scale = k_scale[:, :attn_window]
                    v_scale = v_scale[:, :attn_window]

        # GQA: group the query heads per KV head instead of jnp.repeat-ing
        # K/V (repeat materializes h/hk expanded copies — pure wasted HBM
        # bandwidth in decode; grouping keeps K/V at their stored width)
        rep = h // hk
        q = q.reshape(B, T, hk, rep, p)
        n_cached = k.shape[1]
        scores = jnp.einsum("bqhrd,bkhd->bhrqk", q, k.astype(q.dtype),
                            preferred_element_type=jnp.float32)
        if k_scale is not None:
            # fold the K dequant scale into the (small) score matrix:
            # q·(k8*s) == (q·k8)*s per (slot, kv-head)
            scores = scores * jnp.moveaxis(k_scale, 1, -1)[
                :, :, None, None, :].astype(scores.dtype)
        if k_self is not None:
            # deferred write: the current token's score column rides at
            # the end of the key axis (softmax is order-invariant)
            scores = jnp.concatenate(
                [scores,
                 jnp.einsum("bqhrd,bkhd->bhrqk", q,
                            k_self.astype(q.dtype),
                            preferred_element_type=jnp.float32)], axis=-1)
        scores = scores / math.sqrt(p)
        if cfg.use_alibi:
            # bias = -slope_h * (qpos - kpos); qpos from cos (carries
            # position ids when alibi is on)
            qpos = cos[:, :, 0]                      # [B, T] positions
            kpos = jnp.arange(n_cached, dtype=jnp.float32)
            dist = qpos[:, :, None] - kpos[None, None, :]   # [B, T, K]
            if k_self is not None:
                # self column: distance 0 (token attends to itself)
                dist = jnp.concatenate(
                    [dist, jnp.zeros_like(dist[:, :, :1])], axis=-1)
            slopes = jnp.asarray(alibi_slopes(h)).reshape(hk, rep)
            scores = scores - (slopes[None, :, :, None, None]
                               * dist[:, None, None, :, :])
        if mask is not None:
            scores = jnp.where(mask[:, None, None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        self_probs = None
        if k_self is not None:
            probs, self_probs = probs[..., :n_cached], probs[..., n_cached:]
        if v_scale is not None:
            # fold the V dequant scale into the probabilities:
            # p·(v8*s) == (p*s)·v8 per (slot, kv-head)
            probs = probs * jnp.moveaxis(v_scale, 1, -1)[
                :, :, None, None, :].astype(probs.dtype)
        probs = probs.astype(x.dtype)
        out = jnp.einsum("bhrqk,bkhd->bqhrd", probs, v.astype(x.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        if self_probs is not None:
            out = out + jnp.einsum(
                "bhrqk,bkhd->bqhrd", self_probs.astype(x.dtype),
                v_self.astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(B, T, h * p)
        out = _make_dense(cfg, cfg.hidden_size, "o_proj",
                          cfg.attention_bias)(out)
        return out, new_cache


class DecoderMLP(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        if cfg.mlp_type == "gelu":  # MPT ffn: up -> gelu -> down
            hdim = cfg.expansion_ratio * cfg.hidden_size
            hmid = _make_dense(cfg, hdim, "up_proj")(x)
            hmid = jax.nn.gelu(hmid, approximate=False)
            return _make_dense(cfg, cfg.hidden_size, "down_proj")(hmid)
        if cfg.fused_qkv:  # phi3 layout pairs fused attn with gate_up_proj
            gu = _make_dense(cfg, 2 * cfg.intermediate_size,
                             "gate_up_proj")(x)
            gate, up = jnp.split(gu, 2, axis=-1)
        else:
            gate = _make_dense(cfg, cfg.intermediate_size, "gate_proj")(x)
            up = _make_dense(cfg, cfg.intermediate_size, "up_proj")(x)
        h = jax.nn.silu(gate) * up
        return _make_dense(cfg, cfg.hidden_size, "down_proj")(h)


class DecoderLayer(nn.Module):
    cfg: DecoderConfig

    def setup(self):
        cfg = self.cfg
        # input norm folds into qkv; post-attn norm folds into the dense
        # MLP's first projection (not into an MoE FFN: the router AND
        # every expert would each have to absorb it)
        self.input_layernorm = make_norm(cfg, foldable=True)
        self.post_attention_layernorm = make_norm(
            cfg, foldable=cfg.moe_name is None)
        self.self_attn = DecoderAttention(cfg)
        if cfg.moe_name is not None:
            self.moe = get_moe(cfg.moe_name)(
                in_dim=cfg.hidden_size, out_dim=cfg.hidden_size,
                n_experts=cfg.num_experts, n_selected=cfg.num_selected,
                args=cfg.moe_args,
                expert_hidden_dim=cfg.intermediate_size)
        else:
            self.mlp = DecoderMLP(cfg)

    def __call__(self, x, cos, sin, mask=None, cache_kv=None,
                 cache_idx=None, layer_idx: int = 0, step=None,
                 train=False, attn_window=None, deferred=False,
                 ring_qv=None):
        # positional-friendly signature: nn.remat's static_argnums are
        # positional (layer_idx/train/attn_window/deferred must stay
        # python values — they steer control flow and list indexing)
        res = x
        h, new_cache = self.self_attn(self.input_layernorm(x), cos, sin,
                                      mask=mask, cache_kv=cache_kv,
                                      cache_idx=cache_idx,
                                      layer_idx=layer_idx,
                                      attn_window=attn_window,
                                      deferred=deferred, ring_qv=ring_qv)
        x = res + h
        res = x
        h = self.post_attention_layernorm(x)
        if self.cfg.moe_name is not None:
            h, aux = self.moe(h, step=step, train=train)
        else:
            h, aux = self.mlp(h), zero_aux(h)
        return res + h, new_cache, aux


class DecoderLM(nn.Module):
    """The full decoder: embed -> layers -> norm -> lm_head.

    __call__ supports three modes:
      * training/prefill without cache: inputs [B, T]
      * prefill with cache: pass `cache`, returns updated cache
      * decode: T=1 slices against the cache
    `inputs_embeds` bypasses the embedding (the LLaVA image splice feeds
    embeddings directly, llava_arch.py:198-384).
    """

    cfg: DecoderConfig

    def setup(self):
        cfg = self.cfg
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size,
            embedding_init=nn.initializers.normal(0.02))
        layer_cls = DecoderLayer
        if cfg.remat:
            # argnums count self as 0: x1 cos2 sin3 mask4 cache_kv5
            # cache_idx6 layer_idx7 step8 train9 attn_window10 deferred11
            layer_cls = nn.remat(DecoderLayer,
                                 static_argnums=(7, 9, 10, 11))
        self.layers = [layer_cls(cfg)
                       for _ in range(cfg.num_hidden_layers)]
        # the final norm folds into lm_head; with tied embeddings the
        # embedding matrix is also the input table, so it cannot absorb
        self.norm = make_norm(cfg, foldable=not cfg.tie_word_embeddings)
        if not cfg.tie_word_embeddings:
            if cfg.quant:
                # int4 keeps the lm_head at int8: vocab sizes (32064)
                # don't tile the Pallas int4 kernel's 128-lane blocks,
                # and the XLA halves fallback reads packed bytes twice —
                # int8 streams the same traffic with none of the caveats
                mode = "int8" if cfg.quant == "int4" else cfg.quant
                self.lm_head = QuantDense(cfg.vocab_size, mode=mode,
                                          name="lm_head")
            else:
                self.lm_head = nn.Dense(cfg.vocab_size, use_bias=False,
                                        name="lm_head")

    def embed(self, input_ids):
        return self.embed_tokens(input_ids).astype(self.cfg.dtype)

    def __call__(self, input_ids=None, *, inputs_embeds=None,
                 attention_mask=None, position_ids=None,
                 cache: Optional[KVCache] = None, step=None, train=False,
                 seq_len_cap: Optional[int] = None,
                 attn_window: Optional[int] = None):
        cfg = self.cfg
        if inputs_embeds is None:
            inputs_embeds = self.embed(input_ids)
        x = inputs_embeds
        B, T, _ = x.shape

        cache_idx = None
        if cache is not None:
            valid = (attention_mask.astype(jnp.int32)
                     if attention_mask is not None
                     else jnp.ones((B, T), jnp.int32))
            cum = jnp.cumsum(valid, axis=1) - 1              # [B, T]
            kv_len = cache.max_len
            # pad tokens write to the dump slot kv_len-1 (see
            # DecoderAttention) so their K/V never shadow real positions.
            # The minimum() is a no-op for callers honoring the
            # pos + T <= kv_len contract; it exists for the serving
            # engine's retired slots, which keep riding the batched step
            # with ever-growing pos — without the clamp their scatters
            # would eventually index past the cache (promise_in_bounds
            # makes that UB, not an error). Clamped writes land in the
            # dump slot of a dead row: harmless.
            cache_idx = jnp.where(valid.astype(bool),
                                  jnp.minimum(cache.pos[:, None] + cum,
                                              kv_len - 1),
                                  kv_len - 1)
            if position_ids is None:
                position_ids = cache.pos[:, None] + jnp.maximum(cum, 0)
        elif position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
        cap = seq_len_cap or (cache.max_len if cache is not None else T)
        if cfg.use_alibi:
            # no rope; smuggle position ids to the attention for the
            # alibi distance term
            cos = position_ids.astype(jnp.float32)[..., None]
            sin = jnp.zeros_like(cos)
        else:
            cos, sin = rope_tables(cfg, position_ids, cap)

        # Decode steps (T==1) defer the KV write: layers attend over the
        # existing cache plus the in-register current token, and ONE
        # batched scatter at step end writes all layers' k/v (see
        # DecoderAttention for the profiled rationale).
        deferred = (getattr(cfg, "deferred_decode", False)
                    and cache is not None and T == 1
                    # deferred's end-of-step batched scatter targets the
                    # stacked layout; per_layer scatters inline instead
                    and not isinstance(cache.k, (list, tuple)))

        # Build the attention mask [B, Tq, Tk].
        ring_qv = None
        if cache is not None:
            if attn_window is not None and attn_window < kv_len:
                # windowed KV read (see DecoderAttention): mask matches
                # the sliced cache; validity is the caller's contract
                # (pos + T <= attn_window)
                kv_len = attn_window
            kpos = jnp.arange(kv_len)[None, None]           # [1,1,K]
            qpos = (cache.pos[:, None] + jnp.maximum(cum, 0))[:, :, None]
            if deferred:
                # cached slots strictly precede the current token (its
                # k/v is not in the cache yet); the self column at the
                # end is valid iff the token itself is
                mask = kpos < qpos
                if cfg.sliding_window:
                    mask = mask & (kpos > qpos - cfg.sliding_window)
                mask = jnp.concatenate(
                    [mask, valid[:, :, None].astype(bool)], axis=-1)
            else:
                mask = kpos <= qpos
                if cfg.sliding_window:
                    mask = mask & (kpos > qpos - cfg.sliding_window)
        else:
            from ..parallel import seq_context
            if (seq_context.current_seq_mesh() is not None
                    and cfg.sliding_window is None and not cfg.use_alibi
                    and cfg.num_attention_heads
                    == cfg.num_key_value_heads):
                # sequence-parallel training: skip the [B, T, T] dense
                # mask entirely — positions + validity ride the ring
                # (parallel/ring_attention.make_ring_attention_masked)
                kvalid = (attention_mask.astype(bool)
                          if attention_mask is not None
                          else jnp.ones((B, T), bool))
                ring_qv = (position_ids, kvalid)
                mask = None
            else:
                qpos = position_ids[:, :, None]
                kpos = position_ids[:, None, :]
                mask = kpos <= qpos
                if cfg.sliding_window:
                    mask = mask & (kpos > qpos - cfg.sliding_window)
                if attention_mask is not None:
                    mask = mask & attention_mask[:, None, :].astype(bool)

        cache_kv = None
        if cache is not None:
            cache_kv = ((cache.k, cache.v, cache.k_scale, cache.v_scale)
                        if cache.k_scale is not None
                        else (cache.k, cache.v))
        total_aux = jnp.zeros((), jnp.float32)
        auxes: List[MoEAux] = []
        pending = []
        for li, layer in enumerate(self.layers):
            # positional call: required by nn.remat's static_argnums
            x, updated, aux = layer(
                x, cos, sin, mask, cache_kv, cache_idx, li, step, train,
                attn_window, deferred, ring_qv)
            total_aux = total_aux + aux.aux_loss
            auxes.append(aux)
            if updated is not None:
                if deferred:
                    pending.append(updated)
                else:
                    cache_kv = updated
        if deferred and pending:
            # ONE batched scatter for all layers: stack the pending k/v
            # to [L, B, 1, hk, d] and write every layer's slot in a
            # single op — the index vector (b, slot) is prepared (and
            # staged through scoped memory) once per step instead of
            # once per layer.
            b_idx = jnp.arange(B)[:, None]
            stacked = [jnp.stack([p[i] for p in pending])
                       for i in range(len(pending[0]))]
            cache_kv = tuple(
                buf.at[:, b_idx, cache_idx].set(
                    upd, unique_indices=True, mode='promise_in_bounds')
                for buf, upd in zip(cache_kv, stacked))

        x = self.norm(x)
        if cfg.tie_word_embeddings:
            logits = x.astype(jnp.float32) @ \
                self.embed_tokens.embedding.T.astype(jnp.float32)
        else:
            logits = self.lm_head(x.astype(jnp.float32))

        new_cache = None
        if cache is not None:
            if attention_mask is not None:
                advance = jnp.sum(attention_mask.astype(jnp.int32), axis=-1)
            else:
                advance = jnp.full((B,), T, jnp.int32)
            new_cache = KVCache(
                k=cache_kv[0], v=cache_kv[1], pos=cache.pos + advance,
                k_scale=cache_kv[2] if len(cache_kv) == 4 else None,
                v_scale=cache_kv[3] if len(cache_kv) == 4 else None)
        return logits, new_cache, {"total_aux_loss": total_aux,
                                   "layers": auxes}


# ---------------------------------------------------------------------------
# Serving-mode weight transforms
# ---------------------------------------------------------------------------

def _fold_into_dense(proj: dict, w: jax.Array) -> None:
    """Absorb a per-input-channel scale w [in] into a projection's params
    (in place on a mutable dict). Handles nn.Dense/PallasDense ('kernel')
    and QuantDense int8/int4 ('kernel_q' + per-output 'scale'): the int
    kernel is dequantized, scaled per input channel, and requantized per
    output channel."""
    if "kernel" in proj:
        k = proj["kernel"]
        proj["kernel"] = (k.astype(jnp.float32)
                          * w.astype(jnp.float32)[:, None]).astype(k.dtype)
        return
    kq, s = proj["kernel_q"], proj["scale"]
    packed = kq.shape[0] * 2 == w.shape[0]   # nibble-packed int4 mode
    if packed:
        kq = unpack_int4(kq)
    qmax = 7 if packed else 127
    wf = (kq.astype(jnp.float32) * s.astype(jnp.float32)[None, :]
          * w.astype(jnp.float32)[:, None])
    s_new = jnp.maximum(jnp.abs(wf).max(axis=0), 1e-8) / qmax
    q = jnp.round(wf / s_new[None, :]).clip(-qmax, qmax).astype(jnp.int8)
    proj["kernel_q"] = pack_int4(q) if packed else q
    proj["scale"] = s_new.astype(s.dtype)


def fold_norm_scales(params, cfg: DecoderConfig):
    """Fold every foldable norm's per-channel scale into the following
    projection kernel and reset the norm weight to ones. Use together
    with a model built with `norm_folded=True`; the transformed params
    remain loadable by an unfolded model (the norm weights are ones, the
    kernels carry the scales — same function either way).

    Folds: input_layernorm -> qkv (or q/k/v); post_attention_layernorm
    -> gate_up (or gate+up / MPT up) unless the FFN is an MoE; final
    norm -> lm_head unless embeddings are tied."""
    def to_dict(t):
        if isinstance(t, dict) or hasattr(t, "items"):
            return {k: to_dict(v) for k, v in t.items()}
        return t

    p = to_dict(params)
    root = p["params"] if "params" in p else p
    for name, layer in root.items():
        if not name.startswith("layers_"):
            continue
        w = layer["input_layernorm"]["weight"]
        attn = layer["self_attn"]
        for proj in (("qkv_proj",) if "qkv_proj" in attn
                     else ("q_proj", "k_proj", "v_proj")):
            _fold_into_dense(attn[proj], w)
        layer["input_layernorm"]["weight"] = jnp.ones_like(w)
        if "mlp" in layer and cfg.moe_name is None:
            w = layer["post_attention_layernorm"]["weight"]
            mlp = layer["mlp"]
            for proj in ("gate_up_proj", "gate_proj", "up_proj"):
                if proj in mlp:
                    _fold_into_dense(mlp[proj], w)
            layer["post_attention_layernorm"]["weight"] = jnp.ones_like(w)
    if "lm_head" in root and not cfg.tie_word_embeddings:
        w = root["norm"]["weight"]
        _fold_into_dense(root["lm_head"], w)
        root["norm"]["weight"] = jnp.ones_like(w)
    return p
