"""Vision towers: SigLIP / CLIP ViT with MoE-fied MLP blocks, and the S²
multi-scale ("scaling_on_scales") wrapper.

Re-design of `moe_model/model/multimodal_encoder/{siglip_smoe,siglip,
clip_smoe,clip,clip_encoder}.py`:

- `SiglipSMoEVisionTower`: from-scratch ViT (conv patch embed + learned
  positions, no CLS) whose per-block MLP is a registry MoE layer
  (siglip_smoe.py:99-307). Per reference behavior the tower's output is the
  *input to the last block* (`encoder_states[-1]`, siglip_smoe.py:190-215 —
  the structural equivalent of CLIP's select_layer=-2); the last block's
  aux losses still count.
- `CLIPSMoEVisionTower`: CLIP variant — CLS token + pre-layernorm
  (clip_smoe.py:107-231), patch/cls_patch feature select.
- `multiscale_forward`: S² — resize to each scale, split into sub-squares,
  batch through the tower, merge + area-interpolate to the base grid,
  concat channel-wise (clip_encoder.py:34-166).

Parameter names mirror the HF checkpoints' module paths (q_proj, fc1, ...)
so `hf_loader` conversion is mechanical.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..moe.config import MoEArgs
from ..moe.layers import MoEAux, zero_aux
from ..moe.registry import get_moe


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    """SigLIP/CLIP vision-transformer geometry (HF config fields)."""

    hidden_size: int = 1152            # siglip-so400m
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    num_channels: int = 3
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu_tanh"      # gelu_pytorch_tanh
    use_cls_token: bool = False        # True for CLIP
    tower_type: str = "siglip"         # 'siglip' | 'clip' (builder.py:29-
                                       # 184 dispatch by mm_vision_tower)
    # MoE-ification
    moe_name: Optional[str] = None     # None -> dense MLP blocks
    num_experts: int = 4
    num_selected: int = 2
    moe_args: MoEArgs = MoEArgs()
    dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size


def _act(name: str):
    if name in ("gelu_tanh", "gelu_pytorch_tanh", "quick_gelu"):
        if name == "quick_gelu":
            return lambda x: x * jax.nn.sigmoid(1.702 * x)
        return lambda x: jax.nn.gelu(x, approximate=True)
    return lambda x: jax.nn.gelu(x, approximate=False)


class VisionAttention(nn.Module):
    """Standard MHA with biased projections (HF SiglipAttention /
    CLIPAttention layout)."""

    cfg: VisionConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        d, h = cfg.hidden_size, cfg.num_attention_heads
        p = d // h
        dense = lambda name: nn.Dense(d, dtype=cfg.dtype, name=name)
        q = dense("q_proj")(x).reshape(*x.shape[:-1], h, p)
        k = dense("k_proj")(x).reshape(*x.shape[:-1], h, p)
        v = dense("v_proj")(x).reshape(*x.shape[:-1], h, p)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (p ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(*x.shape[:-1], d)
        return dense("out_proj")(out)


class VisionMLP(nn.Module):
    """fc1 -> act -> fc2 (HF SiglipMLP/CLIPMLP layout)."""

    cfg: VisionConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        x = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(x)
        x = _act(cfg.hidden_act)(x)
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(x)


class VisionEncoderLayer(nn.Module):
    """Pre-LN block; MLP is dense or a registry MoE layer
    (siglip_smoe.py:99-160)."""

    cfg: VisionConfig
    # flip-schedule warm-up prefix: no competition while step < step_warm
    # (competesmoe.py:347) — the per-call flips row covers post-warm only
    step_warm: int = 0

    def setup(self):
        cfg = self.cfg
        self.self_attn = VisionAttention(cfg)
        self.layer_norm1 = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                        dtype=cfg.dtype)
        self.layer_norm2 = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                        dtype=cfg.dtype)
        if cfg.moe_name is not None:
            moe_cls = get_moe(cfg.moe_name)
            kw = {}
            if "step_warm" in getattr(moe_cls, "__dataclass_fields__", {}):
                kw["step_warm"] = self.step_warm
            self.moelayer = moe_cls(
                in_dim=cfg.hidden_size, out_dim=cfg.hidden_size,
                n_experts=cfg.num_experts, n_selected=cfg.num_selected,
                args=cfg.moe_args,
                expert_hidden_dim=cfg.intermediate_size,
                expert_act="gelu_tanh" if "tanh" in cfg.hidden_act
                else ("quick_gelu" if cfg.hidden_act == "quick_gelu"
                      else "gelu"), **kw)
        else:
            self.mlp = VisionMLP(cfg)

    def __call__(self, x, *, step=None, train=False,
                 return_id_experts=False, flips=None
                 ) -> Tuple[jax.Array, MoEAux]:
        res = x
        x = self.layer_norm1(x)
        x = res + self.self_attn(x)
        res = x
        x = self.layer_norm2(x)
        if self.cfg.moe_name is not None:
            kwargs = {}
            if flips is not None:
                kwargs["flips"] = flips
            out, aux = self.moelayer(x, step=step, train=train,
                                     return_id_experts=return_id_experts,
                                     **kwargs)
        else:
            out, aux = self.mlp(x), zero_aux(x)
        return res + out, aux


class SiglipVisionEmbeddings(nn.Module):
    """Conv patch embedding + learned positions, no CLS
    (siglip_smoe.py:222-280)."""

    cfg: VisionConfig

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        cfg = self.cfg
        # pixel_values: [B, H, W, C] (NHWC — converted from torch NCHW by
        # the image pipeline)
        patches = nn.Conv(cfg.hidden_size,
                          kernel_size=(cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          padding="VALID", dtype=cfg.dtype,
                          name="patch_embedding")(pixel_values)
        b, gh, gw, d = patches.shape
        patches = patches.reshape(b, gh * gw, d)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.02),
                         (cfg.num_patches, cfg.hidden_size))
        return patches + pos[None].astype(patches.dtype)


class SiglipSMoEVisionTower(nn.Module):
    """SigLIP ViT with MoE MLP blocks; returns (features, layer aux list).

    features = hidden state *entering* the last block (reference parity,
    see module docstring); aux covers every block.
    """

    cfg: VisionConfig
    flip_schedule: Optional[Any] = dataclasses.field(
        default=None, compare=False, hash=False)

    def setup(self):
        self.embeddings = SiglipVisionEmbeddings(self.cfg)
        warm = (self.flip_schedule.step_warm
                if self.flip_schedule is not None else 0)
        self.layers = [VisionEncoderLayer(self.cfg, step_warm=warm)
                       for _ in range(self.cfg.num_hidden_layers)]

    def __call__(self, pixel_values, *, step=None, train=False,
                 return_id_experts=False):
        x = self.embeddings(pixel_values)
        penultimate = x
        auxes: List[MoEAux] = []
        for li, layer in enumerate(self.layers):
            flips = None
            if self.flip_schedule is not None:
                flips = self.flip_schedule.flips[li]
            penultimate = x  # input to layer li
            x, aux = layer(x, step=step, train=train,
                           return_id_experts=return_id_experts, flips=flips)
            auxes.append(aux)
        total = sum((a.aux_loss for a in auxes),
                    jnp.zeros((), jnp.float32)) / max(len(auxes), 1)
        return penultimate, total, auxes


class CLIPVisionEmbeddings(nn.Module):
    """CLIP: CLS token + conv patches + positions (clip_smoe.py)."""

    cfg: VisionConfig

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        cfg = self.cfg
        patches = nn.Conv(cfg.hidden_size,
                          kernel_size=(cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          padding="VALID", use_bias=False, dtype=cfg.dtype,
                          name="patch_embedding")(pixel_values)
        b, gh, gw, d = patches.shape
        patches = patches.reshape(b, gh * gw, d)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,))
        cls = jnp.broadcast_to(cls.astype(patches.dtype), (b, 1, d))
        x = jnp.concatenate([cls, patches], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.num_patches + 1, cfg.hidden_size))
        return x + pos[None].astype(x.dtype)


class CLIPSMoEVisionTower(nn.Module):
    """CLIP ViT (+optional MoE MLP blocks) with pre-layernorm and
    patch/cls_patch feature select (clip_smoe.py:107-231)."""

    cfg: VisionConfig
    select_feature: str = "patch"
    flip_schedule: Optional[Any] = dataclasses.field(
        default=None, compare=False, hash=False)

    def setup(self):
        self.embeddings = CLIPVisionEmbeddings(self.cfg)
        self.pre_layrnorm = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps,
                                         dtype=self.cfg.dtype)
        warm = (self.flip_schedule.step_warm
                if self.flip_schedule is not None else 0)
        self.layers = [VisionEncoderLayer(self.cfg, step_warm=warm)
                       for _ in range(self.cfg.num_hidden_layers)]

    def __call__(self, pixel_values, *, step=None, train=False,
                 return_id_experts=False):
        x = self.embeddings(pixel_values)
        x = self.pre_layrnorm(x)
        penultimate = x
        auxes: List[MoEAux] = []
        for li, layer in enumerate(self.layers):
            flips = None
            if self.flip_schedule is not None:
                flips = self.flip_schedule.flips[li]
            penultimate = x
            x, aux = layer(x, step=step, train=train,
                           return_id_experts=return_id_experts, flips=flips)
            auxes.append(aux)
        feats = penultimate
        if self.select_feature == "patch":
            feats = feats[:, 1:]
        elif self.select_feature != "cls_patch":
            raise ValueError(f"bad select_feature {self.select_feature!r}")
        total = sum((a.aux_loss for a in auxes),
                    jnp.zeros((), jnp.float32)) / max(len(auxes), 1)
        return feats, total, auxes


# ---------------------------------------------------------------------------
# S² multi-scale wrapper (scaling_on_scales)
# ---------------------------------------------------------------------------

def split_chessboard(x: jax.Array, num_split: int) -> jax.Array:
    """[B, H, W, C] -> [B*n*n, H/n, W/n, C] (clip_encoder.py:42-55)."""
    b, h, w, c = x.shape
    hs, ws = h // num_split, w // num_split
    x = x.reshape(b, num_split, hs, num_split, ws, c)
    x = x.transpose(1, 3, 0, 2, 4, 5)
    return x.reshape(num_split * num_split * b, hs, ws, c)


def merge_chessboard(x: jax.Array, num_split: int) -> jax.Array:
    """Inverse of split_chessboard on feature grids
    (clip_encoder.py:57-69)."""
    bn, h, w, c = x.shape
    b = bn // (num_split * num_split)
    x = x.reshape(num_split, num_split, b, h, w, c)
    x = x.transpose(2, 0, 3, 1, 4, 5)
    return x.reshape(b, num_split * h, num_split * w, c)


def _resize_bilinear(x: jax.Array, size: int) -> jax.Array:
    return jax.image.resize(x, (x.shape[0], size, size, x.shape[-1]),
                            method="bilinear")


def multiscale_features(tower_fn, pixel_values: jax.Array,
                        scales: Tuple[int, ...] = (1, 3),
                        base_size: Optional[int] = None) -> jax.Array:
    """S² forward: per scale s — resize to s*base, split into s² tiles,
    run the tower batched, merge, area-resize to the base grid — then
    concat channels (clip_encoder.py:71-118 `multiscale_forward`).

    tower_fn: [N, H, W, C] -> [N, P, D] patch features.
    Returns [B, P, D * len(scales)].
    """
    b, h, w, c = pixel_values.shape
    base = base_size or h
    grids = []
    base_grid = None
    for s in scales:
        img = pixel_values if s * base == h else _resize_bilinear(
            pixel_values, s * base)
        tiles = split_chessboard(img, s) if s > 1 else img
        feats = tower_fn(tiles)  # [B*s*s, P, D]
        n, p, d = feats.shape
        side = int(round(p ** 0.5))
        feats = feats.reshape(n, side, side, d)
        if s > 1:
            feats = merge_chessboard(feats, s)
        if base_grid is None:
            base_grid = feats.shape[1]
        if feats.shape[1] != base_grid:
            feats = jax.image.resize(
                feats, (b, base_grid, base_grid, d), method="linear")
        grids.append(feats)
    out = jnp.concatenate(grids, axis=-1)
    return out.reshape(b, base_grid * base_grid, -1)
