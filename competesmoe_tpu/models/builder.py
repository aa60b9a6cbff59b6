"""Checkpoint loader: assemble a LlavaModel from an HF-format
CompeteSMoE checkpoint directory.

Re-design of `moe_model/model/builder.py:29-184` (`load_pretrained_model`):
reads config.json for geometry/MoE settings, converts the safetensors/bin
state dict (the released CompeteSMoE-5.1B layout:
`model.vision_tower.vision_tower.*`, `model.mm_projector.moelayer.*`,
`model.layers.*`, `lm_head.*`) into our param trees, and returns
(tokenizer, model, params, image_processor, context_len).

Name-based dispatch mirrors the reference: "mistral"/"llama"/"smollm" in
the model name pick the split-projection decoder; the default is the
Phi-3(.5) fused layout.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..moe.config import MoEArgs
from ..multimodal.mm_utils import ImageProcessorConfig
from .decoder import DecoderConfig
from .hf_loader import (
    _strip_prefix,
    convert_decoder,
    convert_mlpmoe_projector,
    convert_siglip_tower,
    load_torch_state_dict,
)
from .llava import LlavaConfig, LlavaModel
from .projector import ProjectorConfig
from .vision import VisionConfig


def decoder_config_from_hf(cfg: Dict, model_name: str = "",
                           dtype=jnp.bfloat16) -> DecoderConfig:
    name = model_name.lower()
    fused = not any(k in name for k in ("mistral", "llama", "smollm",
                                        "mixtral"))
    if cfg.get("model_type") in ("mistral", "llama", "mixtral"):
        fused = False
    rs = cfg.get("rope_scaling") or {}
    return DecoderConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        num_key_value_heads=cfg.get("num_key_value_heads",
                                    cfg["num_attention_heads"]),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
        rope_theta=cfg.get("rope_theta", 10000.0),
        max_position_embeddings=cfg.get("max_position_embeddings", 4096),
        original_max_position_embeddings=cfg.get(
            "original_max_position_embeddings",
            cfg.get("max_position_embeddings", 4096)),
        rope_scaling_type=rs.get("type") or rs.get("rope_type"),
        rope_short_factor=tuple(rs["short_factor"])
        if "short_factor" in rs else None,
        rope_long_factor=tuple(rs["long_factor"])
        if "long_factor" in rs else None,
        sliding_window=cfg.get("sliding_window"),
        tie_word_embeddings=cfg.get("tie_word_embeddings", False),
        fused_qkv=fused, dtype=dtype)


def moe_args_from_hf(cfg: Dict) -> MoEArgs:
    return MoEArgs(
        balance_loss_coef=cfg.get("balance_loss_coef", 0.01),
        router_z_loss_coef=cfg.get("router_z_loss_coef", 0.001),
        rate_flip=cfg.get("rate_flip", 0.05),
        warm_up=cfg.get("warm_up", 0.0),
        max_compete_in_iter=cfg.get("max_compete_in_iter", 2),
        router_loss_coef=cfg.get("router_loss_coef", 0.01),
        diversity_loss_coef=cfg.get("diversity_loss_coef", 0.01),
        bal_comp_loss_coef=cfg.get("bal_comp_loss_coef", 0.01),
        router_theta=cfg.get("router_theta", 1.0),
        hybrid=cfg.get("hybrid", False))


def llava_config_from_hf(cfg: Dict, model_name: str = "",
                         dtype=jnp.bfloat16) -> LlavaConfig:
    vision_cfg_d = cfg.get("vision_config", {})
    moe_name = cfg.get("moe_name", "smoe")
    moe_args = moe_args_from_hf(cfg)
    clip_smoe = cfg.get("clip_smoe", True)
    mlp_smoe = cfg.get("mlp_smoe", True)
    vis = VisionConfig(
        hidden_size=vision_cfg_d.get("hidden_size", 1152),
        intermediate_size=vision_cfg_d.get("intermediate_size", 4304),
        num_hidden_layers=vision_cfg_d.get("num_hidden_layers", 27),
        num_attention_heads=vision_cfg_d.get("num_attention_heads", 16),
        image_size=vision_cfg_d.get("image_size", 224),
        patch_size=vision_cfg_d.get("patch_size", 14),
        moe_name=moe_name if clip_smoe else None,
        num_experts=cfg.get("num_experts", 4),
        num_selected=cfg.get("num_selected", 2),
        moe_args=moe_args, dtype=dtype)
    scales = cfg.get("scales", [1])
    proj = ProjectorConfig(
        projector_type=cfg.get("mm_projector_type",
                               "moe" if mlp_smoe else "mlp2x_gelu"),
        mm_hidden_size=cfg.get("mm_hidden_size", vis.hidden_size),
        hidden_size=cfg["hidden_size"], n_scales=len(scales),
        moe_name=moe_name, num_experts=cfg.get("num_experts", 4),
        num_selected=cfg.get("num_selected", 2), moe_args=moe_args,
        dtype=dtype)
    dec = decoder_config_from_hf(cfg, model_name, dtype)
    return LlavaConfig(
        vision=vis, projector=proj, decoder=dec,
        tokenizer_model_max_length=cfg.get("tokenizer_model_max_length",
                                           2048))


def convert_llava_checkpoint(sd: Dict[str, np.ndarray],
                             cfg: LlavaConfig) -> Dict:
    """Released-checkpoint state dict -> LlavaModel params."""
    vision_sd = _strip_prefix(sd, "model.vision_tower.vision_tower.")
    proj_sd = _strip_prefix(sd, "model.mm_projector.")
    params = {
        "vision_tower": convert_siglip_tower(vision_sd, cfg.vision,
                                             prefix=""),
        "mm_projector": convert_mlpmoe_projector(
            proj_sd, cfg.projector.num_experts, prefix="")
        if cfg.projector.projector_type == "moe" else
        _convert_plain_projector(proj_sd, cfg.projector),
        "language_model": convert_decoder(sd, cfg.decoder,
                                          prefix="model."),
    }
    return params


def _convert_plain_projector(sd: Dict[str, np.ndarray],
                             pcfg: ProjectorConfig) -> Dict:
    if pcfg.projector_type == "linear":
        return {"fc": {"kernel": np.ascontiguousarray(sd["weight"].T),
                       "bias": sd["bias"]}}
    out = {}
    idx = 0
    for name in sorted(sd):
        if name.endswith(".weight"):
            base = name[:-len(".weight")]
            out[f"mlp_{idx}"] = {
                "kernel": np.ascontiguousarray(sd[name].T),
                "bias": sd[base + ".bias"]}
            idx += 1
    return out


def load_pretrained_model(model_path, model_name: Optional[str] = None,
                          dtype=jnp.bfloat16
                          ) -> Tuple[object, LlavaModel, Dict,
                                     ImageProcessorConfig, int]:
    """(tokenizer, model, params, image_processor, context_len) — the
    reference builder.py:29-184 return contract."""
    model_path = Path(model_path)
    model_name = model_name or model_path.name
    hf_cfg = json.loads((model_path / "config.json").read_text())
    cfg = llava_config_from_hf(hf_cfg, model_name, dtype)
    sd = load_torch_state_dict(model_path)
    params = convert_llava_checkpoint(sd, cfg)
    model = LlavaModel(cfg)
    tokenizer = None
    try:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(str(model_path))
    except Exception:
        pass
    image_processor = ImageProcessorConfig(size=cfg.vision.image_size)
    context_len = hf_cfg.get("max_sequence_length",
                             hf_cfg.get("tokenizer_model_max_length",
                                        2048))
    return tokenizer, model, {"params": params}, image_processor, \
        context_len
