"""JAX pytree -> HF checkpoint export (the inverse of hf_loader).

Lets models trained/converted in this framework round-trip back to the
reference's released-checkpoint layout (moe_model/model/builder.py:29-184
loading conventions: `model.vision_tower.vision_tower.*`,
`model.mm_projector.*`, `model.layers.*`, `lm_head.weight`), so a user of
the torch reference can load weights produced here with no glue code.

Every transpose here mirrors hf_loader exactly: flax Dense kernels are
[in, out] while torch Linear weights are [out, in]; conv kernels go
[kh, kw, in, out] -> [out, in, kh, kw]; stacked expert tensors
(experts_w1 [E, in, h] ...) unstack into `moelayer.experts.<i>.(fc1|fc2)`
(vision) / `moelayer.experts.<i>.(0|2)` (projector Sequential layout).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from .decoder import DecoderConfig
from .vision import VisionConfig


def _np(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x))


def _dense_out(out: Dict[str, np.ndarray], name: str, p: Dict):
    out[f"{name}.weight"] = _np(p["kernel"]).T.copy()
    if "bias" in p:
        out[f"{name}.bias"] = _np(p["bias"])


def _rms_out(out, name, p):
    out[f"{name}.weight"] = _np(p["weight"])


def _ln_out(out, name, p):
    out[f"{name}.weight"] = _np(p["scale"])
    out[f"{name}.bias"] = _np(p["bias"])


def export_decoder(params: Dict, cfg: DecoderConfig,
                   prefix: str = "model.") -> Dict[str, np.ndarray]:
    """DecoderLM params -> HF llama-family state dict
    (inverse of hf_loader.convert_decoder)."""
    out: Dict[str, np.ndarray] = {}
    out[prefix + "embed_tokens.weight"] = _np(
        params["embed_tokens"]["embedding"])
    _rms_out(out, prefix + "norm", params["norm"])
    if not cfg.tie_word_embeddings:
        out["lm_head.weight"] = _np(
            params["lm_head"]["kernel"]).T.copy()
    for li in range(cfg.num_hidden_layers):
        lp = params[f"layers_{li}"]
        p = f"{prefix}layers.{li}."
        _rms_out(out, p + "input_layernorm", lp["input_layernorm"])
        _rms_out(out, p + "post_attention_layernorm",
                 lp["post_attention_layernorm"])
        attn = lp["self_attn"]
        if cfg.fused_qkv:
            _dense_out(out, p + "self_attn.qkv_proj", attn["qkv_proj"])
        else:
            for n in ("q_proj", "k_proj", "v_proj"):
                _dense_out(out, p + f"self_attn.{n}", attn[n])
        _dense_out(out, p + "self_attn.o_proj", attn["o_proj"])
        mlp = lp["mlp"]
        if cfg.fused_qkv:
            _dense_out(out, p + "mlp.gate_up_proj", mlp["gate_up_proj"])
        else:
            _dense_out(out, p + "mlp.gate_proj", mlp["gate_proj"])
            _dense_out(out, p + "mlp.up_proj", mlp["up_proj"])
        _dense_out(out, p + "mlp.down_proj", mlp["down_proj"])
    return out


def _unstack_expert_mlps(out: Dict[str, np.ndarray], moe: Dict,
                         prefix: str, sequential_naming: bool):
    """Inverse of hf_loader._stack_expert_mlps. sequential_naming=True
    emits the projector's Sequential indices (0/2), else fc1/fc2."""
    n_experts = moe["experts_w1"].shape[0]
    n1, n2 = ("0", "2") if sequential_naming else ("fc1", "fc2")
    for i in range(n_experts):
        base = f"{prefix}moelayer.experts.{i}."
        out[base + f"{n1}.weight"] = _np(moe["experts_w1"][i]).T.copy()
        out[base + f"{n1}.bias"] = _np(moe["experts_b1"][i])
        out[base + f"{n2}.weight"] = _np(moe["experts_w2"][i]).T.copy()
        out[base + f"{n2}.bias"] = _np(moe["experts_b2"][i])
    out[f"{prefix}moelayer.gate.weight"] = _np(
        moe["gate_kernel"]).T.copy()


def export_siglip_tower(params: Dict, cfg: VisionConfig,
                        prefix: str = "vision_model."
                        ) -> Dict[str, np.ndarray]:
    """SiglipSMoEVisionTower params -> SigLIP state dict
    (inverse of hf_loader.convert_siglip_tower)."""
    out: Dict[str, np.ndarray] = {}
    emb = params["embeddings"]
    # flax conv [kh, kw, in, out] -> torch [out, in, kh, kw]
    out[prefix + "embeddings.patch_embedding.weight"] = _np(
        np.transpose(emb["patch_embedding"]["kernel"], (3, 2, 0, 1)))
    out[prefix + "embeddings.patch_embedding.bias"] = _np(
        emb["patch_embedding"]["bias"])
    out[prefix + "embeddings.position_embedding.weight"] = _np(
        emb["position_embedding"])
    for li in range(cfg.num_hidden_layers):
        lp = params[f"layers_{li}"]
        p = f"{prefix}encoder.layers.{li}."
        _ln_out(out, p + "layer_norm1", lp["layer_norm1"])
        _ln_out(out, p + "layer_norm2", lp["layer_norm2"])
        for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _dense_out(out, p + f"self_attn.{n}", lp["self_attn"][n])
        if cfg.moe_name is None:
            _dense_out(out, p + "mlp.fc1", lp["mlp"]["fc1"])
            _dense_out(out, p + "mlp.fc2", lp["mlp"]["fc2"])
        else:
            _unstack_expert_mlps(out, lp["moelayer"], p,
                                 sequential_naming=False)
    return out


def export_mlpmoe_projector(params: Dict, prefix: str = "mm_projector."
                            ) -> Dict[str, np.ndarray]:
    """MLPMoE projector params -> `moelayer.experts.<i>.{0,2}` state dict
    (inverse of hf_loader.convert_mlpmoe_projector)."""
    out: Dict[str, np.ndarray] = {}
    _unstack_expert_mlps(out, params["moelayer"], prefix,
                         sequential_naming=True)
    return out


def export_plain_projector(params: Dict, prefix: str = "mm_projector."
                           ) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if "fc" in params:  # linear projector
        out[prefix + "weight"] = _np(params["fc"]["kernel"]).T.copy()
        out[prefix + "bias"] = _np(params["fc"]["bias"])
        return out
    # mlpNx_gelu Sequential: Linear at even indices (0, 2, 4, ...)
    idxs = sorted(int(k.split("_")[1]) for k in params
                  if k.startswith("mlp_"))
    for i in idxs:
        seq_idx = 2 * i
        out[f"{prefix}{seq_idx}.weight"] = _np(
            params[f"mlp_{i}"]["kernel"]).T.copy()
        out[f"{prefix}{seq_idx}.bias"] = _np(params[f"mlp_{i}"]["bias"])
    return out


def export_mpt(params: Dict, cfg: DecoderConfig,
               prefix: str = "transformer.") -> Dict[str, np.ndarray]:
    """DecoderLM (MPT variant) params -> HF MptForCausalLM state dict
    (inverse of hf_loader.convert_mpt)."""
    out: Dict[str, np.ndarray] = {}
    out[prefix + "wte.weight"] = _np(params["embed_tokens"]["embedding"])
    out[prefix + "norm_f.weight"] = _np(params["norm"]["weight"])
    if not cfg.tie_word_embeddings:
        out["lm_head.weight"] = _np(params["lm_head"]["kernel"]).T.copy()
    for li in range(cfg.num_hidden_layers):
        lp = params[f"layers_{li}"]
        p = f"{prefix}blocks.{li}."
        out[p + "norm_1.weight"] = _np(lp["input_layernorm"]["weight"])
        out[p + "norm_2.weight"] = _np(
            lp["post_attention_layernorm"]["weight"])
        out[p + "attn.Wqkv.weight"] = _np(
            lp["self_attn"]["qkv_proj"]["kernel"]).T.copy()
        out[p + "attn.out_proj.weight"] = _np(
            lp["self_attn"]["o_proj"]["kernel"]).T.copy()
        out[p + "ffn.up_proj.weight"] = _np(
            lp["mlp"]["up_proj"]["kernel"]).T.copy()
        out[p + "ffn.down_proj.weight"] = _np(
            lp["mlp"]["down_proj"]["kernel"]).T.copy()
    return out


def export_llava_checkpoint(params: Dict, cfg) -> Dict[str, np.ndarray]:
    """LlavaModel params -> the released-5.1B flat state-dict layout."""
    out: Dict[str, np.ndarray] = {}
    out.update(export_siglip_tower(
        params["vision_tower"], cfg.vision,
        prefix="model.vision_tower.vision_tower."))
    if cfg.projector.projector_type == "moe":
        out.update(export_mlpmoe_projector(
            params["mm_projector"], prefix="model.mm_projector."))
    else:
        out.update(export_plain_projector(
            params["mm_projector"], prefix="model.mm_projector."))
    out.update(export_decoder(params["language_model"], cfg.decoder,
                              prefix="model."))
    return out


def save_hf_checkpoint(params: Dict, cfg, out_dir,
                       hf_config: Optional[dict] = None) -> Path:
    """Write model.safetensors (+ config.json) in the reference layout;
    the result loads with builder.load_pretrained_model AND with the
    torch reference's loading path."""
    from safetensors.numpy import save_file

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    sd = export_llava_checkpoint(params, cfg)
    sd = {k: np.asarray(v, np.float32) if v.dtype not in (
        np.float32, np.float16) else v for k, v in sd.items()}
    save_file(sd, str(out_dir / "model.safetensors"))
    if hf_config is not None:
        (out_dir / "config.json").write_text(json.dumps(hf_config,
                                                        indent=1))
    return out_dir / "model.safetensors"
