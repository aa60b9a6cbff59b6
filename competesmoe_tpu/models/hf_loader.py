"""HF checkpoint -> JAX pytree weight conversion.

Covers the weight-loading paths of the reference
(moe_model/model/builder.py:29-184 and llava_arch.py:110-196):

- decoder LMs (Phi-3.5 / Llama / Mistral / SmolLM state dicts)
- SigLIP/CLIP vision towers, dense or MoE-fied, including
  * sparse upcycling: replicate a dense MLP into every expert
    (llava_arch.py:128-134, train-time init), and
  * loading already-MoE-fied checkpoints (the released CompeteSMoE-5.1B
    layout with `moelayer.experts.<i>` keys)
- the mm projector (linear / mlpNx_gelu / MLPMoE)

All functions take a flat `{name: np.ndarray}` state dict (use
`load_torch_state_dict` for .safetensors/.bin files) and return flax
param trees matching models/{decoder,vision,projector}.py.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from .decoder import DecoderConfig
from .vision import VisionConfig


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    """Load .safetensors / .bin (torch) files, or a directory of shards."""
    p = Path(path)
    files = []
    if p.is_dir():
        files = sorted(p.glob("*.safetensors")) or sorted(p.glob("*.bin"))
    else:
        files = [p]
    out: Dict[str, np.ndarray] = {}
    for f in files:
        if f.suffix == ".safetensors":
            from safetensors.numpy import load_file
            out.update(load_file(str(f)))
        else:
            import torch
            sd = torch.load(str(f), map_location="cpu", weights_only=True)
            out.update({k: v.float().numpy() if v.dtype == torch.bfloat16
                        else v.numpy() for k, v in sd.items()})
    return out


def _strip_prefix(sd: Dict[str, np.ndarray], prefix: str):
    return {k[len(prefix):]: v for k, v in sd.items()
            if k.startswith(prefix)}


def _dense(sd, name, bias=None):
    out = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    bias_key = f"{name}.bias"
    if bias_key in sd:
        out["bias"] = sd[bias_key]
    return out


def _rms(sd, name):
    return {"weight": sd[f"{name}.weight"]}


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def convert_decoder(sd: Dict[str, np.ndarray], cfg: DecoderConfig,
                    prefix: str = "model.") -> Dict:
    """HF llama-family state dict -> DecoderLM params."""
    m = _strip_prefix(sd, prefix) if prefix else dict(sd)
    params: Dict = {
        "embed_tokens": {"embedding": m["embed_tokens.weight"]},
        "norm": _rms(m, "norm"),
    }
    if not cfg.tie_word_embeddings:
        head_key = "lm_head.weight"
        head = sd.get(head_key, m.get(head_key))
        if head is None:
            raise KeyError("lm_head.weight not found")
        params["lm_head"] = {"kernel": np.ascontiguousarray(head.T)}
    for li in range(cfg.num_hidden_layers):
        p = f"layers.{li}."
        attn = {}
        if cfg.fused_qkv:
            attn["qkv_proj"] = _dense(m, p + "self_attn.qkv_proj")
        else:
            for n in ("q_proj", "k_proj", "v_proj"):
                attn[n] = _dense(m, p + f"self_attn.{n}")
        attn["o_proj"] = _dense(m, p + "self_attn.o_proj")
        layer_params = {
            "input_layernorm": _rms(m, p + "input_layernorm"),
            "post_attention_layernorm": _rms(
                m, p + "post_attention_layernorm"),
            "self_attn": attn,
        }
        if (p + "block_sparse_moe.gate.weight") in m:
            # HF Mixtral MoE FFN: the reference keeps these exact tensors
            # and only rewires the forward (smoe_mixtral_helper.py:20-77)
            # -> MixtralMoELayer's stacked layout, loaded verbatim
            bp = p + "block_sparse_moe."
            n_exp = cfg.num_experts
            layer_params["moe"] = {
                "gate_kernel": np.ascontiguousarray(
                    m[bp + "gate.weight"].T),
                "experts_w1": np.stack(
                    [m[bp + f"experts.{i}.w1.weight"].T
                     for i in range(n_exp)]),
                "experts_w3": np.stack(
                    [m[bp + f"experts.{i}.w3.weight"].T
                     for i in range(n_exp)]),
                "experts_w2": np.stack(
                    [m[bp + f"experts.{i}.w2.weight"].T
                     for i in range(n_exp)]),
            }
        elif cfg.fused_qkv:
            layer_params["mlp"] = {
                "gate_up_proj": _dense(m, p + "mlp.gate_up_proj"),
                "down_proj": _dense(m, p + "mlp.down_proj")}
        else:
            layer_params["mlp"] = {
                "gate_proj": _dense(m, p + "mlp.gate_proj"),
                "up_proj": _dense(m, p + "mlp.up_proj"),
                "down_proj": _dense(m, p + "mlp.down_proj")}
        params[f"layers_{li}"] = layer_params
    return params


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------

def _conv_kernel(w: np.ndarray) -> np.ndarray:
    # torch conv [out, in, kh, kw] -> flax [kh, kw, in, out]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _stack_expert_mlps(get, n_experts: int):
    """Stack per-expert fc1/fc2 (or Sequential 0/2) into our tensors."""
    w1 = np.stack([np.ascontiguousarray(get(i, "fc1", "weight").T)
                   for i in range(n_experts)])
    b1 = np.stack([get(i, "fc1", "bias") for i in range(n_experts)])
    w2 = np.stack([np.ascontiguousarray(get(i, "fc2", "weight").T)
                   for i in range(n_experts)])
    b2 = np.stack([get(i, "fc2", "bias") for i in range(n_experts)])
    return {"experts_w1": w1, "experts_b1": b1,
            "experts_w2": w2, "experts_b2": b2}


def convert_siglip_tower(sd: Dict[str, np.ndarray], cfg: VisionConfig,
                         prefix: str = "vision_model.",
                         upcycle: bool = False,
                         rng: Optional[np.random.Generator] = None) -> Dict:
    """SigLIP vision state dict -> SiglipSMoEVisionTower params.

    upcycle=True: the state dict is a *dense* tower; each block's MLP is
    replicated into all experts and a fresh N(0,0.02) gate is drawn
    (sparse upcycling init, llava_arch.py:128-156 + moe.py:50-70).
    Otherwise expects `moelayer.experts.<i>.(fc1|fc2)` keys (trained MoE
    checkpoints, e.g. the released 5.1B).
    """
    m = _strip_prefix(sd, prefix) if prefix else dict(sd)
    rng = rng or np.random.default_rng(42)
    params: Dict = {
        "embeddings": {
            "patch_embedding": {
                "kernel": _conv_kernel(
                    m["embeddings.patch_embedding.weight"]),
                "bias": m["embeddings.patch_embedding.bias"],
            },
            "position_embedding": m["embeddings.position_embedding.weight"],
        },
    }
    _convert_vision_layers(m, cfg, params, upcycle, rng)
    return params


def _convert_vision_layers(m: Dict[str, np.ndarray], cfg: VisionConfig,
                           params: Dict, upcycle: bool,
                           rng: np.random.Generator) -> None:
    """Shared SigLIP/CLIP encoder-block conversion: HF
    `encoder.layers.<i>` modules (identical layout in both towers) into
    `layers_<i>` trees, with dense MLPs either kept, replicated into all
    experts (sparse upcycling, llava_arch.py:128-156), or read from a
    trained `moelayer.experts.<i>` checkpoint."""
    for li in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{li}."
        layer: Dict = {
            "layer_norm1": _ln(m, p + "layer_norm1"),
            "layer_norm2": _ln(m, p + "layer_norm2"),
            "self_attn": {n: _dense(m, p + f"self_attn.{n}")
                          for n in ("q_proj", "k_proj", "v_proj",
                                    "out_proj")},
        }
        if cfg.moe_name is None:
            layer["mlp"] = {"fc1": _dense(m, p + "mlp.fc1"),
                            "fc2": _dense(m, p + "mlp.fc2")}
        else:
            if upcycle:
                def get(i, fc, kind):
                    return m[f"{p}mlp.{fc}.{kind}"]
            else:
                def get(i, fc, kind):
                    return m[f"{p}moelayer.experts.{i}.{fc}.{kind}"]
            moe = _stack_expert_mlps(get, cfg.num_experts)
            gate_key = f"{p}moelayer.gate.weight"
            if gate_key in m and not upcycle:
                moe["gate_kernel"] = np.ascontiguousarray(m[gate_key].T)
            else:
                moe["gate_kernel"] = rng.normal(
                    0.0, 0.02, (cfg.hidden_size, cfg.num_experts)
                ).astype(np.float32)
            layer["moelayer"] = moe
        params[f"layers_{li}"] = layer


def convert_clip_tower(sd: Dict[str, np.ndarray], cfg: VisionConfig,
                       prefix: str = "vision_model.",
                       upcycle: bool = False,
                       rng: Optional[np.random.Generator] = None) -> Dict:
    """CLIP vision state dict -> CLIPSMoEVisionTower params.

    Mirrors `convert_siglip_tower` with the CLIP embedding differences
    (ref clip_encoder.py:34-166 loads these via HF CLIPVisionModel):
    - CLS token (`embeddings.class_embedding`, a bare [D] parameter);
    - bias-free patch conv;
    - P+1 position embeddings (CLS gets slot 0);
    - the `pre_layrnorm` before the encoder stack (HF's spelling).
    upcycle=True replicates each block's dense MLP into all experts, as
    for SigLIP.
    """
    m = _strip_prefix(sd, prefix) if prefix else dict(sd)
    if ("embeddings.class_embedding" not in m
            and any(k.startswith("vision_model.") for k in m)):
        # HF CLIPVisionModel nests everything under vision_model.
        m = _strip_prefix(m, "vision_model.")
    rng = rng or np.random.default_rng(42)
    params: Dict = {
        "embeddings": {
            "patch_embedding": {
                "kernel": _conv_kernel(
                    m["embeddings.patch_embedding.weight"]),
            },
            "class_embedding": m["embeddings.class_embedding"],
            "position_embedding": m["embeddings.position_embedding.weight"],
        },
        "pre_layrnorm": _ln(m, "pre_layrnorm"),
    }
    _convert_vision_layers(m, cfg, params, upcycle, rng)
    return params


# ---------------------------------------------------------------------------
# Projector
# ---------------------------------------------------------------------------

def convert_mlpmoe_projector(sd: Dict[str, np.ndarray], n_experts: int,
                             prefix: str = "mm_projector.",
                             upcycle_from: Optional[Dict[str, np.ndarray]]
                             = None,
                             rng: Optional[np.random.Generator] = None
                             ) -> Dict:
    """MLPMoE projector weights.

    Trained layout: `moelayer.experts.<i>.{0,2}.weight/bias` (Sequential
    Linear-GELU-Linear, multimodal_projector/builder.py:55-67).
    upcycle_from: a dense 2-layer projector state dict (`0.weight`,
    `2.weight`, ...) replicated into every expert
    (llava_arch.py:113-121)."""
    rng = rng or np.random.default_rng(42)
    m = _strip_prefix(sd, prefix) if prefix else dict(sd)

    if upcycle_from is not None:
        def get(i, fc, kind):
            idx = "0" if fc == "fc1" else "2"
            return upcycle_from[f"{idx}.{kind}"]
    else:
        def get(i, fc, kind):
            idx = "0" if fc == "fc1" else "2"
            return m[f"moelayer.experts.{i}.{idx}.{kind}"]
    moe = _stack_expert_mlps(get, n_experts)
    gate_key = "moelayer.gate.weight"
    if gate_key in m and upcycle_from is None:
        moe["gate_kernel"] = np.ascontiguousarray(m[gate_key].T)
    else:
        in_dim = moe["experts_w1"].shape[1]
        moe["gate_kernel"] = rng.normal(
            0.0, 0.02, (in_dim, n_experts)).astype(np.float32)
    return {"moelayer": moe}


def convert_mpt(sd: Dict[str, np.ndarray], cfg: DecoderConfig,
                prefix: str = "transformer.") -> Dict:
    """HF MptForCausalLM state dict -> DecoderLM params (llava_mpt
    backbone: fused Wqkv, bias-free LayerNorm, alibi, gelu FFN, tied
    embeddings)."""
    m = _strip_prefix(sd, prefix) if prefix else dict(sd)
    params: Dict = {
        "embed_tokens": {"embedding": m["wte.weight"]},
        "norm": {"weight": m["norm_f.weight"]},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {
            "kernel": np.ascontiguousarray(sd["lm_head.weight"].T)}
    for li in range(cfg.num_hidden_layers):
        p = f"blocks.{li}."
        params[f"layers_{li}"] = {
            "input_layernorm": {"weight": m[p + "norm_1.weight"]},
            "post_attention_layernorm": {"weight": m[p + "norm_2.weight"]},
            "self_attn": {
                "qkv_proj": {"kernel": np.ascontiguousarray(
                    m[p + "attn.Wqkv.weight"].T)},
                "o_proj": {"kernel": np.ascontiguousarray(
                    m[p + "attn.out_proj.weight"].T)},
            },
            "mlp": {
                "up_proj": {"kernel": np.ascontiguousarray(
                    m[p + "ffn.up_proj.weight"].T)},
                "down_proj": {"kernel": np.ascontiguousarray(
                    m[p + "ffn.down_proj.weight"].T)},
            },
        }
    return params
