"""Golden parity vs. HuggingFace torch implementations (random weights,
built offline from configs): decoder logits and vision-tower features."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from competesmoe_tpu.models.decoder import DecoderConfig, DecoderLM, KVCache

pytestmark = pytest.mark.parity
from competesmoe_tpu.models.hf_loader import (
    convert_decoder,
    convert_siglip_tower,
)
from competesmoe_tpu.models.vision import SiglipSMoEVisionTower, VisionConfig

torch.manual_seed(0)


def _sd(model):
    return {k: v.detach().float().numpy()
            for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def phi3_pair():
    from transformers import Phi3Config, Phi3ForCausalLM
    hf_cfg = Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=512, original_max_position_embeddings=512,
        rope_theta=10000.0, tie_word_embeddings=False, pad_token_id=0)
    hf = Phi3ForCausalLM(hf_cfg).eval()
    cfg = DecoderConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=512, original_max_position_embeddings=512,
        fused_qkv=True, dtype=jnp.float32)
    params = convert_decoder(_sd(hf), cfg)
    return hf, cfg, params


def test_phi3_logits_parity(phi3_pair):
    hf, cfg, params = phi3_pair
    ids = torch.randint(0, 128, (2, 9))
    with torch.no_grad():
        want = hf(ids).logits.numpy()
    model = DecoderLM(cfg)
    logits, _, _ = model.apply({"params": params}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-4,
                               atol=2e-4)


def test_phi3_kv_cache_decode_matches_full_forward(phi3_pair):
    hf, cfg, params = phi3_pair
    model = DecoderLM(cfg)
    ids = np.random.default_rng(0).integers(0, 128, (2, 8)).astype(np.int32)
    full_logits, _, _ = model.apply({"params": params}, jnp.asarray(ids))

    cache = KVCache.create(cfg, batch=2, max_len=16)
    prefill, cache, _ = model.apply({"params": params},
                                    jnp.asarray(ids[:, :5]), cache=cache)
    np.testing.assert_allclose(np.asarray(prefill),
                               np.asarray(full_logits[:, :5]), rtol=2e-4,
                               atol=2e-4)
    for t in range(5, 8):
        step_logits, cache, _ = model.apply(
            {"params": params}, jnp.asarray(ids[:, t:t + 1]), cache=cache)
        np.testing.assert_allclose(np.asarray(step_logits[:, 0]),
                                   np.asarray(full_logits[:, t]),
                                   rtol=2e-4, atol=2e-4)


def test_llama_logits_parity():
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(
        vocab_size=96, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = DecoderConfig(
        vocab_size=96, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, original_max_position_embeddings=256,
        rms_norm_eps=1e-6,  # HF Llama default; Phi-3 uses 1e-5
        fused_qkv=False, dtype=jnp.float32)
    params = convert_decoder(_sd(hf), cfg)
    ids = torch.randint(0, 96, (2, 7))
    with torch.no_grad():
        want = hf(ids).logits.numpy()
    model = DecoderLM(cfg)
    logits, _, _ = model.apply({"params": params}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-4,
                               atol=2e-4)


def test_siglip_dense_tower_parity():
    from transformers import SiglipVisionConfig, SiglipVisionModel
    hf_cfg = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14)
    hf = SiglipVisionModel(hf_cfg).eval()
    cfg = VisionConfig(hidden_size=32, intermediate_size=64,
                       num_hidden_layers=3, num_attention_heads=2,
                       image_size=28, patch_size=14, moe_name=None)
    params = convert_siglip_tower(_sd(hf), cfg)
    px = torch.randn(2, 3, 28, 28)
    with torch.no_grad():
        # reference parity: tower output = hidden state ENTERING the last
        # block (siglip_smoe.py encoder_states[-1]) == HF hidden_states[-2]
        want = hf(px, output_hidden_states=True
                  ).hidden_states[-2].numpy()
    tower = SiglipSMoEVisionTower(cfg)
    feats, aux, _ = tower.apply(
        {"params": params}, jnp.asarray(px.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(feats), want, rtol=2e-4,
                               atol=2e-4)


def test_siglip_moe_upcycled_matches_dense_at_init():
    """Sparse upcycling: every expert = the dense MLP, so (weights sum to 1)
    the MoE tower's output equals the dense tower's at init."""
    from transformers import SiglipVisionConfig, SiglipVisionModel
    hf_cfg = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14)
    hf = SiglipVisionModel(hf_cfg).eval()
    sd = _sd(hf)
    dense_cfg = VisionConfig(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=2,
                             image_size=28, patch_size=14, moe_name=None)
    moe_cfg = VisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=28, patch_size=14, moe_name="smoe",
                           num_experts=4, num_selected=2)
    p_dense = convert_siglip_tower(sd, dense_cfg)
    p_moe = convert_siglip_tower(sd, moe_cfg, upcycle=True)
    px = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 28, 28, 3)).astype(np.float32))
    f_dense, _, _ = SiglipSMoEVisionTower(dense_cfg).apply(
        {"params": p_dense}, px)
    f_moe, _, _ = SiglipSMoEVisionTower(moe_cfg).apply(
        {"params": p_moe}, px)
    np.testing.assert_allclose(np.asarray(f_moe), np.asarray(f_dense),
                               rtol=2e-4, atol=2e-4)


def test_decoder_with_registry_moe_ffn():
    """Mixtral-style: decoder blocks with a registry MoE FFN
    (the initialize_smoe_modules role) runs, routes, and differentiates."""
    from competesmoe_tpu.moe import MoEArgs
    cfg = DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, original_max_position_embeddings=64,
        fused_qkv=False, moe_name="smoe", num_experts=4, num_selected=2,
        moe_args=MoEArgs(), dtype=jnp.float32)
    model = DecoderLM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 7)),
                      jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)

    def loss(params):
        logits, _, aux = model.apply(params, ids, train=True)
        return logits.sum() * 0 + aux["total_aux_loss"] + \
            (logits ** 2).mean()

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    moe_p = params["params"]["layers_0"]["moe"]
    assert "experts_w1" in moe_p and moe_p["experts_w1"].shape[0] == 4


def test_mpt_logits_parity():
    """MPT backbone: alibi attention, bias-free LayerNorm, GELU FFN,
    tied embeddings (the llava_mpt wrapper's decoder)."""
    from transformers import MptConfig, MptForCausalLM

    from competesmoe_tpu.models.hf_loader import convert_mpt
    hf_cfg = MptConfig(d_model=64, n_heads=4, n_layers=2, vocab_size=128,
                       max_seq_len=128)
    hf = MptForCausalLM(hf_cfg).eval()
    cfg = DecoderConfig(
        vocab_size=128, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128, original_max_position_embeddings=128,
        rms_norm_eps=1e-5, fused_qkv=True, use_alibi=True,
        norm_type="layernorm_nobias", mlp_type="gelu",
        tie_word_embeddings=True, dtype=jnp.float32)
    params = convert_mpt(_sd(hf), cfg)
    ids = torch.randint(0, 128, (2, 9))
    with torch.no_grad():
        want = hf(ids).logits.numpy()
    model = DecoderLM(cfg)
    logits, _, _ = model.apply({"params": params}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(logits), want, rtol=3e-4,
                               atol=3e-4)


def test_clip_dense_tower_parity():
    """CLIP tower (CLS + pre-LN + quick_gelu) vs HF CLIPVisionModel:
    select_layer=-2 patch features (ref clip_encoder.py:34-166 /
    builder dispatch by mm_vision_tower name)."""
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from competesmoe_tpu.models.hf_loader import convert_clip_tower
    from competesmoe_tpu.models.vision import CLIPSMoEVisionTower

    hf_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        hidden_act="quick_gelu")
    hf = CLIPVisionModel(hf_cfg).eval()
    cfg = VisionConfig(hidden_size=32, intermediate_size=64,
                       num_hidden_layers=3, num_attention_heads=2,
                       image_size=28, patch_size=14, moe_name=None,
                       hidden_act="quick_gelu", layer_norm_eps=1e-5,
                       use_cls_token=True, tower_type="clip")
    params = convert_clip_tower(_sd(hf), cfg)
    px = torch.randn(2, 3, 28, 28)
    with torch.no_grad():
        want = hf(px, output_hidden_states=True
                  ).hidden_states[-2][:, 1:].numpy()
    tower = CLIPSMoEVisionTower(cfg)
    feats, aux, _ = tower.apply(
        {"params": params}, jnp.asarray(px.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_allclose(np.asarray(feats), want, rtol=2e-4,
                               atol=2e-4)


def test_clip_moe_upcycled_matches_dense_at_init():
    """CLIP sparse upcycling: every expert = the dense MLP, so the MoE
    tower reproduces the dense tower at init (llava_arch.py:128-156)."""
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from competesmoe_tpu.models.hf_loader import convert_clip_tower
    from competesmoe_tpu.models.vision import CLIPSMoEVisionTower

    hf_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        hidden_act="quick_gelu")
    hf = CLIPVisionModel(hf_cfg).eval()
    sd = _sd(hf)
    common = dict(hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=2,
                  image_size=28, patch_size=14, hidden_act="quick_gelu",
                  layer_norm_eps=1e-5, use_cls_token=True,
                  tower_type="clip")
    dense_cfg = VisionConfig(moe_name=None, **common)
    moe_cfg = VisionConfig(moe_name="smoe", num_experts=4, num_selected=2,
                           **common)
    p_dense = convert_clip_tower(sd, dense_cfg)
    p_moe = convert_clip_tower(sd, moe_cfg, upcycle=True)
    px = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 28, 28, 3)).astype(np.float32))
    f_dense, _, _ = CLIPSMoEVisionTower(dense_cfg).apply(
        {"params": p_dense}, px)
    f_moe, _, _ = CLIPSMoEVisionTower(moe_cfg).apply(
        {"params": p_moe}, px)
    np.testing.assert_allclose(np.asarray(f_moe), np.asarray(f_dense),
                               rtol=2e-4, atol=2e-4)


def test_builder_dispatches_clip_tower_by_name():
    """llava_config_from_hf routes mm_vision_tower names to the right
    tower (builder.py:29-184 name dispatch)."""
    from competesmoe_tpu.models.builder import llava_config_from_hf

    base = {"vocab_size": 64, "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 2}
    clip = llava_config_from_hf(
        {**base, "mm_vision_tower": "openai/clip-vit-large-patch14-336"})
    assert clip.vision.tower_type == "clip"
    assert clip.vision.use_cls_token
    assert clip.vision.hidden_act == "quick_gelu"
    assert clip.vision.image_size == 336
    sig = llava_config_from_hf(
        {**base, "mm_vision_tower": "google/siglip-so400m-patch14-224"})
    assert sig.vision.tower_type == "siglip"
    assert not sig.vision.use_cls_token


def test_mixtral_logits_parity():
    """A real HF Mixtral checkpoint loads verbatim: block_sparse_moe
    weights -> MixtralMoELayer via convert_decoder, config via
    decoder_config_from_hf (reference role: llava_mixtral.py keeps
    Mixtral's own experts, smoe_mixtral_helper.py:20-77)."""
    from transformers import MixtralConfig, MixtralForCausalLM

    from competesmoe_tpu.models.builder import decoder_config_from_hf

    torch.manual_seed(5)
    hf_cfg = MixtralConfig(
        vocab_size=96, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, sliding_window=None)
    hf = MixtralForCausalLM(hf_cfg).eval()
    cfg = decoder_config_from_hf(hf_cfg.to_dict(), "llava-mixtral",
                                 dtype=jnp.float32)
    assert cfg.moe_name == "mixtral"
    assert cfg.num_experts == 4 and cfg.num_selected == 2
    assert not cfg.fused_qkv
    params = convert_decoder(_sd(hf), cfg)
    ids = torch.randint(0, 96, (2, 7))
    with torch.no_grad():
        want = hf(ids).logits.numpy()
    model = DecoderLM(cfg)
    logits, _, _ = model.apply({"params": params}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-4,
                               atol=2e-4)


def test_mistral_sliding_window_logits_parity():
    """Mistral = llama layout + sliding-window attention; T > window so
    the window actually binds (ref role: llava_mistral.py wraps HF
    Mistral unmodified)."""
    from transformers import MistralConfig, MistralForCausalLM

    torch.manual_seed(6)
    hf_cfg = MistralConfig(
        vocab_size=96, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, sliding_window=4,
        attn_implementation="eager")
    hf = MistralForCausalLM(hf_cfg).eval()
    cfg = DecoderConfig(
        vocab_size=96, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, original_max_position_embeddings=256,
        rms_norm_eps=1e-6, sliding_window=4, fused_qkv=False,
        dtype=jnp.float32)
    params = convert_decoder(_sd(hf), cfg)
    ids = torch.randint(0, 96, (2, 9))
    with torch.no_grad():
        want = hf(ids).logits.numpy()
    model = DecoderLM(cfg)
    logits, _, _ = model.apply({"params": params}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-4,
                               atol=2e-4)
