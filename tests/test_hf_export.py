"""HF export roundtrip: load a reference-layout checkpoint, export it
back, and require the state dicts to be bit-identical; then reload the
exported checkpoint through the builder and compare model outputs."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from competesmoe_tpu.models.builder import load_pretrained_model
from competesmoe_tpu.models.hf_export import (
    export_llava_checkpoint,
    save_hf_checkpoint,
)
from competesmoe_tpu.models.hf_loader import load_torch_state_dict
from tests.test_builder import make_fake_checkpoint


def test_export_roundtrip_bit_exact(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    make_fake_checkpoint(src)
    orig_sd = load_torch_state_dict(src)

    _, model, variables, _, _ = load_pretrained_model(
        src, dtype=jnp.float32)
    exported = export_llava_checkpoint(variables["params"], model.cfg)

    assert set(exported) == set(orig_sd), (
        sorted(set(orig_sd) - set(exported))[:5],
        sorted(set(exported) - set(orig_sd))[:5])
    for k in orig_sd:
        np.testing.assert_array_equal(exported[k], orig_sd[k], err_msg=k)


def test_export_reload_matches_outputs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    make_fake_checkpoint(src)
    _, model, variables, _, _ = load_pretrained_model(
        src, dtype=jnp.float32)

    dst = tmp_path / "dst"
    save_hf_checkpoint(variables["params"], model.cfg, dst,
                       hf_config=json.loads(
                           (src / "config.json").read_text()))
    _, model2, variables2, _, _ = load_pretrained_model(
        dst, dtype=jnp.float32)

    ids = np.full((1, 6), 3, np.int32)
    px = np.zeros((1, 28, 28, 3), np.float32)
    out1 = model.apply(variables, jnp.asarray(ids), jnp.asarray(px))
    out2 = model2.apply(variables2, jnp.asarray(ids), jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(out1.logits),
                               np.asarray(out2.logits), atol=1e-6)


def test_export_mpt_roundtrip():
    """MPT export matches convert_mpt's expectations key-for-key."""
    import dataclasses
    from competesmoe_tpu.models.decoder import phi35_mini_config
    from competesmoe_tpu.models.hf_export import export_mpt
    from competesmoe_tpu.models.hf_loader import convert_mpt

    cfg = dataclasses.replace(
        phi35_mini_config(), num_hidden_layers=2, vocab_size=32,
        hidden_size=16, num_attention_heads=2, num_key_value_heads=2,
        use_alibi=True, norm_type="layernorm_nobias", mlp_type="gelu",
        expansion_ratio=2, fused_qkv=True, tie_word_embeddings=True,
        rope_scaling_type=None, rope_short_factor=None,
        rope_long_factor=None)
    rng = np.random.default_rng(0)
    sd = {"transformer.wte.weight": rng.normal(0, 1, (32, 16)).astype(
        np.float32),
          "transformer.norm_f.weight": np.ones(16, np.float32)}
    for li in range(2):
        p = f"transformer.blocks.{li}."
        sd[p + "norm_1.weight"] = np.ones(16, np.float32)
        sd[p + "norm_2.weight"] = np.ones(16, np.float32)
        sd[p + "attn.Wqkv.weight"] = rng.normal(0, 1, (48, 16)).astype(
            np.float32)
        sd[p + "attn.out_proj.weight"] = rng.normal(0, 1, (16, 16)).astype(
            np.float32)
        sd[p + "ffn.up_proj.weight"] = rng.normal(0, 1, (32, 16)).astype(
            np.float32)
        sd[p + "ffn.down_proj.weight"] = rng.normal(0, 1, (16, 32)).astype(
            np.float32)
    params = convert_mpt(sd, cfg)
    back = export_mpt(params, cfg)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_export_plain_projector_and_split_decoder(tmp_path):
    """Non-fused-qkv decoder export + mlp2x projector naming."""
    from competesmoe_tpu.models.hf_export import (
        export_decoder,
        export_plain_projector,
    )
    import dataclasses
    from competesmoe_tpu.models.decoder import DecoderLM, phi35_mini_config

    cfg = dataclasses.replace(
        phi35_mini_config(), num_hidden_layers=1, vocab_size=32,
        hidden_size=16, intermediate_size=32, num_attention_heads=2,
        num_key_value_heads=2, fused_qkv=False, rope_scaling_type=None,
        rope_short_factor=None, rope_long_factor=None, dtype=jnp.float32)
    model = DecoderLM(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    sd = export_decoder(params, cfg)
    for key in ("model.layers.0.self_attn.q_proj.weight",
                "model.layers.0.mlp.gate_proj.weight",
                "lm_head.weight"):
        assert key in sd, key
    assert sd["model.layers.0.self_attn.q_proj.weight"].shape == (16, 16)

    proj = {"mlp_0": {"kernel": np.zeros((4, 8), np.float32),
                      "bias": np.zeros(8, np.float32)},
            "mlp_1": {"kernel": np.zeros((8, 8), np.float32),
                      "bias": np.zeros(8, np.float32)}}
    out = export_plain_projector(proj)
    # Sequential Linear-GELU-Linear indices 0 and 2
    assert set(out) == {"mm_projector.0.weight", "mm_projector.0.bias",
                        "mm_projector.2.weight", "mm_projector.2.bias"}
