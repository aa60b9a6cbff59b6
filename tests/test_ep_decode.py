"""Expert-parallel INFERENCE (VERDICT r4 item 2): expert banks sharded
over the mesh 'expert' axis during generate/eval, token-exact vs the
single-device path on the virtual 8-device mesh.

Covers the two inference shapes that exist:
- decode with an MoE DECODER (mixtral-family backbones): the all-to-all
  runs inside every decode step,
- multimodal prefill with MoE vision tower + projector (the 5.1B
  layout — its Phi decoder is dense, so EP engages only at prefill;
  see PARITY.md for the measured 5.1B decode-EP rejection).

Reference basis: the eval sharding role at
evaluate/lmms_eval/models/llava.py:139-169 (accelerate DDP / device_map
layer placement) — rebuilt as true expert sharding over ICI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from competesmoe_tpu.models.decoder import DecoderConfig, DecoderLM, KVCache
from competesmoe_tpu.parallel import make_mesh, use_expert_parallel
from competesmoe_tpu.parallel.mesh import ep_param_shardings

pytestmark = pytest.mark.slow


def moe_decoder_cfg(moe_name="smoe", **kw):
    return DecoderConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128,
        original_max_position_embeddings=128, fused_qkv=True,
        moe_name=moe_name, num_experts=8, num_selected=2,
        dtype=jnp.float32, **kw)


def greedy_decode(model, params, ids, cache, n=4):
    logits, cache, _ = model.apply(params, ids, cache=cache)
    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    toks = [np.asarray(tok)]
    for _ in range(n):
        logits, cache, _ = model.apply(params, tok[:, None], cache=cache)
        tok = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
        toks.append(np.asarray(tok))
    return np.stack(toks)


@pytest.mark.parametrize("moe_name", ["smoe", "mixtral"])
def test_ep_decode_moe_decoder_token_exact(moe_name):
    """MoE-decoder greedy decode: EP mesh (data=2 x expert=4) emits the
    same tokens as the unsharded single-device run, and the expert banks
    are genuinely sharded."""
    cfg = moe_decoder_cfg(moe_name)
    model = DecoderLM(cfg)
    B, T, kvlen = 8, 8, 32
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, T), 1, 64)
    params = model.init(jax.random.PRNGKey(1), ids)

    ref = greedy_decode(model, params, ids, KVCache.create(cfg, B, kvlen))

    mesh = make_mesh(n_expert=4, devices=jax.devices()[:8])
    shardings = ep_param_shardings(mesh, params)
    sh_params = jax.device_put(params, shardings)
    with mesh, use_expert_parallel(mesh):
        got = greedy_decode(model, sh_params, ids,
                            KVCache.create(cfg, B, kvlen))
    np.testing.assert_array_equal(ref, got)

    # expert banks sharded over 'expert'; dense params replicated
    flat = jax.tree_util.tree_leaves_with_path(shardings)
    specs = {"/".join(getattr(p, "key", str(p)) for p in path): s.spec
             for path, s in flat}
    bank_key = "experts_w1" if moe_name == "smoe" else "experts_w3"
    banks = [s for k, s in specs.items() if bank_key in k]
    assert banks and all(s[0] == "expert" for s in banks)
    qkv = [s for k, s in specs.items() if "qkv_proj/kernel" in k]
    assert qkv and all(len(s) == 0 for s in qkv)


def test_ep_decode_contains_all_to_all():
    """The EP decode step really moves tokens over ICI (not just XLA
    auto-sharding of replicated compute)."""
    cfg = moe_decoder_cfg("smoe")
    model = DecoderLM(cfg)
    B, kvlen = 8, 32
    ids = jax.random.randint(jax.random.PRNGKey(0), (B, 8), 1, 64)
    params = model.init(jax.random.PRNGKey(1), ids)
    mesh = make_mesh(n_expert=4, devices=jax.devices()[:8])
    sh_params = jax.device_put(params, ep_param_shardings(mesh, params))
    cache = KVCache.create(cfg, B, kvlen)
    with mesh, use_expert_parallel(mesh):
        logits, cache, _ = model.apply(sh_params, ids, cache=cache)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

        def step(p, t, c):
            lg, c2, _ = model.apply(p, t[:, None], cache=c)
            return lg, c2

        txt = jax.jit(step).lower(sh_params, tok, cache).compile().as_text()
    assert "all-to-all" in txt


def test_ep_prefill_llava_vision_tower_token_exact():
    """5.1B-shaped multimodal prefill: vision tower + projector experts
    sharded over 'expert', prefill logits equal to single-device.

    (The 5.1B decoder is dense Phi — EP engages only in the vision
    tower/projector, i.e. at prefill; B=2 x 4 patches = 8 vision tokens
    keeps the token dim divisible by the 8-device mesh.)"""
    from tests.test_llava import IMAGE_TOKEN_INDEX, tiny_llava_cfg
    from competesmoe_tpu.models.llava import LlavaModel, generate

    cfg = tiny_llava_cfg(moe=True)
    model = LlavaModel(cfg)
    B, L = 2, 6
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 64, (B, L)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    px = rng.normal(size=(B, 28, 28, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(px))

    from competesmoe_tpu.models.llava import _GEN_FN_CACHE
    ref, _ = generate(model, params, ids, px, max_new_tokens=4)

    _GEN_FN_CACHE.clear()  # force a re-trace under the EP context
    mesh = make_mesh(n_expert=4, devices=jax.devices()[:8])
    sh_params = jax.device_put(params, ep_param_shardings(mesh, params))
    with mesh, use_expert_parallel(mesh):
        got, _ = generate(model, sh_params, ids, px, max_new_tokens=4)
    _GEN_FN_CACHE.clear()  # don't leak EP-traced fns to other tests
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
