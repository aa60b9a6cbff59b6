"""LLaVA meta-model tests: splice semantics, training forward, KV-cache
generation consistency."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from competesmoe_tpu.models.decoder import DecoderConfig, KVCache
from competesmoe_tpu.models.llava import (
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    LlavaConfig,
    LlavaModel,
    generate,
    splice_image_tokens,
)
from competesmoe_tpu.models.projector import ProjectorConfig
from competesmoe_tpu.models.vision import VisionConfig
from competesmoe_tpu.moe import MoEArgs

pytestmark = pytest.mark.slow



def tiny_llava_cfg(moe=True):
    vis = VisionConfig(hidden_size=16, intermediate_size=32,
                       num_hidden_layers=2, num_attention_heads=2,
                       image_size=28, patch_size=14,
                       moe_name="smoe" if moe else None, num_experts=4,
                       num_selected=2)
    proj = ProjectorConfig(projector_type="moe" if moe else "linear",
                           mm_hidden_size=16, hidden_size=24,
                           moe_name="smoe", num_experts=4, num_selected=2)
    dec = DecoderConfig(vocab_size=64, hidden_size=24, intermediate_size=48,
                        num_hidden_layers=2, num_attention_heads=2,
                        num_key_value_heads=2, fused_qkv=True,
                        max_position_embeddings=128,
                        original_max_position_embeddings=128,
                        dtype=jnp.float32)
    return LlavaConfig(vision=vis, projector=proj, decoder=dec,
                       tokenizer_model_max_length=None)


def test_splice_semantics():
    B, L, P, D = 2, 6, 3, 4
    rng = np.random.default_rng(0)
    ids = np.array([[5, IMAGE_TOKEN_INDEX, 7, 8, 9, 10],
                    [1, 2, 3, IMAGE_TOKEN_INDEX, 4, 0]])
    mask = np.array([[1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 1, 0]])
    labels = np.array([[5, IGNORE_INDEX, 7, 8, 9, 10],
                       [1, 2, 3, IGNORE_INDEX, 4, IGNORE_INDEX]])
    text = rng.normal(size=(B, L, D)).astype(np.float32)
    img = rng.normal(size=(B, P, D)).astype(np.float32)

    sp = splice_image_tokens(jnp.asarray(ids), jnp.asarray(text),
                             jnp.asarray(img), jnp.asarray(labels),
                             jnp.asarray(mask))
    out = np.asarray(sp["embeds"])
    # row 0: text[0], img[0..2], text[2..5]
    np.testing.assert_allclose(out[0, 0], text[0, 0])
    np.testing.assert_allclose(out[0, 1:4], img[0])
    np.testing.assert_allclose(out[0, 4:], text[0, 2:])
    # row 1: text[0..2], img, text[4..5]
    np.testing.assert_allclose(out[1, :3], text[1, :3])
    np.testing.assert_allclose(out[1, 3:6], img[1])
    np.testing.assert_allclose(out[1, 6:], text[1, 4:])
    lab = np.asarray(sp["labels"])
    assert (lab[0, 1:4] == IGNORE_INDEX).all()
    assert (lab[1, 3:6] == IGNORE_INDEX).all()
    m = np.asarray(sp["attention_mask"])
    assert m[0].all()
    assert m[1, :7].all() and not m[1, 7]
    pos = np.asarray(sp["position_ids"])
    np.testing.assert_array_equal(pos[0], np.arange(8))


def test_splice_no_image_row():
    B, L, P, D = 1, 4, 2, 3
    ids = np.array([[1, 2, 3, 4]])
    text = np.random.default_rng(0).normal(size=(B, L, D)).astype(np.float32)
    img = np.zeros((B, P, D), np.float32)
    sp = splice_image_tokens(jnp.asarray(ids), jnp.asarray(text),
                             jnp.asarray(img))
    m = np.asarray(sp["attention_mask"])
    assert m[0, :4].all() and not m[0, 4:].any()
    np.testing.assert_allclose(np.asarray(sp["embeds"])[0, :4], text[0])


def test_llava_train_forward_and_grad():
    cfg = tiny_llava_cfg()
    model = LlavaModel(cfg)
    B, L = 2, 8
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 64, (B, L)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    px = rng.normal(size=(B, 28, 28, 3)).astype(np.float32)
    labels = ids.copy()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(px), labels=jnp.asarray(labels),
                        train=True)

    @jax.jit
    def loss_fn(params):
        out = model.apply(params, jnp.asarray(ids), jnp.asarray(px),
                          labels=jnp.asarray(labels), train=True, step=0)
        return out.loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))


def test_llava_generate_matches_nocache_argmax():
    """Greedy tokens from cached decode must match repeated full forwards."""
    cfg = tiny_llava_cfg()
    model = LlavaModel(cfg)
    B, L = 1, 6
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 64, (B, L)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    px = rng.normal(size=(B, 28, 28, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(px))

    toks, out = generate(model, params, ids, px, max_new_tokens=4)
    assert toks.shape == (B, 4)

    # no-cache oracle: run full forward over growing embed sequence
    res = model.apply(params, jnp.asarray(ids), jnp.asarray(px))
    img_feats, _, _, _ = model.apply(
        params, jnp.asarray(px), method=LlavaModel.encode_images)
    from competesmoe_tpu.models.llava import splice_image_tokens as sit
    def dec_apply(emb):
        return model.apply(
            params, emb,
            method=lambda m, e: m.language_model(inputs_embeds=e))[0]
    text_emb = model.apply(
        params, method=lambda m: m.language_model.embed(
            jnp.maximum(jnp.asarray(ids), 0)))
    text_emb = jnp.where(
        (jnp.asarray(ids) == IMAGE_TOKEN_INDEX)[..., None], 0.0, text_emb)
    sp = sit(jnp.asarray(ids), text_emb, img_feats)
    emb = sp["embeds"]
    want = []
    for t in range(4):
        logits = dec_apply(emb)
        nxt = int(np.argmax(np.asarray(logits[0, -1])))
        want.append(nxt)
        nxt_emb = model.apply(
            params, method=lambda m: m.language_model.embed(
                jnp.asarray([[nxt]], jnp.int32)))
        emb = jnp.concatenate([emb, nxt_emb], axis=1)
    np.testing.assert_array_equal(toks[0], want)


def test_llava_generate_with_right_padding():
    """Rows padded to different lengths decode consistently."""
    cfg = tiny_llava_cfg(moe=False)
    model = LlavaModel(cfg)
    rng = np.random.default_rng(2)
    ids_a = rng.integers(1, 64, (1, 5)).astype(np.int32)
    ids_a[:, 0] = IMAGE_TOKEN_INDEX
    px = rng.normal(size=(1, 28, 28, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids_a),
                        jnp.asarray(px))
    toks_solo, _ = generate(model, params, ids_a, px, max_new_tokens=3)

    # same prompt padded on the right inside a batch of two
    ids_b = np.concatenate([ids_a, np.zeros((1, 2), np.int32)], axis=1)
    mask_b = np.array([[1, 1, 1, 1, 1, 0, 0]])
    ids_batch = np.concatenate([ids_b, ids_b], axis=0)
    mask_batch = np.concatenate([mask_b, mask_b], axis=0)
    px2 = np.concatenate([px, px], axis=0)
    toks_pad, _ = generate(model, params, ids_batch, px2,
                           attention_mask=mask_batch, max_new_tokens=3)
    np.testing.assert_array_equal(toks_pad[0], toks_solo[0])
    np.testing.assert_array_equal(toks_pad[1], toks_solo[0])


def _python_multi_splice(ids, text, imgs, labels, mask, P):
    """Reference python splice (llava_arch.py:287-370 loop semantics)."""
    B, L, D = text.shape
    M = imgs.shape[1]
    Lout = L - M + M * P
    emb = np.zeros((B, Lout, D), np.float32)
    lab = np.full((B, Lout), IGNORE_INDEX, np.int64)
    msk = np.zeros((B, Lout), bool)
    for b in range(B):
        out, olab, omask, m = [], [], [], 0
        for i in range(L):
            if ids[b, i] == IMAGE_TOKEN_INDEX:
                for pp in range(P):
                    out.append(imgs[b, m, pp])
                    olab.append(IGNORE_INDEX)
                    omask.append(True)
                m += 1
            else:
                out.append(text[b, i])
                olab.append(labels[b, i])
                omask.append(bool(mask[b, i]))
        emb[b, :len(out)] = np.stack(out)
        lab[b, :len(olab)] = olab
        msk[b, :len(omask)] = omask
    return emb, lab, msk


def test_multi_image_splice_matches_python_reference():
    B, L, M, P, D = 3, 8, 2, 3, 4
    rng = np.random.default_rng(1)
    ids = np.array([
        [5, IMAGE_TOKEN_INDEX, 7, IMAGE_TOKEN_INDEX, 9, 10, 11, 12],
        [IMAGE_TOKEN_INDEX, 2, 3, 4, 5, 6, 7, 0],   # one image
        [1, 2, 3, 4, 5, 6, 7, 8],                    # text only
    ])
    mask = np.ones((B, L), np.int32)
    mask[1, -1] = 0
    labels = np.where(ids == IMAGE_TOKEN_INDEX, IGNORE_INDEX, ids)
    text = rng.normal(size=(B, L, D)).astype(np.float32)
    imgs = rng.normal(size=(B, M, P, D)).astype(np.float32)

    sp = splice_image_tokens(jnp.asarray(ids), jnp.asarray(text),
                             jnp.asarray(imgs), jnp.asarray(labels),
                             jnp.asarray(mask))
    ref_emb, ref_lab, ref_msk = _python_multi_splice(
        ids, text, imgs, labels, mask, P)
    got_msk = np.asarray(sp["attention_mask"])
    np.testing.assert_array_equal(got_msk, ref_msk)
    np.testing.assert_array_equal(
        np.where(ref_msk, np.asarray(sp["labels"]), IGNORE_INDEX),
        np.where(ref_msk, ref_lab, IGNORE_INDEX))
    np.testing.assert_allclose(
        np.asarray(sp["embeds"]) * ref_msk[..., None], 
        ref_emb * ref_msk[..., None], rtol=1e-6)


def test_model_forward_multi_image():
    cfg = dataclasses.replace(tiny_llava_cfg(moe=True),
                              image_splice="multi")
    model = LlavaModel(cfg)
    B, L, M = 2, 7, 2
    P = cfg.num_image_tokens
    ids = np.full((B, L), 3, np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    ids[:, 4] = IMAGE_TOKEN_INDEX
    px = np.random.default_rng(0).normal(
        size=(B, M, 28, 28, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(px))
    out = model.apply(params, jnp.asarray(ids), jnp.asarray(px))
    assert out.logits.shape == (B, L - M + M * P,
                                cfg.decoder.vocab_size)
    assert np.all(np.isfinite(np.asarray(out.logits)))


def test_model_forward_anyres():
    cfg = dataclasses.replace(tiny_llava_cfg(moe=True),
                              image_splice="anyres")
    model = LlavaModel(cfg)
    B, L, M = 2, 6, 3
    P = cfg.num_image_tokens
    ids = np.full((B, L), 3, np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    px = np.random.default_rng(0).normal(
        size=(B, M, 28, 28, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(px))
    out = model.apply(params, jnp.asarray(ids), jnp.asarray(px))
    # all M tiles splice as one block at the single image token
    assert out.logits.shape == (B, L - 1 + M * P,
                                cfg.decoder.vocab_size)
    assert np.all(np.isfinite(np.asarray(out.logits)))


def test_scan_decode_tiny_topp_equals_greedy():
    """top_p -> 0 reduces nucleus sampling to argmax, so the scan-decode
    path with temperature>0 must reproduce greedy tokens exactly (top_p
    now rides inside the scan instead of forcing a per-step host loop)."""
    cfg = tiny_llava_cfg()
    model = LlavaModel(cfg)
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 64, (2, 5)).astype(np.int32)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), None)
    greedy, _ = generate(model, params, ids, None, max_new_tokens=6,
                         temperature=0.0, scan_decode=True)
    nucleus, _ = generate(model, params, ids, None, max_new_tokens=6,
                          temperature=1.0, top_p=1e-6, scan_decode=True,
                          rng=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(greedy, nucleus)


def test_stream_generate_topp_uses_chunks():
    """stream_generate with top_p<1 must still follow the 1,1,2,4 chunk
    warmup (device-side nucleus) and match greedy under tiny top_p."""
    from competesmoe_tpu.models.llava import stream_generate
    cfg = tiny_llava_cfg()
    model = LlavaModel(cfg)
    rng = np.random.default_rng(4)
    ids = rng.integers(1, 64, (1, 4)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), None)

    greedy, _ = generate(model, params, ids, None, max_new_tokens=8,
                         temperature=0.0, scan_decode=True)
    chunks = list(stream_generate(model, params, ids, None,
                                  max_new_tokens=8, temperature=1.0,
                                  top_p=1e-6))
    got = np.concatenate(chunks, axis=1)
    sizes = [c.shape[1] for c in chunks]
    assert sizes == [1, 1, 2, 4]
    np.testing.assert_array_equal(greedy, got)


def test_mixtral_decoder_aux_reaches_mm_loss():
    """With a Mixtral-MoE decoder FFN, the decoder blocks' coef-scaled
    z/balance losses are added to the LLaVA loss as a MEAN over layers —
    the reference's aggregation (llava_mixtral.py:160-167). Vision tower
    and projector are dense here so the delta isolates the decoder aux."""
    import dataclasses

    cfg = tiny_llava_cfg(moe=False)
    dec = dataclasses.replace(cfg.decoder, moe_name="mixtral",
                              num_experts=4, num_selected=2)
    cfg = dataclasses.replace(cfg, decoder=dec)
    model = LlavaModel(cfg)
    rng = np.random.default_rng(5)
    ids = rng.integers(2, 60, (2, 8)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    mask = np.ones_like(ids)
    px = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(px), labels=jnp.asarray(labels),
                        attention_mask=jnp.asarray(mask))

    def run(train):
        return model.apply(params, jnp.asarray(ids), jnp.asarray(px),
                           labels=jnp.asarray(labels),
                           attention_mask=jnp.asarray(mask), train=train)

    out_t, out_e = run(True), run(False)
    # dense tower/projector: only the decoder contributes aux
    assert float(out_t.aux_clip) == 0.0 and float(out_t.aux_mlp) == 0.0
    assert float(out_t.aux_llm) > 0.0
    assert float(out_e.aux_llm) == 0.0  # eval mode: no aux
    # forward output is train-invariant, so the loss delta IS aux_llm
    np.testing.assert_allclose(float(out_t.loss) - float(out_e.loss),
                               float(out_t.aux_llm), rtol=1e-5, atol=1e-7)


def test_decoder_remat_loss_and_grads_identical():
    """--remat (per-layer jax.checkpoint in the decoder) recomputes
    activations in backward; loss and gradients must be identical to the
    stored-activation baseline."""
    import dataclasses

    cfg = tiny_llava_cfg(moe=True)
    rng = np.random.default_rng(9)
    ids = rng.integers(2, 60, (2, 8)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    labels, mask = ids.copy(), np.ones_like(ids)
    px = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)

    def loss_and_grads(use_remat):
        c = dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder, remat=use_remat))
        model = LlavaModel(c)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                            jnp.asarray(px), labels=jnp.asarray(labels),
                            attention_mask=jnp.asarray(mask))

        def f(p):
            return model.apply(p, jnp.asarray(ids), jnp.asarray(px),
                               labels=jnp.asarray(labels),
                               attention_mask=jnp.asarray(mask),
                               train=True, step=jnp.int32(1)).loss

        return jax.jit(jax.value_and_grad(f))(params)

    (l0, g0), (l1, g1) = loss_and_grads(False), loss_and_grads(True)
    # remat does not change param structure: checkpoints interchangeable
    assert jax.tree_util.tree_structure(g0) == \
        jax.tree_util.tree_structure(g1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    # recompute reorders XLA fusions -> f32 reassociation noise only
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)
