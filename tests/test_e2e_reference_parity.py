"""END-TO-END parity against the reference's own torch pipeline.

The module-level suites (test_reference_parity, test_hf_parity) prove each
layer; this file builds the reference's ACTUAL `LlavaPhiForCausalLM` at
tiny geometry (llava_phi.py:32-56), exports its weights in the released
checkpoint layout, loads them with our `load_pretrained_model`, and
asserts:

(a) the spliced embedding/label/position tensors from the reference's
    `prepare_inputs_labels_for_multimodal` (llava_arch.py:198-384) match
    our `splice_image_tokens` on mixed text/image, multi-image, padded,
    and truncated batches — the splice is where off-by-one drift hides;
(b) greedy generate is token-exact (llava_phi.py:147-200 vs our
    models/llava.py generate), with and without images.

The reference snapshot's CLIP tower forward returns a 3-tuple where
llava_arch's single-image path unpacks 4 (clip_encoder.py:147 vs
llava_arch.py:264-267), so the SigLIP tower is the only one that runs the
reference end-to-end; `build_vision_tower`'s local-path dispatch always
picks CLIP (multimodal_encoder/builder.py:9), so the fixture constructs
SiglipVisionTower directly — the dispatch heuristic is not under test.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from competesmoe_tpu.constants import IGNORE_INDEX
from competesmoe_tpu.models.llava import (
    IMAGE_TOKEN_INDEX,
    generate,
    splice_image_tokens,
)

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity

D_VIS, INTER_VIS, N_VIS = 32, 64, 2
D, INTER, N_DEC, VOCAB, E = 48, 96, 2, 64, 4


@pytest.fixture(scope="module")
def pipeline_pair(tmp_path_factory):
    """(reference torch LlavaPhi, our LlavaModel + params) sharing the
    same weights via the released-checkpoint export/import path."""
    import reference_loader as rl

    llava_phi = rl.mm_llava_phi()
    rl.mm_moe("smoe")  # registers 'smoe' in the reference MOE_REGISTRY
    import moe_model.model.llava_arch as arch
    from moe_model.model.multimodal_encoder.siglip_encoder import (
        SiglipVisionTower,
    )

    root = tmp_path_factory.mktemp("e2e")
    vis_dir = root / "siglip-tiny"
    from transformers import SiglipImageProcessor, SiglipVisionConfig
    SiglipVisionConfig(
        hidden_size=D_VIS, intermediate_size=INTER_VIS,
        num_hidden_layers=N_VIS, num_attention_heads=2,
        image_size=28, patch_size=14,
        num_channels=3).save_pretrained(vis_dir)
    SiglipImageProcessor(
        size={"height": 28, "width": 28}).save_pretrained(vis_dir)

    cfg = llava_phi.LlavaPhiConfig(
        vocab_size=VOCAB, hidden_size=D, intermediate_size=INTER,
        num_hidden_layers=N_DEC, num_attention_heads=2,
        num_key_value_heads=2, max_position_embeddings=128,
        original_max_position_embeddings=128, rms_norm_eps=1e-5,
        attention_dropout=0.0, bos_token_id=1, eos_token_id=None,
        pad_token_id=0)
    cfg.mm_vision_tower = str(vis_dir)
    cfg.mm_vision_select_layer = -2
    cfg.mm_vision_select_feature = "patch"
    cfg.clip_smoe = True
    cfg.mlp_smoe = True
    cfg.scales = [1]
    cfg.mm_projector_type = "moe"
    cfg.moe_name = "smoe"
    cfg.num_experts = E
    cfg.num_selected = 2
    cfg.mm_hidden_size = D_VIS
    cfg.tokenizer_model_max_length = 128
    cfg.training = False
    cfg.local_rank = 0
    cfg.sparse_upcycling = False

    arch.build_vision_tower = lambda c, **kw: SiglipVisionTower(
        c.mm_vision_tower, args=c)

    torch.manual_seed(0)
    ref = llava_phi.LlavaPhiForCausalLM(cfg).float().eval()

    # export in the released layout (builder.py docstring): the torch
    # module path `model.vision_tower.vision_model.*` maps to the
    # checkpoint's `model.vision_tower.vision_tower.*`
    out_sd = {}
    for k, v in ref.state_dict().items():
        if "position_ids" in k:
            continue
        if k.startswith("model.vision_tower.vision_model."):
            k = ("model.vision_tower.vision_tower."
                 + k[len("model.vision_tower.vision_model."):])
        out_sd[k] = v.detach().numpy().astype(np.float32)

    ck = root / "ckpt"
    ck.mkdir()
    (ck / "config.json").write_text(json.dumps({
        "model_type": "llava_phi",
        "vocab_size": VOCAB, "hidden_size": D,
        "intermediate_size": INTER, "num_hidden_layers": N_DEC,
        "num_attention_heads": 2, "num_key_value_heads": 2,
        "rms_norm_eps": 1e-5, "max_position_embeddings": 128,
        "original_max_position_embeddings": 128,
        "mm_hidden_size": D_VIS, "mm_projector_type": "moe",
        "mm_vision_tower": str(vis_dir),
        "moe_name": "smoe", "num_experts": E, "num_selected": 2,
        "clip_smoe": True, "mlp_smoe": True, "scales": [1],
        "vision_config": {
            "hidden_size": D_VIS, "intermediate_size": INTER_VIS,
            "num_hidden_layers": N_VIS, "num_attention_heads": 2,
            "image_size": 28, "patch_size": 14},
        "tokenizer_model_max_length": 128,
    }))
    from safetensors.numpy import save_file
    save_file(out_sd, ck / "model.safetensors")

    from competesmoe_tpu.models.builder import load_pretrained_model
    _, model, variables, _, ctx = load_pretrained_model(
        ck, dtype=jnp.float32)
    assert ctx == 128
    return ref, model, variables


def _our_splice(model, variables, ids, px, labels, mask):
    def fn(m, ids, px, labels, mask):
        feats, _, _, _ = m.encode_images(px)
        emb = m.language_model.embed(jnp.maximum(ids, 0))
        emb = jnp.where((ids == m.cfg.image_token_index)[..., None],
                        0.0, emb)
        return splice_image_tokens(ids, emb, feats, labels, mask,
                                   m.cfg.image_token_index)
    out = model.apply(variables, jnp.asarray(ids), jnp.asarray(px),
                      jnp.asarray(labels), jnp.asarray(mask), method=fn)
    maxlen = model.cfg.tokenizer_model_max_length
    out = {k: np.asarray(v) for k, v in out.items()}
    if maxlen is not None and out["embeds"].shape[1] > maxlen:
        out = {k: v[:, :maxlen] for k, v in out.items()}
    return out


def _assert_splice_parity(ref, model, variables, ids, px_nhwc, labels,
                          mask, tol=2e-4):
    """Row-by-row: the reference's per-row pack (drop pads, splice,
    truncate, re-pad right) must equal our static-shape splice restricted
    to its attention mask."""
    if px_nhwc.ndim == 5:  # ours [B, M, H, W, C] = reference flat [B*M, ...]
        px_t = torch.tensor(np.moveaxis(
            px_nhwc.reshape(-1, *px_nhwc.shape[2:]), -1, 1))
    else:
        px_t = torch.tensor(np.moveaxis(px_nhwc, -1, 1))
    with torch.no_grad():
        (_, _, mask_r, _, emb_r, lab_r, *_rest
         ) = ref.prepare_inputs_labels_for_multimodal(
            torch.tensor(ids.astype(np.int64)), None,
            torch.tensor(mask.astype(bool)), None,
            torch.tensor(labels.astype(np.int64)), px_t,
            return_id_experts=False)
    ours = _our_splice(model, variables, ids, px_nhwc, labels, mask)
    emb_r, lab_r = emb_r.numpy(), lab_r.numpy()
    mask_r = mask_r.numpy().astype(bool)
    mask_o = ours["attention_mask"].astype(bool)
    for i in range(ids.shape[0]):
        r, o = emb_r[i][mask_r[i]], ours["embeds"][i][mask_o[i]]
        assert r.shape == o.shape, (i, r.shape, o.shape)
        np.testing.assert_allclose(r, o, atol=tol, rtol=tol)
        np.testing.assert_array_equal(lab_r[i][mask_r[i]],
                                      ours["labels"][i][mask_o[i]])
        # reference writes positions 0..len-1 under the mask
        # (llava_arch.py:355-370)
        np.testing.assert_array_equal(
            ours["position_ids"][i][mask_o[i]],
            np.arange(int(mask_r[i].sum())))


def test_splice_single_image_padded_rows(pipeline_pair):
    ref, model, variables = pipeline_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(2, VOCAB, (2, 10)).astype(np.int32)
    ids[0, 1] = IMAGE_TOKEN_INDEX
    ids[1, 4] = IMAGE_TOKEN_INDEX
    mask = np.ones((2, 10), np.int32)
    mask[1, 8:] = 0
    labels = ids.copy()
    labels[:, :3] = IGNORE_INDEX
    labels[1, 8:] = IGNORE_INDEX
    px = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    _assert_splice_parity(ref, model, variables, ids, px, labels, mask)


def test_splice_mixed_text_and_image_rows(pipeline_pair):
    """A text-only row consumes one image feature in the reference loop
    (llava_arch.py:293-302) without splicing it; content must agree."""
    ref, model, variables = pipeline_pair
    rng = np.random.default_rng(1)
    ids = rng.integers(2, VOCAB, (2, 9)).astype(np.int32)
    ids[1, 0] = IMAGE_TOKEN_INDEX
    mask = np.ones((2, 9), np.int32)
    mask[0, 6:] = 0
    labels = ids.copy()
    labels[0, :2] = IGNORE_INDEX
    labels[0, 6:] = IGNORE_INDEX
    px = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    _assert_splice_parity(ref, model, variables, ids, px, labels, mask)


def test_splice_multi_image_row(pipeline_pair):
    """Two image tokens in one row: the reference consumes the flat
    feature list in order (llava_arch.py:318-330); ours places image m's
    block at the m-th sentinel."""
    ref, model, variables = pipeline_pair
    rng = np.random.default_rng(2)
    ids = rng.integers(2, VOCAB, (1, 12)).astype(np.int32)
    ids[0, 2] = IMAGE_TOKEN_INDEX
    ids[0, 7] = IMAGE_TOKEN_INDEX
    mask = np.ones((1, 12), np.int32)
    labels = ids.copy()
    labels[0, :4] = IGNORE_INDEX
    px = rng.normal(size=(1, 2, 28, 28, 3)).astype(np.float32)
    _assert_splice_parity(ref, model, variables, ids, px, labels, mask)


def test_splice_truncation(pipeline_pair):
    """Spliced length exceeds tokenizer_model_max_length: the reference
    truncates per row pre-padding (llava_arch.py:334-338); ours truncates
    the static layout — same retained content for right-padded input."""
    ref, model, variables = pipeline_pair
    rng = np.random.default_rng(3)
    ids = rng.integers(2, VOCAB, (2, 126)).astype(np.int32)
    ids[0, 3] = IMAGE_TOKEN_INDEX
    ids[1, 5] = IMAGE_TOKEN_INDEX
    mask = np.ones((2, 126), np.int32)
    mask[1, 120:] = 0
    labels = ids.copy()
    labels[:, :4] = IGNORE_INDEX
    labels[1, 120:] = IGNORE_INDEX
    px = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    _assert_splice_parity(ref, model, variables, ids, px, labels, mask)


def test_greedy_generate_token_exact(pipeline_pair):
    ref, model, variables = pipeline_pair
    rng = np.random.default_rng(4)
    ids = rng.integers(2, VOCAB, (1, 7)).astype(np.int32)
    ids[0, 1] = IMAGE_TOKEN_INDEX
    px = rng.normal(size=(1, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = ref.generate(
            inputs=torch.tensor(ids.astype(np.int64)),
            images=torch.tensor(np.moveaxis(px, -1, 1)),
            do_sample=False, max_new_tokens=8, return_id_experts=False)
    ref_toks = (out_t[0][0] if isinstance(out_t, tuple)
                else out_t[0]).tolist()
    ours, _ = generate(model, variables, ids, px, max_new_tokens=8)
    assert np.asarray(ours)[0].tolist()[:len(ref_toks)] == ref_toks


def test_greedy_generate_text_only_token_exact(pipeline_pair):
    ref, model, variables = pipeline_pair
    rng = np.random.default_rng(5)
    ids = rng.integers(2, VOCAB, (1, 9)).astype(np.int32)
    with torch.no_grad():
        out_t = ref.generate(
            inputs=torch.tensor(ids.astype(np.int64)), images=None,
            do_sample=False, max_new_tokens=8, return_id_experts=False)
    ref_toks = (out_t[0][0] if isinstance(out_t, tuple)
                else out_t[0]).tolist()
    ours, _ = generate(model, variables, ids, None, max_new_tokens=8)
    assert np.asarray(ours)[0].tolist()[:len(ref_toks)] == ref_toks
