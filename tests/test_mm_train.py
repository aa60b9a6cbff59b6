"""Multimodal data pipeline + 3-stage training tests."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from competesmoe_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from competesmoe_tpu.data.mm_data import (
    LazySupervisedDataset,
    LengthGroupedSampler,
    SupervisedCollator,
    preprocess_phi35,
    preprocess_plain,
)
from competesmoe_tpu.models.llava import LlavaModel
from competesmoe_tpu.multimodal.mm_utils import ImageProcessorConfig
from competesmoe_tpu.train.lm_trainer import TrainState
from competesmoe_tpu.train.mm_task import (
    MMTrainConfig,
    build_mm_schedules,
    make_mm_optimizer,
    make_mm_train_step,
)
from tests.test_llava import tiny_llava_cfg

pytestmark = pytest.mark.slow



class WordTok:
    """Toy word tokenizer with bos=1 and special tokens (<|end|> etc.) as
    single tokens — the additivity properties the reference's round-length
    arithmetic relies on with the real Phi-3.5 tokenizer."""

    bos_token_id = 1
    pad_token_id = 0
    model_max_length = 512
    _SPECIAL = __import__("re").compile(r"<\|[a-z]+\|>|\S+?(?=<\|)|\S+")

    def __init__(self):
        self.vocab = {"<bos>": 1}

    def _id(self, w):
        if w not in self.vocab:
            self.vocab[w] = len(self.vocab) + 2
        return self.vocab[w]

    def __call__(self, text):
        class R:
            pass
        r = R()
        r.input_ids = [1] + [self._id(w)
                             for w in self._SPECIAL.findall(text)]
        return r

    def decode(self, ids, **kw):
        inv = {v: k for k, v in self.vocab.items()}
        return " ".join(inv.get(i, "?") for i in ids)


def convo(with_image=True):
    q = ("<image>\nwhat is this" if with_image else "what is this")
    return [{"from": "human", "value": q},
            {"from": "gpt", "value": "a cat"},
            {"from": "human", "value": "sure ?"},
            {"from": "gpt", "value": "yes really"}]


def test_preprocess_phi35_masks_instructions():
    tok = WordTok()
    d = preprocess_phi35([convo(False)], tok, has_image=False)
    ids, lab = d["input_ids"][0], d["labels"][0]
    assert ids.shape == lab.shape
    sup = lab != IGNORE_INDEX
    # some tokens supervised (the answers), some masked (the questions)
    assert sup.any() and (~sup).any()
    # supervised ids equal input ids where visible
    np.testing.assert_array_equal(lab[sup], ids[sup])
    # the answer words must be supervised
    answer_ids = {tok._id("cat"), tok._id("yes"), tok._id("really")}
    assert answer_ids.issubset(set(ids[sup].tolist()))
    # the question words must NOT be supervised
    q_id = tok._id("what")
    assert q_id not in set(ids[sup].tolist())


def test_preprocess_phi35_with_image_token():
    tok = WordTok()
    d = preprocess_phi35([convo(True)], tok, has_image=True)
    ids = d["input_ids"][0]
    assert (ids == IMAGE_TOKEN_INDEX).sum() == 1


def test_preprocess_plain():
    """Reference layout (train.py:995-1016): a BOS-adding tokenizer
    keeps its BOS ahead of the image token, and both are masked
    (round-4 fix: the old port dropped the BOS; element-exact parity in
    tests/test_preprocess_parity.py)."""
    tok = WordTok()
    d = preprocess_plain([[{"from": "human", "value": "<image>"},
                           {"from": "gpt", "value": "a dog"}]], tok)
    ids, lab = d["input_ids"][0], d["labels"][0]
    assert ids[0] == tok.bos_token_id
    assert ids[1] == IMAGE_TOKEN_INDEX
    assert lab[0] == IGNORE_INDEX and lab[1] == IGNORE_INDEX
    assert (lab[2:] != IGNORE_INDEX).any()


def test_lazy_dataset_and_collator(tmp_path):
    (tmp_path / "imgs").mkdir()
    Image.new("RGB", (40, 30), (200, 10, 10)).save(
        tmp_path / "imgs" / "a.jpg")
    records = [
        {"id": "0", "image": "a.jpg", "conversations": convo(True)},
        {"id": "1", "conversations": convo(False)},
    ]
    (tmp_path / "data.json").write_text(json.dumps(records))
    ds = LazySupervisedDataset(
        tmp_path / "data.json", tmp_path / "imgs", WordTok(),
        image_processor=ImageProcessorConfig(size=28))
    assert len(ds) == 2
    s0, s1 = ds[0], ds[1]
    assert s0["image"].shape == (28, 28, 3)
    assert "image" not in s1
    ml = ds.modality_lengths
    assert ml[0] > 0 and ml[1] < 0

    coll = SupervisedCollator(pad_token_id=0, image_shape=(28, 28, 3))
    batch = coll([s0, s1])
    assert batch["input_ids"].shape == batch["labels"].shape
    assert batch["images"].shape == (2, 28, 28, 3)
    assert batch["attention_mask"][0].sum() == len(s0["input_ids"])


def test_length_grouped_sampler_separates_modalities():
    lengths = [10, 20, -5, -8, 15, -12, 30, 7]
    s = LengthGroupedSampler(lengths, batch_size=2, seed=0)
    batches = list(iter(s))
    for b in batches:
        signs = {lengths[i] > 0 for i in b}
        assert len(signs) == 1, f"mixed modalities in batch {b}"


def test_mm_flip_alignment_respects_warmup():
    """No competition while step < step_warm, competition exactly on the
    scheduled post-warm steps — for BOTH the vision tower layers and the
    projector (competesmoe.py:347's
    `current_steps >= step_warm and prob_flips[current_steps - step_warm]`).
    Round-5 regression test: step_warm was never wired into the model
    constructors, so warm_up > 0 shifted the whole flip window, and the
    projector never saw its schedule at all."""
    cfg = tiny_llava_cfg()
    cfg = dataclasses.replace(
        cfg,
        vision=dataclasses.replace(cfg.vision, moe_name="competesmoe"),
        projector=dataclasses.replace(cfg.projector,
                                      moe_name="competesmoe"))
    tcfg = MMTrainConfig(total_steps=12, rate_flip=1.0, warm_up=0.5,
                         max_compete_in_iter=3)
    vis_sched, proj_sched = build_mm_schedules(cfg, tcfg)
    assert vis_sched is not None and proj_sched is not None
    assert vis_sched.step_warm == 6

    from competesmoe_tpu.models.projector import VisionProjector
    from competesmoe_tpu.models.vision import SiglipSMoEVisionTower
    tower = SiglipSMoEVisionTower(cfg.vision, flip_schedule=vis_sched)
    proj = VisionProjector(cfg.projector, flip_schedule=proj_sched)
    rng = np.random.default_rng(1)
    px = jnp.asarray(rng.normal(size=(2, 28, 28, 3)), jnp.float32)
    feats = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
    tp = tower.init(jax.random.PRNGKey(0), px, train=False)
    pp = proj.init(jax.random.PRNGKey(1), feats, train=False)

    t_apply = jax.jit(lambda s: tower.apply(tp, px, step=s, train=True),
                      static_argnums=())
    p_apply = jax.jit(lambda s: proj.apply(pp, feats, step=s, train=True))
    n_layers = cfg.vision.num_hidden_layers
    for step in (0, 3, 6, 7, 9, 11):
        _, _, auxes = t_apply(jnp.int32(step))
        for li in range(n_layers):
            want = vis_sched.is_flip(li, step)
            got = bool(float(auxes[li].losses["is_comp"]))
            assert got == want, (step, li, want, got)
        _, aux = p_apply(jnp.int32(step))
        want = proj_sched.is_flip(0, step)
        assert bool(float(aux.losses["is_comp"])) == want, (step, want)


@pytest.mark.parametrize("stage", ["pretrain", "sft"])
def test_mm_train_step_stages(stage):
    cfg = tiny_llava_cfg()
    tcfg = MMTrainConfig(stage=stage, total_steps=10, rate_flip=0.5)
    vis_sched, proj_sched = build_mm_schedules(cfg, tcfg)
    model = LlavaModel(cfg, vision_flip_schedule=vis_sched,
                       projector_flip_schedule=proj_sched)
    rng = np.random.default_rng(0)
    B, L = 2, 8
    ids = rng.integers(1, 64, (B, L)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    batch = {
        "input_ids": jnp.asarray(ids),
        "images": jnp.asarray(rng.normal(size=(B, 28, 28, 3)),
                              jnp.float32),
        "labels": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, L), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["input_ids"],
                        batch["images"], labels=batch["labels"],
                        train=True)["params"]
    opt = make_mm_optimizer(tcfg, params)
    state = TrainState.create(params, opt)
    step = make_mm_train_step(model, opt, donate=False)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss/total"]))

    def leaf_changed(a, b):
        return not np.allclose(np.asarray(a), np.asarray(b))

    dec_changed = any(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        leaf_changed, state.params["language_model"],
        new_state.params["language_model"])))
    proj_changed = any(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        leaf_changed, state.params["mm_projector"],
        new_state.params["mm_projector"])))
    assert proj_changed
    if stage == "pretrain":
        assert not dec_changed, "decoder must be frozen in stage pretrain"
    else:
        assert dec_changed
