"""Round-trip label-masking tests for every conversation preprocessor
(reference train.py:444-1069; VERDICT r1 item 7)."""

import numpy as np
import pytest

from competesmoe_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from competesmoe_tpu.data.mm_data import PREPROCESSORS

SPECIALS = ["<|end|>", "<|im_end|>", "<|im_start|>", "</s>", "[INST]",
            "[/INST]", "<image>"]


class TemplTok:
    """Whitespace tokenizer that isolates template specials as single
    tokens — giving the additivity (tok(a)+tok(b)=tok(a+b) at special
    boundaries) the reference's round-length arithmetic relies on.
    `drop` lists specials that tokenize to NO token (the MPT masking
    arithmetic needs a zero-width '<|im_end|>', mirroring how the real
    chatml tokenizer merges it into the following '<|im_start|>')."""

    pad_token_id = 0
    model_max_length = 512

    def __init__(self, add_bos: bool, drop: tuple = ()):
        self.add_bos = add_bos
        self.drop = drop
        self.bos_token_id = 1 if add_bos else None
        self.vocab = {"<bos>": 1}

    def _id(self, w):
        if w not in self.vocab:
            self.vocab[w] = len(self.vocab) + 2
        return self.vocab[w]

    def words(self, text):
        for sp in self.drop:
            text = text.replace(sp, " ")
        for sp in SPECIALS:
            text = text.replace(sp, f" {sp} ")
        return text.split()

    def __call__(self, text):
        class R:
            pass
        r = R()
        ids = [self._id(w) for w in self.words(text)]
        r.input_ids = ([1] + ids) if self.add_bos else ids
        return r

    def invert(self):
        return {v: k for k, v in self.vocab.items()}


CONVS = [[
    {"from": "human", "value": "what is shown here"},
    {"from": "gpt", "value": "crimson feline creature"},
    {"from": "human", "value": "anything else visible"},
    {"from": "gpt", "value": "azure canine shape"},
]]

ANSWER_WORDS = {"crimson", "feline", "creature", "azure", "canine",
                "shape"}
QUESTION_WORDS = {"what", "shown", "here", "anything", "else", "visible"}

# (template, add_bos, zero-width specials, multi-round). phi3's pairwise
# round arithmetic only balances for single-round conversations under an
# additive tokenizer (the reference wipes mismatched samples, train.py
# "Phi3 tokenization mismatch" branch); mpt needs a zero-width im_end.
TEMPLATES = [("phi35", True, (), True),
             ("phi3", True, (), False),
             ("v1", True, (), True),
             ("llama_2", True, (), True),
             ("mpt", False, ("<|im_end|>",), True),
             ("smollm", False, (), True)]


@pytest.mark.parametrize("version,add_bos,drop,multi", TEMPLATES)
def test_masking_roundtrip(version, add_bos, drop, multi):
    tok = TemplTok(add_bos, drop)
    convs = CONVS if multi else [CONVS[0][:2]]
    d = PREPROCESSORS[version](convs, tok, has_image=False)
    ids, labels = d["input_ids"][0], d["labels"][0]
    inv = tok.invert()
    assert not np.all(labels == IGNORE_INDEX), \
        f"{version}: round-length arithmetic wiped the sample"
    answers = ANSWER_WORDS if multi else {"crimson", "feline", "creature"}
    questions = QUESTION_WORDS if multi else {"what", "shown", "here"}
    supervised = {inv.get(int(t), "?") for t, l in zip(ids, labels)
                  if l != IGNORE_INDEX}
    masked = {inv.get(int(t), "?") for t, l in zip(ids, labels)
              if l == IGNORE_INDEX}
    # every answer word is supervised; every question word is masked
    assert answers <= supervised, \
        f"{version}: missing answers {answers - supervised}"
    assert questions <= masked, \
        f"{version}: question leaked {questions - masked}"
    # question words never supervised
    assert not (questions & supervised)
    # supervised positions keep their input token (labels == ids there)
    sel = labels != IGNORE_INDEX
    np.testing.assert_array_equal(labels[sel], ids[sel])


@pytest.mark.parametrize("version,add_bos,drop,multi", TEMPLATES)
def test_masking_with_image(version, add_bos, drop, multi):
    tok = TemplTok(add_bos, drop)
    convs = [[{"from": "human", "value": "<image>\nwhat is shown here"},
              {"from": "gpt", "value": "crimson feline creature"}]]
    d = PREPROCESSORS[version](convs, tok, has_image=True)
    ids, labels = d["input_ids"][0], d["labels"][0]
    assert IMAGE_TOKEN_INDEX in ids
    assert not np.all(labels == IGNORE_INDEX)
    # the image token itself is never supervised
    assert all(l == IGNORE_INDEX for t, l in zip(ids, labels)
               if t == IMAGE_TOKEN_INDEX)
    inv = tok.invert()
    supervised = {inv.get(int(t), "?") for t, l in zip(ids, labels)
                  if l != IGNORE_INDEX}
    assert ANSWER_WORDS - {"azure", "canine", "shape"} <= supervised
