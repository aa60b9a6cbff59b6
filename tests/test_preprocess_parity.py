"""Data-path parity vs the REFERENCE's own preprocess_* functions.

tests/test_preprocessors.py proves masking semantics with a synthetic
tokenizer; this file runs the reference's ACTUAL train.py tokenization +
label-masking code (train.py:444-1069, imported via reference_loader.
mm_train) side by side with ours on the SAME real HF tokenizer and
asserts input_ids and labels are element-exact — the conversation
rendering, round-splitting arithmetic, BOS handling, and
tokenizer_image_token splicing all have to agree for checkpoints trained
here to be interchangeable with reference ones.

This suite caught (round 4): `--version llama_2` must select the
conv_llama_2 template (safety system prompt, '<s>' round separator), the
mpt system string differed, and preprocess_plain dropped the BOS.

Tokenizer realities the fixtures encode: phi35/phi3/v1/llama_2 run with
a BOS-adding tokenizer (their `cur_len = 1` arithmetic assumes it,
train.py:687/762); mpt/smollm with a no-BOS one (`cur_len = 0`,
train.py:860/950). mpt's reference arithmetic under-counts one
'<|im_end|>' per conversation unless the tokenizer merges it to zero
width (the real chatml behavior) — with an atomic special token BOTH
sides wipe the sample identically (wipe parity, asserted); the semantic
masking itself is covered by test_preprocessors' zero-width tokenizer.
"""

import numpy as np
import pytest

from competesmoe_tpu.constants import IGNORE_INDEX
from competesmoe_tpu.data.mm_data import PREPROCESSORS

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity

CONVS = [
    [{"from": "human", "value": "what is shown here"},
     {"from": "gpt", "value": "a crimson feline creature"}],
    [{"from": "human", "value": "<image>\ndescribe the picture"},
     {"from": "gpt", "value": "an azure canine shape"},
     {"from": "human", "value": "anything else visible"},
     {"from": "gpt", "value": "two small metal cubes"}],
]

SPECIALS = ["<pad>", "<s>", "</s>", "<|user|>", "<|assistant|>",
            "<|system|>", "<|end|>", "[INST]", "[/INST]", "<<SYS>>",
            "<</SYS>>", "<|im_start|>", "<|im_end|>", "<|endoftext|>"]

CORPUS = ["what is shown here a crimson feline creature describe the "
          "picture an azure canine shape anything else visible two "
          "small metal cubes You are helpful AI respectful honest "
          "assistant A chat conversation between curious user and an "
          "LLM based artificial intelligence assistant The gives "
          "helpful detailed polite and honest answers to the questions "
          "USER ASSISTANT user assistant system"] * 30


def _make_tok(add_bos: bool):
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    t = Tokenizer(models.BPE(unk_token=None))
    t.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(vocab_size=260,
                                  special_tokens=SPECIALS)
    t.train_from_iterator(CORPUS, trainer)
    if add_bos:
        t.post_processor = TemplateProcessing(
            single="<s> $A", pair="<s> $A $B",
            special_tokens=[("<s>", t.token_to_id("<s>"))])
    fast = PreTrainedTokenizerFast(
        tokenizer_object=t, pad_token="<pad>", eos_token="</s>",
        bos_token="<s>" if add_bos else None,
        additional_special_tokens=[s for s in SPECIALS
                                   if s.startswith(("<|", "[", "<<"))])
    fast.model_max_length = 512
    return fast


@pytest.fixture(scope="module")
def toks():
    return {"bos": _make_tok(True), "nobos": _make_tok(False)}


@pytest.fixture(scope="module")
def ref_train():
    import reference_loader as rl
    return rl.mm_train()


# version -> (tokenizer kind, tokenizer.legacy, expect a wipe)
VARIANTS = {
    "phi35": ("bos", True, False),
    "phi3": ("bos", True, False),
    "v1": ("bos", True, False),       # `not legacy` gate (train.py:789)
    "llama_2": ("bos", True, False),
    "smollm": ("nobos", False, False),  # `legacy` gate (train.py:968)
    "mpt": ("nobos", False, True),      # needs zero-width <|im_end|>
}


def _prep_source(source, has_image):
    src = [dict(s) for s in source]
    if has_image and "<image>" not in src[0]["value"]:
        src[0]["value"] = "<image>\n" + src[0]["value"]
    if not has_image:
        src = [{**s, "value": s["value"].replace("<image>\n", "")}
               for s in src]
    return src


@pytest.mark.parametrize("version", sorted(VARIANTS))
@pytest.mark.parametrize("has_image", [False, True])
def test_preprocess_matches_reference(ref_train, toks, version,
                                      has_image):
    train, conv_lib = ref_train
    kind, legacy, expect_wipe = VARIANTS[version]
    tok = toks[kind]
    tok.legacy = legacy
    # the reference preprocessors read the module-global template
    # (train.py preprocess dispatch + `conv_templates[...]` copies)
    conv_lib.default_conversation = conv_lib.conv_templates[version]

    # multi-round phi3 is wiped by the reference's own pairwise
    # arithmetic; the wipe-parity case below covers it explicitly
    convs = CONVS[:1] if version == "phi3" else CONVS
    for source in convs:
        src = _prep_source(source, has_image)
        ref = train.preprocess([[dict(s) for s in src]], tok,
                               has_image=has_image)
        ours = PREPROCESSORS[version]([[dict(s) for s in src]], tok,
                                      has_image=has_image,
                                      model_max_length=512)
        ref_ids = np.asarray(ref["input_ids"][0])
        ref_lab = np.asarray(ref["labels"][0])
        our_ids = np.asarray(ours["input_ids"][0])
        our_lab = np.asarray(ours["labels"][0])
        np.testing.assert_array_equal(our_ids, ref_ids,
                                      err_msg=f"{version} ids")
        np.testing.assert_array_equal(our_lab, ref_lab,
                                      err_msg=f"{version} labels")
        wiped = bool((ref_lab == IGNORE_INDEX).all())
        assert wiped == expect_wipe, (
            f"{version}: wipe behavior changed (wiped={wiped})")
        if not expect_wipe:
            assert (our_lab == IGNORE_INDEX).any()
            assert (our_lab != IGNORE_INDEX).any()


def test_preprocess_phi3_multiround_wipes_both(ref_train, toks):
    """Multi-round phi3 samples trip the reference's tokenization-
    mismatch guard and are wiped to all-IGNORE (train.py:527-626); our
    port must wipe identically, not silently train on them."""
    train, conv_lib = ref_train
    conv_lib.default_conversation = conv_lib.conv_templates["phi3"]
    tok = toks["bos"]
    tok.legacy = True
    src = _prep_source(CONVS[1], has_image=False)
    ref = train.preprocess([[dict(s) for s in src]], tok,
                           has_image=False)
    ours = PREPROCESSORS["phi3"]([[dict(s) for s in src]], tok,
                                 has_image=False, model_max_length=512)
    ref_lab = np.asarray(ref["labels"][0])
    our_lab = np.asarray(ours["labels"][0])
    assert (ref_lab == IGNORE_INDEX).all()
    np.testing.assert_array_equal(our_lab, ref_lab)


def test_preprocess_plain_matches_reference(ref_train, toks):
    train, conv_lib = ref_train
    conv_lib.default_conversation = conv_lib.conv_templates["plain"]
    tok = toks["bos"]
    tok.legacy = True
    src = [[{"from": "human", "value": "<image>\n"},
            {"from": "gpt", "value": "a crimson feline creature"}]]
    ref = train.preprocess([[dict(s) for s in src[0]]], tok,
                           has_image=True)
    ours = PREPROCESSORS["plain"]([[dict(s) for s in src[0]]], tok)
    np.testing.assert_array_equal(np.asarray(ours["input_ids"][0]),
                                  np.asarray(ref["input_ids"][0]))
    np.testing.assert_array_equal(np.asarray(ours["labels"][0]),
                                  np.asarray(ref["labels"][0]))
    assert (np.asarray(ours["labels"][0]) != IGNORE_INDEX).any()
