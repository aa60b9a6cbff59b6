"""Streaming corpus (vocab train -> mmap chunks) + downstream QA battery
(VERDICT r1 item 5 / missing #2)."""

import gzip
import json
import subprocess
import sys

import numpy as np
import pytest

from competesmoe_tpu.data import qa_datasets as qa
from competesmoe_tpu.data.streaming import (
    STORY_SEP,
    C4Spec,
    ChunkedLMCorpus,
    LocalShardSpec,
    SlimPajamaSpec,
    shard_lines,
)

DOCS = ["the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "how vexingly quick daft zebras jump",
        "sphinx of black quartz judge my vow"] * 8

pytestmark = pytest.mark.slow



def write_shard(path, docs, mode="gz"):
    lines = "".join(json.dumps({"text": d}) + "\n" for d in docs)
    if mode == "gz":
        with gzip.open(path, "wt", encoding="utf-8") as f:
            f.write(lines)
    elif mode == "zst":
        import zstandard
        path.write_bytes(
            zstandard.ZstdCompressor().compress(lines.encode()))
    else:
        path.write_text(lines)
    return path


def make_corpus(tmp_path, unroll=16, **kw):
    shards = [write_shard(tmp_path / f"s{i}.jsonl.gz", DOCS)
              for i in range(2)]
    spec = LocalShardSpec(shards=[str(s) for s in shards])
    return ChunkedLMCorpus(spec, unroll, tmp_path / "cache",
                           vocab_size=200, **kw)


def test_shard_lines_formats(tmp_path):
    for mode, name in (("gz", "a.jsonl.gz"), ("zst", "a.jsonl.zst"),
                       ("plain", "a.jsonl")):
        p = write_shard(tmp_path / name, DOCS[:3], mode)
        texts = [json.loads(line)["text"] for line in shard_lines(p)]
        assert texts == DOCS[:3]


def test_corpus_end_to_end(tmp_path):
    corpus = make_corpus(tmp_path)
    # SentencePiece-style vocab with the story separator as one token
    assert corpus.tokenizer.token_to_id(STORY_SEP) is not None
    assert len(corpus) > 0
    w = corpus[0]
    assert w.shape == (17,)
    assert w.dtype == np.int32
    # round-trip: decoding the tokens reproduces words of the corpus
    ids = corpus.encode(DOCS[0])
    assert corpus.tokenizer.decode(ids).replace(" ", "") == \
        DOCS[0].replace(" ", "")
    # chunks exist and tokenizing again is a no-op (resume semantics)
    chunk = corpus.chunk_paths[0]
    mtime = chunk.stat().st_mtime_ns
    corpus2 = make_corpus(tmp_path)
    assert corpus2.chunk_paths[0].stat().st_mtime_ns == mtime


def test_corpus_token_limit(tmp_path):
    corpus = make_corpus(tmp_path, token_limit=1)
    assert len(corpus.chunk_paths) == 1  # stopped after the first shard


def test_slimpajama_spec_matches_reference_permutation():
    spec = SlimPajamaSpec()
    # reference slimpajama.py:44-57: indices shuffled with rng(123)
    assert spec.get_n_shards("train") == 5912 + 5911 + 5919 + 5917 + 5933 \
        + 5915 + 5906 + 5921 + 5920 + 5912
    u0 = spec.get_url(0, "train")
    assert u0.startswith("https://huggingface.co/datasets/cerebras/"
                         "SlimPajama-627B/resolve/main/train/chunk")
    assert "example_train_" in u0 and u0.endswith(".jsonl.zst")
    assert spec.get_url(1, "validation").count("holdout") == 1
    # deterministic
    assert SlimPajamaSpec().get_url(7, "train") == spec.get_url(7, "train")


def test_c4_spec_urls():
    spec = C4Spec()
    assert spec.get_url(3, "train").endswith(
        "en/c4-train.00003-of-01024.json.gz")
    assert spec.get_n_shards("validation") == 8


# ---------------------------------------------------------------------------
# QA loaders: reference prompt semantics
# ---------------------------------------------------------------------------

def _encode(s):
    return [ord(c) % 97 + 1 for c in s]  # deterministic toy tokenizer


def test_hellaswag_loader(tmp_path):
    p = tmp_path / "hs.jsonl"
    p.write_text(json.dumps({
        "activity_label": "Cooking", "ctx_a": "He opens [title] the fridge",
        "ctx_b": "then he", "endings": ["eats", "sleeps", "runs", "sings"],
        "label": 2}) + "\n")
    docs = qa.hellaswag_docs(p, _encode)
    assert len(docs) == 1
    d = docs[0]
    assert d.answer == 2 and len(d.choices_ids) == 4
    assert d.normalize_by_length
    # bracket cleanup applied (ref hellaswag.py:44-50)
    assert d.prefix_ids == _encode("Cooking: He opens. the fridge Then he")


def test_piqa_loader(tmp_path):
    p = tmp_path / "valid.jsonl"
    p.write_text(json.dumps({"goal": "boil water ", "sol1": "use a kettle",
                             "sol2": "use a freezer"}) + "\n")
    lab = tmp_path / "labels.lst"
    lab.write_text("0\n")
    docs = qa.piqa_docs(p, lab, _encode)
    assert docs[0].prefix_ids == _encode("Question: boil water\nAnswer:")
    assert docs[0].choices_ids[0] == _encode(" use a kettle")
    assert docs[0].answer == 0


def test_arc_and_friends(tmp_path):
    rec = {"question": {"stem": "What color is the sky?",
                        "choices": [{"text": "blue", "label": "A"},
                                    {"text": "red", "label": "B"},
                                    {"text": "green", "label": "C"},
                                    {"text": "black", "label": "D"}]},
           "answerKey": "A"}
    p = tmp_path / "arc.jsonl"
    p.write_text(json.dumps(rec) + "\n"
                 + json.dumps({**rec, "question": {
                     "stem": "x", "choices": rec["question"]["choices"][:3]},
                     }) + "\n")
    docs = qa.arc_docs(p, _encode)
    assert len(docs) == 1  # 3-option question skipped like the reference
    assert docs[0].prefix_ids == _encode(
        "Question: What color is the sky?\nAnswer:")
    assert docs[0].answer == 0


def test_winogrande_loader(tmp_path):
    p = tmp_path / "wg.jsonl"
    p.write_text(json.dumps({"sentence": "The _ was too big.",
                             "option1": "ball", "option2": "box",
                             "answer": "2"}) + "\n")
    docs = qa.winogrande_docs(p, _encode)
    assert docs[0].answer == 1
    assert docs[0].choices_ids[1] == _encode(" box")


def test_siqa_loader(tmp_path):
    p = tmp_path / "siqa.jsonl"
    p.write_text(json.dumps({"context": "Tracy left.", "question": "Why?",
                             "answerA": "a", "answerB": "b",
                             "answerC": "c"}) + "\n")
    lab = tmp_path / "labels.lst"
    lab.write_text("3\n")
    docs = qa.siqa_docs(p, lab, _encode)
    assert docs[0].answer == 2
    assert docs[0].prefix_ids == _encode(
        "Context: Tracy left.\nQuestion: Why?\nAnswer:")


def test_blimp_groups_and_evaluator_channels(tmp_path):
    (tmp_path / "anaphor.jsonl").write_text(
        json.dumps({"sentence_good": "aa bb", "sentence_bad": "bb zz"})
        + "\n")
    (tmp_path / "island.jsonl").write_text(
        json.dumps({"sentence_good": "cc", "sentence_bad": "dd"}) + "\n")
    docs = qa.blimp_docs(tmp_path, _encode)
    assert {d.group for d in docs} == {"anaphor", "island"}
    assert all(d.answer == 0 for d in docs)


def test_lambada_items(tmp_path):
    p = tmp_path / "lam.jsonl"
    p.write_text(json.dumps({"text": "he went to the store"}) + "\n")
    items = qa.lambada_items(p, _encode)
    assert items[0][0] == _encode("he went to the")
    assert items[0][1] == _encode(" store")


# ---------------------------------------------------------------------------
# end-to-end: streaming task trains + downstream eval emits the metric JSON
# ---------------------------------------------------------------------------

def test_c4_transformer_task_offline_end_to_end(tmp_path):
    shard = write_shard(tmp_path / "fixture.jsonl.gz", DOCS * 4)
    hs = tmp_path / "hs.jsonl"
    hs.write_text("\n".join(json.dumps({
        "activity_label": "A", "ctx_a": f"ctx {i}", "ctx_b": "then",
        "endings": ["one", "two", "three", "four"], "label": i % 4})
        for i in range(4)))

    from competesmoe_tpu.cli.main import main as cli_main
    import io
    from contextlib import redirect_stdout

    argv = ["-task", "c4_transformer", "-name", "t",
            "-run_dir", str(tmp_path / "runs"),
            "-lm.shards", str(shard), "-lm.cache_dir", str(tmp_path / "c"),
            "-lm.unroll", "16", "-lm.vocab_size", "200",
            "-lm.tokenizer_n_files", "1",
            "-batch_size", "8", "-stop_after", "2", "-valid_interval", "0",
            "-state_size", "32", "-transformer.encoder_n_layers", "2",
            "-transformer.n_heads", "2", "-moe.n_experts", "4",
            "-moe.expert_size", "8", "-pkm.n_heads", "2",
            "-moe_name", "smoe", "-amp", "0", "-save_interval", "1000"]
    cli_main(argv)  # 2 train steps on the streaming corpus

    out = io.StringIO()
    with redirect_stdout(out):
        cli_main(argv + ["-test_only", "1", "-valid_batches", "1",
                         "-lm.eval.hellaswag.enabled", "1",
                         "-lm.eval.hellaswag.path", str(hs)])
    line = [l for l in out.getvalue().splitlines()
            if l.startswith("{")][-1]
    res = json.loads(line)
    assert "valid/perplexity" in res
    assert "hellaswag/accuracy" in res
    assert 0.0 <= res["hellaswag/accuracy"] <= 1.0
    assert res["hellaswag/n_docs"] == 4
