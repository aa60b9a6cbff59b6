"""One full benchmark-shaped eval at SCALE through the real CLI
(VERDICT r3 item 7): hundreds of requests, engine-backed generation,
cross-rank merge equal to the solo run.

POPE itself needs the HF hub (air gap), so the task here is POPE's exact
shape — yes/no object-presence questions over images, exact_match mean,
"Answer the question using a single word or phrase." suffix
(eval/tasks_builtin.py pope entry; reference yaml
evaluate/lmms_eval/tasks/pope/pope.yaml) — over 300 synthetic docs whose
answers derive from the image content. Everything else is the
production path: cli/eval_mm.py, checkpoint loader, conversation
template, continuous-batching engine (--engine-slots), rank split +
--merge-dir file gather.
"""

import json
import time

import numpy as np
import pytest
from PIL import Image

from tests.test_builder import make_fake_checkpoint

pytestmark = pytest.mark.slow

N_DOCS = 300


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt_scale")
    make_fake_checkpoint(d)
    return d


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok_scale")
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=60, special_tokens=["<pad>", "<s>", "</s>", "<|end|>"])
    corpus = ["is there a red blue square in the image yes no Answer "
              "the question using single word or phrase <|user|> "
              "<|assistant|> <|system|> You are helpful"] * 20
    tok.train_from_iterator(corpus, trainer)
    from transformers import PreTrainedTokenizerFast
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", bos_token="<s>",
        eos_token="</s>")
    fast.save_pretrained(str(d))
    return str(d)


def _register_pope_synth():
    from competesmoe_tpu.eval import TaskConfig, register_task

    rng = np.random.default_rng(7)
    docs = []
    for i in range(N_DOCS):
        red = bool(rng.integers(0, 2))
        color = (230, 20, 20) if red else (20, 20, 230)
        img = Image.new("RGB", (32, 32), (240, 240, 240))
        for x in range(8, 24):
            for y in range(8, 24):
                img.putpixel((x, y), color)
        docs.append({"question": "Is there a red square in the image?",
                     "answer": "yes" if red else "no", "img": img})
    register_task("pope_synth", TaskConfig(
        task="pope_synth", output_type="generate_until",
        doc_to_text=lambda d: (d["question"]
                               + "\nAnswer the question using a single "
                                 "word or phrase."),
        doc_to_visual=lambda d: [d["img"]],
        doc_to_target=lambda d: d["answer"],
        generation_kwargs={"max_new_tokens": 2},
        metric_list=[{"metric": "exact_match", "aggregation": "mean"}],
        docs=docs))


def _run(ckpt_dir, tok_dir, out_path, extra):
    from competesmoe_tpu.cli.eval_mm import main
    main(["--model-dir", str(ckpt_dir), "--tokenizer", tok_dir,
          "--tasks", "pope_synth", "--batch-size", "4",
          "--max-new-tokens", "2", "--engine-slots", "4",
          "--engine-max-len", "96",
          "--output-path", str(out_path)] + extra)
    return json.loads(out_path.read_text())


def test_pope_shape_at_scale_engine_merge(ckpt_dir, tok_dir, tmp_path):
    _register_pope_synth()

    t0 = time.monotonic()
    solo = _run(ckpt_dir, tok_dir, tmp_path / "solo.json", [])
    t_solo = time.monotonic() - t0
    assert len(solo["samples"]["pope_synth"]) == N_DOCS

    md = tmp_path / "merge"
    _run(ckpt_dir, tok_dir, tmp_path / "r1.json",
         ["--rank", "1", "--world-size", "2", "--merge-dir", str(md)])
    merged = _run(ckpt_dir, tok_dir, tmp_path / "r0.json",
                  ["--rank", "0", "--world-size", "2",
                   "--merge-dir", str(md)])
    t_all = time.monotonic() - t0

    assert merged.get("merged_ranks") == 2
    assert len(merged["samples"]["pope_synth"]) == N_DOCS
    np.testing.assert_allclose(
        merged["results"]["pope_synth"]["exact_match"],
        solo["results"]["pope_synth"]["exact_match"], rtol=1e-9)
    # runtime on the record (VERDICT r3 item 7 asks for it)
    print(f"\n[eval-at-scale] {N_DOCS} docs engine-backed: solo "
          f"{t_solo:.1f}s, solo+2-rank total {t_all:.1f}s")
