"""End-to-end CLI tests: multimodal training (train_mm) and evaluation
(eval_mm) over a synthesized HF-format checkpoint + local tokenizer."""

import json

import numpy as np
import pytest
from PIL import Image

from tests.test_builder import make_fake_checkpoint

pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    """Build a real PreTrainedTokenizerFast locally (no network)."""
    d = tmp_path_factory.mktemp("tok")
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=60, special_tokens=["<pad>", "<s>", "</s>", "<|end|>"])
    corpus = ["what is this a cat yes really sure red blue <|user|> "
              "<|assistant|> <|system|> You are helpful assistant"] * 20
    tok.train_from_iterator(corpus, trainer)
    from transformers import PreTrainedTokenizerFast
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", bos_token="<s>",
        eos_token="</s>")
    fast.save_pretrained(str(d))
    return str(d)


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    make_fake_checkpoint(d)
    return d


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    (d / "imgs").mkdir()
    Image.new("RGB", (40, 30), (200, 10, 10)).save(d / "imgs" / "a.jpg")
    records = []
    for i in range(8):
        records.append({
            "id": str(i), "image": "a.jpg",
            "conversations": [
                {"from": "human", "value": "<image>\nwhat is this"},
                {"from": "gpt", "value": "a cat"}]})
    (d / "data.json").write_text(json.dumps(records))
    return d


def test_train_mm_cli_rejects_tiny_dataset(ckpt_dir, tok_dir, data_dir,
                                           tmp_path):
    """Without --allow-tiny-dataset, a dataset smaller than one global
    batch aborts instead of silently training on cycled samples."""
    from competesmoe_tpu.cli.train_mm import main
    with pytest.raises(ValueError, match="allow-tiny-dataset"):
        main(["--data-path", str(data_dir / "data.json"),
              "--image-folder", str(data_dir / "imgs"),
              "--tokenizer", tok_dir, "--model-dir", str(ckpt_dir),
              "--stage", "sft", "--num-train-steps", "1",
              "--per-device-batch-size", "2", "--model-max-length", "64",
              "--output-dir", str(tmp_path / "out-tiny")])


def test_train_mm_cli(ckpt_dir, tok_dir, data_dir, tmp_path):
    from competesmoe_tpu.cli.train_mm import main
    out = tmp_path / "out"
    main(["--data-path", str(data_dir / "data.json"),
          "--image-folder", str(data_dir / "imgs"),
          "--tokenizer", tok_dir,
          "--model-dir", str(ckpt_dir),
          "--stage", "sft", "--num-train-steps", "3",
          "--per-device-batch-size", "2", "--model-max-length", "64",
          "--allow-tiny-dataset",
          "--save-interval", "2", "--log-interval", "1",
          "--learning-rate", "1e-4", "--remat",
          "--profile-start-step", "1", "--profile-n-steps", "1",
          "--output-dir", str(out)])
    log = (out / "log_trainer.jsonl").read_text().strip().splitlines()
    recs = [json.loads(l) for l in log]
    assert any("loss/total" in r for r in recs)
    assert (out / "checkpoint" / "model-3").exists()
    # --profile-start-step wrote a TensorBoard trace
    assert any((out / "trace").rglob("*.pb")) or \
        any((out / "trace").rglob("*trace*")), "no profiler trace"


def test_eval_mm_cli(ckpt_dir, tok_dir, tmp_path, capsys):
    # register an offline task, then run the CLI main
    from competesmoe_tpu.eval import TaskConfig, register_task
    docs = [{"q": "what color", "a": "red",
             "img": Image.new("RGB", (30, 30), (255, 0, 0))}
            for _ in range(2)]
    register_task("cli_toy", TaskConfig(
        task="cli_toy", output_type="generate_until",
        doc_to_text=lambda d: d["q"],
        doc_to_visual=lambda d: [d["img"]],
        doc_to_target=lambda d: d["a"],
        generation_kwargs={"max_new_tokens": 2},
        metric_list=[{"metric": "exact_match", "aggregation": "mean"}],
        docs=docs))
    from competesmoe_tpu.cli.eval_mm import main
    out_path = tmp_path / "results.json"
    main(["--model-dir", str(ckpt_dir), "--tokenizer", tok_dir,
          "--tasks", "cli_toy",
          "--batch-size", "2", "--max-new-tokens", "2",
          "--return-id-experts", "--output-path", str(out_path)])
    captured = capsys.readouterr().out
    assert "cli_toy" in captured and "exact_match" in captured
    results = json.loads(out_path.read_text())
    assert "cli_toy" in results["results"]
    tele = results["samples"]["cli_toy"][0]["logs_metrics_vision"]
    assert tele and "layer_0" in tele

    # quantized inference path end-to-end: int8 weights + int8 KV cache
    out_q = tmp_path / "results_q.json"
    main(["--model-dir", str(ckpt_dir), "--tokenizer", tok_dir,
          "--tasks", "cli_toy", "--batch-size", "2",
          "--max-new-tokens", "2", "--load-8bit", "--kv-quant", "int8",
          "--output-path", str(out_q)])
    results_q = json.loads(out_q.read_text())
    assert "cli_toy" in results_q["results"]

    # engine-backed generation end-to-end through the CLI flag
    out_e = tmp_path / "results_e.json"
    main(["--model-dir", str(ckpt_dir), "--tokenizer", tok_dir,
          "--tasks", "cli_toy", "--batch-size", "2",
          "--max-new-tokens", "2", "--engine-slots", "2",
          "--engine-max-len", "96", "--output-path", str(out_e)])
    results_e = json.loads(out_e.read_text())
    # engine path is token-exact vs the solo path on the same (bf16)
    # model, so the score equals the first run's
    assert (results_e["results"]["cli_toy"]["exact_match"]
            == results["results"]["cli_toy"]["exact_match"])


@pytest.mark.parametrize("version", ["plain", "v1", "llama_2"])
def test_train_mm_cli_versions(ckpt_dir, tok_dir, data_dir, tmp_path,
                               version):
    """All conversation formats are reachable from the CLI (r2 exposed
    only phi35|plain; the reference trains 7 backbones,
    train.py:444-1069)."""
    from competesmoe_tpu.cli.train_mm import main
    out = tmp_path / f"out-{version}"
    main(["--data-path", str(data_dir / "data.json"),
          "--image-folder", str(data_dir / "imgs"),
          "--tokenizer", tok_dir,
          "--model-dir", str(ckpt_dir),
          "--version", version,
          "--stage", "sft", "--num-train-steps", "1",
          "--per-device-batch-size", "1", "--model-max-length", "64",
          "--save-interval", "10", "--log-interval", "1",
          "--output-dir", str(out)])
    log = (out / "log_trainer.jsonl").read_text().strip().splitlines()
    assert any("loss/total" in json.loads(l) for l in log)


def test_train_mm_cli_resume(ckpt_dir, tok_dir, data_dir, tmp_path):
    """--resume picks up the latest checkpoint and continues from its
    step (train.py:1501-1505 auto-detect role)."""
    from competesmoe_tpu.cli.train_mm import main
    out = tmp_path / "out-resume"
    args = ["--data-path", str(data_dir / "data.json"),
            "--image-folder", str(data_dir / "imgs"),
            "--tokenizer", tok_dir, "--model-dir", str(ckpt_dir),
            "--stage", "sft", "--per-device-batch-size", "1",
            "--model-max-length", "64", "--save-interval", "2",
            "--log-interval", "1", "--output-dir", str(out)]
    main(args + ["--num-train-steps", "2"])
    assert (out / "checkpoint" / "model-2").exists()
    main(args + ["--num-train-steps", "4", "--resume"])
    recs = [json.loads(l) for l in
            (out / "log_trainer.jsonl").read_text().strip().splitlines()]
    # the resumed run logged steps >= 2 only (no restart from 0)
    steps = [r["step"] for r in recs if "loss/total" in r]
    assert 3 in steps and (out / "checkpoint" / "model-4").exists()


@pytest.mark.fast
def test_recipe_scripts_flags_match_cli():
    """Every --flag in scripts/train/**/*.sh must exist in the train_mm
    argparser (guards script-vs-CLI drift; the reference's 3-stage
    recipe scripts/train/phi35mini/siglip/{pretrain,pft,sft}.sh)."""
    import re
    from pathlib import Path

    from competesmoe_tpu.cli.train_mm import build_argparser

    opts = set()
    for action in build_argparser()._actions:
        opts.update(action.option_strings)
    scripts = list((Path(__file__).parent.parent
                    / "scripts" / "train").rglob("*.sh"))
    assert len(scripts) >= 4
    for sh in scripts:
        if "run_train_all" in sh.name:
            continue
        body = sh.read_text()
        assert "competesmoe_tpu.cli.train_mm" in body
        for flag in re.findall(r"(--[a-z][a-z0-9-]*)", body):
            assert flag in opts, f"{sh.name}: unknown flag {flag}"
