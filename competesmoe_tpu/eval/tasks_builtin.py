"""Built-in multimodal benchmark task configs.

The reference ships ~75 yaml task families (evaluate/lmms_eval/tasks/*,
docs/current_tasks.md). This module registers the core visual-instruction
benchmarks the CompeteSMoE paper evaluates on as TaskConfigs backed by HF
datasets (downloaded on first use; offline runs can pass explicit `docs`).

Each config mirrors the reference task's doc_to_text/doc_to_target
conventions (evaluate/lmms_eval/tasks/<name>/*.yaml + utils.py).
"""

from __future__ import annotations

from typing import Dict

from .task import TaskConfig, register_task


def _visual(key="image"):
    def fn(doc):
        img = doc.get(key)
        return [img.convert("RGB")] if img is not None else []
    return fn


def _register_all() -> Dict[str, TaskConfig]:
    configs = {}

    configs["pope"] = register_task("pope", TaskConfig(
        task="pope", dataset_path="lmms-lab/POPE", test_split="test",
        output_type="generate_until",
        doc_to_text=lambda d: (d["question"]
                               + "\nAnswer the question using a single "
                                 "word or phrase."),
        doc_to_visual=_visual(),
        doc_to_target=lambda d: d["answer"],
        generation_kwargs={"max_new_tokens": 16},
        metric_list=[{"metric": "exact_match", "aggregation": "mean"}]))

    configs["mme"] = register_task("mme", TaskConfig(
        task="mme", dataset_path="lmms-lab/MME", test_split="test",
        output_type="generate_until",
        doc_to_text=lambda d: d["question"],
        doc_to_visual=_visual(),
        doc_to_target=lambda d: d["answer"],
        generation_kwargs={"max_new_tokens": 16},
        metric_list=[{"metric": "exact_match", "aggregation": "mean"}]))

    configs["textvqa_val"] = register_task("textvqa_val", TaskConfig(
        task="textvqa_val", dataset_path="lmms-lab/textvqa",
        test_split="validation", output_type="generate_until",
        doc_to_text=lambda d: (d["question"]
                               + "\nAnswer the question using a single "
                                 "word or phrase."),
        doc_to_visual=_visual(),
        doc_to_target=lambda d: d["answers"][0] if d.get("answers")
        else "",
        generation_kwargs={"max_new_tokens": 16},
        metric_list=[{"metric": "anls", "aggregation": "mean"}]))

    configs["gqa"] = register_task("gqa", TaskConfig(
        task="gqa", dataset_path="lmms-lab/GQA",
        dataset_name="testdev_balanced_instructions",
        test_split="testdev", output_type="generate_until",
        doc_to_text=lambda d: (d["question"]
                               + "\nAnswer the question using a single "
                                 "word or phrase."),
        doc_to_visual=_visual(),
        doc_to_target=lambda d: d["answer"],
        generation_kwargs={"max_new_tokens": 16},
        metric_list=[{"metric": "exact_match", "aggregation": "mean"}]))

    configs["scienceqa_img"] = register_task("scienceqa_img", TaskConfig(
        task="scienceqa_img", dataset_path="lmms-lab/ScienceQA",
        dataset_name="ScienceQA-IMG", test_split="test",
        output_type="generate_until",
        doc_to_text=lambda d: (
            d["question"] + "\n"
            + "\n".join(f"{chr(65 + i)}. {c}"
                        for i, c in enumerate(d["choices"]))
            + "\nAnswer with the option's letter from the given choices "
              "directly."),
        doc_to_visual=_visual(),
        doc_to_target=lambda d: chr(65 + d["answer"]),
        generation_kwargs={"max_new_tokens": 4},
        filter_list=[{"filter": "take_first_line"},
                     {"filter": "strip"}],
        metric_list=[{"metric": "exact_match", "aggregation": "mean"}]))

    return configs


BUILTIN_TASKS = _register_all()
