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

    letter_prompt = ("\nAnswer with the option's letter from the given "
                     "choices directly.")

    def _mmbench_text(d):
        """hint + question + lettered options (ref mmbench/en_utils.py:42-62)."""
        opts = [f"{c}. {d[c]}" for c in "ABCDE"
                if d.get(c) not in (None, "", "nan")]
        hint = d.get("hint")
        parts = ([hint] if hint and str(hint) != "nan" else []) \
            + [d["question"], "\n".join(opts)]
        return " ".join(parts) + letter_prompt

    configs["mmbench_en_dev"] = register_task("mmbench_en_dev", TaskConfig(
        task="mmbench_en_dev", dataset_path="lmms-lab/MMBench",
        dataset_name="en", test_split="dev",
        output_type="generate_until", group="paper_core",
        doc_to_text=_mmbench_text,
        doc_to_visual=_visual(),
        doc_to_target=lambda d: d["answer"],
        generation_kwargs={"max_new_tokens": 4},
        filter_list=[{"filter": "take_first_line"}, {"filter": "strip"}],
        metric_list=[{"metric": "exact_match", "aggregation": "mean"}]))

    def _mmmu_text(d):
        """question + parsed options (ref tasks/mmmu/utils.py)."""
        import ast
        opts = d.get("options")
        if isinstance(opts, str):
            try:
                opts = ast.literal_eval(opts)
            except (ValueError, SyntaxError):
                opts = [opts]
        lines = "\n".join(f"{chr(65 + i)}. {o}"
                          for i, o in enumerate(opts or []))
        return f"{d['question']}\n{lines}{letter_prompt}"

    configs["mmmu_val"] = register_task("mmmu_val", TaskConfig(
        task="mmmu_val", dataset_path="lmms-lab/MMMU",
        test_split="validation", output_type="generate_until",
        group="paper_core",
        doc_to_text=_mmmu_text,
        doc_to_visual=_visual("image_1"),
        doc_to_target=lambda d: d["answer"],
        generation_kwargs={"max_new_tokens": 16},
        filter_list=[{"filter": "take_first_line"}, {"filter": "strip"}],
        metric_list=[{"metric": "exact_match", "aggregation": "mean"}]))

    configs["mathvista_testmini"] = register_task(
        "mathvista_testmini", TaskConfig(
            task="mathvista_testmini", dataset_path="AI4Math/MathVista",
            test_split="testmini", output_type="generate_until",
            group="paper_core",
            doc_to_text=lambda d: d["query"],
            doc_to_visual=_visual("decoded_image"),
            doc_to_target=lambda d: str(d["answer"]),
            generation_kwargs={"max_new_tokens": 32},
            filter_list=[{"filter": "take_first_line"},
                         {"filter": "strip"}],
            metric_list=[{"metric": "exact_match",
                          "aggregation": "mean"}]))

    def _seed_text(d):
        opts = [d.get(f"choice_{c}") for c in "abcd"]
        lines = "\n".join(f"{chr(65 + i)}. {o}"
                          for i, o in enumerate(opts) if o is not None)
        return f"{d['question']}\n{lines}{letter_prompt}"

    configs["seedbench"] = register_task("seedbench", TaskConfig(
        task="seedbench", dataset_path="lmms-lab/SEED-Bench",
        test_split="test", output_type="generate_until",
        group="paper_core",
        doc_to_text=_seed_text,
        doc_to_visual=_visual(),
        doc_to_target=lambda d: d["answer"],
        generation_kwargs={"max_new_tokens": 4},
        filter_list=[{"filter": "take_first_line"}, {"filter": "strip"}],
        metric_list=[{"metric": "exact_match", "aggregation": "mean"}]))

    def _ai2d_text(d):
        """mcq format with the llava letter post-prompt
        (ref tasks/ai2d/utils.py:6-14)."""
        choices = d["options"]
        lines = "\n".join(f"{chr(65 + i)}. {c}"
                          for i, c in enumerate(choices))
        return f"{d['question']}\n{lines}{letter_prompt}"

    configs["ai2d"] = register_task("ai2d", TaskConfig(
        task="ai2d", dataset_path="lmms-lab/ai2d", test_split="test",
        output_type="generate_until", group="paper_core",
        doc_to_text=_ai2d_text,
        doc_to_visual=_visual(),
        doc_to_target=lambda d: chr(65 + int(d["answer"]))
        if str(d["answer"]).isdigit() else str(d["answer"]),
        generation_kwargs={"max_new_tokens": 4},
        filter_list=[{"filter": "take_first_line"}, {"filter": "strip"}],
        metric_list=[{"metric": "exact_match", "aggregation": "mean"}]))

    single_word = ("\nAnswer the question using a single word or "
                   "phrase.")
    for name, path, split, q_key, a_key, img_key, metric in (
        ("docvqa_val", "lmms-lab/DocVQA", "validation", "question",
         "answers", "image", "anls"),
        ("chartqa", "lmms-lab/ChartQA", "test", "question", "answer",
         "image", "exact_match"),
        ("vqav2_val", "lmms-lab/VQAv2", "validation", "question",
         "multiple_choice_answer", "image", "exact_match"),
        ("vizwiz_vqa_val", "lmms-lab/VizWiz-VQA", "val", "question",
         "answers", "image", "exact_match"),
        ("realworldqa", "lmms-lab/RealWorldQA", "test", "question",
         "answer", "image", "exact_match"),
    ):
        def _target(d, k=a_key):
            v = d.get(k)
            if isinstance(v, (list, tuple)):
                return str(v[0]) if v else ""
            return str(v)

        configs[name] = register_task(name, TaskConfig(
            task=name, dataset_path=path, test_split=split,
            output_type="generate_until",
            doc_to_text=lambda d, k=q_key: d[k] + single_word,
            doc_to_visual=_visual(img_key),
            doc_to_target=_target,
            generation_kwargs={"max_new_tokens": 16},
            metric_list=[{"metric": metric, "aggregation": "mean"}]))

    return configs


BUILTIN_TASKS = _register_all()
