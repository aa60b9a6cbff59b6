"""VQA-family metric tests: EvalAI consensus accuracy, relaxed
correctness, OCRBench containment, corpus CIDEr-D, and the corpus
aggregation path through ConfigurableTask.score()."""

import math

import pytest

from competesmoe_tpu.eval.metrics import get_aggregation, get_metric
from competesmoe_tpu.eval.task import ConfigurableTask, TaskConfig
from competesmoe_tpu.eval.vqa_metrics import (
    cider_d,
    normalize_vqa_answer,
    ocrbench_contains,
    relaxed_correctness,
    vqa_accuracy,
)


def test_normalize_vqa_answer():
    # articles removed, number words mapped, punctuation handling
    assert normalize_vqa_answer("The Dog") == "dog"
    assert normalize_vqa_answer("two") == "2"
    assert normalize_vqa_answer("a cat!") == "cat"
    assert normalize_vqa_answer("isnt") == "isn't"


def test_vqa_accuracy_consensus():
    # 10 annotators: unanimous agreement -> 1.0
    assert vqa_accuracy("yes", ["yes"] * 10) == 1.0
    # prediction matching 3+ of the other 9 for every annotator -> 1.0
    answers = ["red"] * 5 + ["blue"] * 5
    acc_red = vqa_accuracy("red", answers)
    # per annotator: others contain 4 or 5 "red" -> min(1, >=4/3) = 1
    assert acc_red == 1.0
    # matching exactly one annotator: each sees <=1 match -> 1/3 mean
    answers = ["red"] + ["blue"] * 9
    acc = vqa_accuracy("red", answers)
    assert acc == pytest.approx((9 * (1 / 3)) / 10)
    assert vqa_accuracy("green", ["red"] * 10) == 0.0
    # normalization only fires when annotators disagree
    assert vqa_accuracy("the red", ["red"] * 5 + ["crimson"] * 5) == 1.0


def test_relaxed_correctness():
    assert relaxed_correctness("1.04", "1.0") == 1.0   # 4% off
    assert relaxed_correctness("1.06", "1.0") == 0.0   # 6% off
    assert relaxed_correctness("52%", "0.52") == 1.0   # percent handling
    assert relaxed_correctness("Dog", "dog") == 1.0    # non-numeric exact
    assert relaxed_correctness("dog", "dogs") == 0.0
    # reference guards target==0 (falls through to exact match)
    assert relaxed_correctness("0.0", "0") == 0.0
    assert relaxed_correctness("0", "0") == 1.0


def test_ocrbench_contains():
    assert ocrbench_contains("the answer is Paris.", ["paris"]) == 1.0
    assert ocrbench_contains("lyon", ["paris", "london"]) == 0.0
    assert ocrbench_contains("multi\nline 42", "42") == 1.0


def test_cider_d_identity_and_ordering():
    refs = [
        ("a cat sits on the mat", ["a cat sits on the mat"]),
        ("a dog runs in the park", ["a dog runs in the park"]),
    ]
    perfect = cider_d(refs)
    assert perfect > 5.0  # identity captions score near the 10 ceiling
    worse = cider_d([
        ("a cat", ["a cat sits on the mat"]),
        ("something else entirely here", ["a dog runs in the park"]),
    ])
    assert worse < perfect
    assert math.isnan(cider_d([]))


def test_cider_d_idf_downweights_common_ngrams():
    # 'the' appears in every ref -> idf 0; distinctive words dominate
    items = [
        ("the zebra", ["the zebra grazes"]),
        ("the", ["the lion sleeps"]),
    ]
    s = cider_d(items)
    assert s >= 0.0
    # candidate made only of zero-idf tokens scores 0 for that item
    only_common = cider_d([("the", ["the lion"]), ("x", ["the tiger"])])
    assert only_common == pytest.approx(0.0, abs=1e-9)


def test_registry_has_new_metrics():
    for m in ("vqa_accuracy", "relaxed_accuracy", "ocrbench_accuracy",
              "cider_item"):
        assert callable(get_metric(m))
    assert callable(get_aggregation("cider"))


def test_task_score_with_corpus_aggregation():
    """cider_item per-doc values are raw (pred, refs) pairs; the cider
    aggregation consumes the whole list."""
    docs = [{"q": "caption", "refs": ["a cat on a mat", "cat on mat"]},
            {"q": "caption", "refs": ["a dog in a park"]}]
    task = ConfigurableTask(TaskConfig(
        task="toy_cap", output_type="generate_until",
        doc_to_text=lambda d: d["q"],
        doc_to_visual=lambda d: [],
        doc_to_target=lambda d: d["refs"],
        metric_list=[{"metric": "cider_item", "aggregation": "cider"}],
        docs=docs))
    task.build_all_requests()
    preds = ["a cat on a mat", "a dog in a park"]
    for inst, p in zip(task.instances, preds):
        inst.resps = [p]
    task.apply_filters()
    out = task.score()
    assert out["cider_item"] > 5.0

    # and a mixed numeric metric still bootstraps fine in the evaluator
    from competesmoe_tpu.eval.metrics import bootstrap_stderr
    assert bootstrap_stderr([1.0, 0.0, 1.0]) > 0.0


def test_mme_parse_and_paired_aggregation():
    from competesmoe_tpu.eval.metrics import agg_mme, mme_parse_pred

    assert mme_parse_pred("Yes.") == "yes"
    assert mme_parse_pred("n") == "no"
    assert mme_parse_pred("no, it is not") == "no"
    assert mme_parse_pred("maybe") == "other"

    # one image pair fully correct (acc 100 + acc+ 100 = 200), one half
    # correct (acc 50 + acc+ 0 = 50) -> category avg 125; second category
    # with one perfect pair (200) -> total 325
    items = [
        {"question_id": "img1", "category": "color", "score": 1.0},
        {"question_id": "img1", "category": "color", "score": 1.0},
        {"question_id": "img2", "category": "color", "score": 1.0},
        {"question_id": "img2", "category": "color", "score": 0.0},
        {"question_id": "img3", "category": "OCR", "score": 1.0},
        {"question_id": "img3", "category": "OCR", "score": 1.0},
    ]
    assert agg_mme(items) == pytest.approx(325.0)


def test_mme_task_scores_through_process_results():
    from competesmoe_tpu.eval.tasks_builtin import BUILTIN_TASKS
    import dataclasses
    from PIL import Image

    docs = []
    for qid, cat, answers in (("i1", "color", ["Yes", "No"]),
                              ("i2", "code_reasoning", ["Yes", "Yes"])):
        for ans in answers:
            docs.append({"question": "is it?", "answer": ans,
                         "question_id": qid, "category": cat,
                         "image": Image.new("RGB", (8, 8))})
    cfg = dataclasses.replace(BUILTIN_TASKS["mme"], docs=docs)
    task = ConfigurableTask(cfg)
    task.build_all_requests()
    for inst in task.instances:
        inst.resps = ["Yes"]  # always answers yes
    task.apply_filters()
    out = task.score()
    # perception (color): pair acc 50 + acc+ 0 = 50
    assert out["mme_percetion_score"] == pytest.approx(50.0)
    # cognition: both yes -> 200
    assert out["mme_cognition_score"] == pytest.approx(200.0)


def test_builtin_task_registry_widened():
    from competesmoe_tpu.eval.tasks_builtin import BUILTIN_TASKS
    for name in ("infovqa_val", "stvqa", "ocrbench", "mmstar",
                 "hallusion_bench_image", "coco2014_cap_val",
                 "flickr30k_test", "ok_vqa_val2014", "iconqa_test",
                 "vqav2_val", "chartqa", "mmbench_cn_dev",
                 "mmbench_en_test", "mmbench_cn_cc", "seedbench_2",
                 "mmmu_pro_standard", "cmmmu_val"):
        assert name in BUILTIN_TASKS, name
    assert BUILTIN_TASKS["chartqa"].metric_list[0]["metric"] == \
        "relaxed_accuracy"
    assert BUILTIN_TASKS["vqav2_val"].metric_list[0]["metric"] == \
        "vqa_accuracy"
    assert BUILTIN_TASKS["coco2014_cap_val"].metric_list[0][
        "aggregation"] == "cider"
    assert len(BUILTIN_TASKS) >= 32
