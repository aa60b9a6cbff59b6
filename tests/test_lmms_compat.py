"""lmms_eval import-compat shims: reference task yamls + utils.py load
unmodified through our harness."""

import glob
from pathlib import Path

import pytest

from competesmoe_tpu.eval.lmms_compat import ensure_lmms_compat
from competesmoe_tpu.eval.task import load_task_yaml

REF_TASKS = Path("/root/reference/evaluate/lmms_eval/tasks")


def test_shim_filters_and_processor():
    ensure_lmms_compat()
    from lmms_eval.filters.extraction import (
        ExtendedRegexFilter,
        RegexFilter,
        WhitespaceFilter,
    )
    from lmms_eval.filters.transformation import MapFilter
    from lmms_eval.tasks._task_utils.vqa_eval_metric import (
        EvalAIAnswerProcessor,
    )

    f = RegexFilter(r"([A-D])", fallback="[invalid]")
    assert f.apply([["the answer is B."], ["nope"]], None) == \
        [["B"], ["[invalid]"]]
    assert WhitespaceFilter().apply([[" x"]], None) == [["x"]]
    assert MapFilter({"yes": 1}, 0).apply([["yes", "no"]], None) == \
        [[1, 0]]
    erf = ExtendedRegexFilter(ignore_case=True, ignore_punctuation=True)
    assert erf.filter_ignores("A.") == "a"

    proc = EvalAIAnswerProcessor()
    assert proc("The Dog") == "dog"
    assert proc("two") == "2"


def test_shim_file_utils_and_caption_metrics(tmp_path):
    ensure_lmms_compat()
    import argparse

    from lmms_eval.tasks._task_utils.file_utils import (
        generate_submission_file,
    )
    from pycocoevalcap.eval import Bleu, Cider

    args = argparse.Namespace(output_path=str(tmp_path))
    p = generate_submission_file("sub.json", args)
    assert p.endswith("sub.json") and str(tmp_path) in p
    assert Path(p).parent.exists()

    gts = {"a": ["a cat on the mat"], "b": ["a dog"]}
    res = {"a": ["a cat on the mat"], "b": ["a dog"]}
    c, _ = Cider().compute_score(gts, res)
    assert c > 5.0  # identity captions near the CIDEr ceiling
    b, _ = Bleu(4).compute_score(gts, res)
    assert b[0] == pytest.approx(1.0)  # BLEU-1 perfect match


@pytest.mark.skipif(not REF_TASKS.exists(), reason="no reference mount")
def test_reference_yaml_bulk_load():
    """The vast majority of the reference's ~259 task yamls (incl. their
    per-task utils.py with lmms_eval/pycocoevalcap/openai imports) load
    through load_task_yaml without modification; the residue needs spacy
    or other uninstalled NLP deps."""
    yams = sorted(glob.glob(str(REF_TASKS / "*" / "*.yaml")))
    assert len(yams) > 200
    ok = 0
    for y in yams:
        try:
            cfg = load_task_yaml(y, register=False)
            assert cfg.output_type
            ok += 1
        except Exception:
            pass
    assert ok >= 230, f"only {ok}/{len(yams)} reference yamls loaded"


@pytest.mark.skipif(not REF_TASKS.exists(), reason="no reference mount")
def test_sibling_module_import_via_finder():
    """A reference utils.py importing a SIBLING module
    (lmms_eval.tasks.mmbench.mmbench_evals) resolves through the
    registered tasks root."""
    load_task_yaml(str(REF_TASKS / "mmbench" / "mmbench_en_dev.yaml"),
                   register=False)
    from lmms_eval.tasks.mmbench.mmbench_evals import MMBench_Evaluator
    assert callable(MMBench_Evaluator)


def test_model_specific_prompt_kwargs_adapter():
    """Two-arg reference hooks receive the yaml's prompt kwargs; one-arg
    hooks are untouched (api/task.py convention)."""
    from competesmoe_tpu.eval.task import ConfigurableTask, TaskConfig

    def two_arg(doc, model_specific_prompt_kwargs):
        return (model_specific_prompt_kwargs.get("pre_prompt", "")
                + doc["q"]
                + model_specific_prompt_kwargs.get("post_prompt", ""))

    def one_arg(doc):
        return doc["q"].upper()

    docs = [{"q": "hi"}]
    t = ConfigurableTask(TaskConfig(
        task="t1", doc_to_text=two_arg, doc_to_visual=lambda d: [],
        doc_to_target=lambda d: "", docs=docs,
        model_specific_prompt_kwargs={"pre_prompt": "<", 
                                      "post_prompt": ">"}))
    assert t.doc_to_text(docs[0]) == "<hi>"

    # missing kwargs -> empty dict, not None
    t2 = ConfigurableTask(TaskConfig(
        task="t2", doc_to_text=two_arg, doc_to_visual=lambda d: [],
        doc_to_target=lambda d: "", docs=docs))
    assert t2.doc_to_text(docs[0]) == "hi"

    t3 = ConfigurableTask(TaskConfig(
        task="t3", doc_to_text=one_arg, doc_to_visual=lambda d: [],
        doc_to_target=lambda d: "", docs=docs))
    assert t3.doc_to_text(docs[0]) == "HI"


def test_reference_yaml_full_load():
    """After the round-3 stubs (spacy/anls/zss/capture_metric/reka), EVERY
    reference task yaml loads: 259/259."""
    yams = sorted(glob.glob(str(REF_TASKS / "*" / "*.yaml")))
    fails = {}
    for y in yams:
        try:
            cfg = load_task_yaml(y, register=False)
            assert cfg.output_type
        except Exception as e:  # noqa: BLE001 — collect for the message
            fails[y] = repr(e)
    assert not fails, f"{len(fails)} yamls failed: {fails}"


def test_zss_compat_tree_edit_distance():
    """Zhang-Shasha ground truths (hand-checked small trees)."""
    from competesmoe_tpu.eval.zss_compat import Node, distance

    # identical trees -> 0
    def tree():
        return Node("a").addkid(Node("b")).addkid(Node("c"))
    assert distance(tree(), tree()) == 0
    # one relabel -> 1
    t2 = Node("a").addkid(Node("b")).addkid(Node("d"))
    assert distance(tree(), t2) == 1
    # delete one leaf -> 1
    t3 = Node("a").addkid(Node("b"))
    assert distance(tree(), t3) == 1
    # classic zhang-shasha paper example: f(d(a c(b)) e) vs f(c(d(a b)) e)
    A = Node("f").addkid(
        Node("d").addkid(Node("a")).addkid(Node("c").addkid(Node("b")))
    ).addkid(Node("e"))
    B = Node("f").addkid(
        Node("c").addkid(Node("d").addkid(Node("a")).addkid(Node("b")))
    ).addkid(Node("e"))
    assert distance(A, B) == 2


def test_synthdog_evaluator_runs_offline():
    """The reference synthdog donut evaluator computes a real nTED score
    through zss_compat (synthdog/donut_evaluator.py:195-225)."""
    from competesmoe_tpu.eval.lmms_compat import ensure_lmms_compat
    from competesmoe_tpu.eval.task import load_task_yaml as _l  # noqa: F401

    ensure_lmms_compat()
    load_task_yaml(str(REF_TASKS / "synthdog" / "synthdog_en.yaml"),
                   register=False)
    from lmms_eval.tasks.synthdog.donut_evaluator import JSONParseEvaluator
    ev = JSONParseEvaluator()
    same = ev.cal_acc({"text_sequence": "hello world"},
                      {"text_sequence": "hello world"})
    diff = ev.cal_acc({"text_sequence": "hello world"},
                      {"text_sequence": "totally other"})
    assert same == 1.0
    assert 0.0 <= diff < same


def test_frame_sampler_video_reader(tmp_path):
    """Video tasks get frames from the pluggable sampler: a directory of
    images acts as the video (decord.VideoReader surface)."""
    import numpy as np
    from PIL import Image

    from competesmoe_tpu.eval.lmms_compat import ensure_lmms_compat

    ensure_lmms_compat()
    vid = tmp_path / "vid"
    vid.mkdir()
    for i, color in enumerate([(255, 0, 0), (0, 255, 0), (0, 0, 255)]):
        Image.new("RGB", (8, 8), color).save(vid / f"f{i}.png")
    import decord
    vr = decord.VideoReader(str(vid), ctx=decord.cpu(0))
    assert len(vr) == 3
    batch = vr.get_batch([0, 2]).asnumpy()
    assert batch.shape == (2, 8, 8, 3)
    assert batch[0, 0, 0, 0] == 255 and batch[1, 0, 0, 2] == 255


def test_spacy_stub_tokenizes():
    from competesmoe_tpu.eval.lmms_compat import ensure_lmms_compat
    ensure_lmms_compat()
    import spacy
    en = spacy.load("en_core_web_sm")
    assert [t.text for t in en("Hello, world!")] == \
        ["Hello", ",", "world", "!"]
    zh = spacy.load("zh_core_web_sm")
    assert [t.text for t in zh("你好 世界")] == ["你", "好", "世", "界"]
