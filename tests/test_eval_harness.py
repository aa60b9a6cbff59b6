"""Eval-harness tests: collator order restore, metrics, end-to-end
evaluate with the JAX llava adapter on a synthetic VQA task."""

import numpy as np
import pytest
from PIL import Image

import jax

from competesmoe_tpu.eval import (
    Collator,
    ConfigurableTask,
    JaxLlava,
    TaskConfig,
    register_task,
    simple_evaluate,
)
from competesmoe_tpu.eval.evaluator import make_table
from competesmoe_tpu.eval.metrics import anls, exact_match
from competesmoe_tpu.models.llava import LlavaModel
from competesmoe_tpu.multimodal.mm_utils import ImageProcessorConfig
from tests.test_llava import tiny_llava_cfg
from tests.test_mm_train import WordTok

pytestmark = pytest.mark.slow



def test_collator_restores_order():
    reqs = ["bbbb", "a", "ccc", "dd"]
    c = Collator(reqs, sort_fn=len, batch_size=2)
    flat = []
    for chunk in c:
        flat.extend(x.upper() for x in chunk)
    restored = c.get_original(flat)
    assert restored == ["BBBB", "A", "CCC", "DD"]


def test_metrics():
    assert exact_match("The Cat", "the cat") == 1.0
    assert exact_match("a", "b") == 0.0
    assert anls("hello", "hello") == 1.0
    assert anls("helo", "hello") > 0.5
    assert anls("zzz", "hello") == 0.0


class EvalTok(WordTok):
    eos_token_id = 0


@pytest.fixture(scope="module")
def jax_llava():
    cfg = tiny_llava_cfg(moe=True)
    model = LlavaModel(cfg)
    tok = EvalTok()
    # warm the vocab so decode is stable
    tok("what color is this yes red blue a cat")
    ids = np.full((1, 6), 2, np.int32)
    px = np.zeros((1, 28, 28, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), ids, px)["params"]
    return JaxLlava(model, params, tok,
                    ImageProcessorConfig(size=28), batch_size=2,
                    max_new_tokens=3)


def test_end_to_end_generate_eval(jax_llava):
    docs = [{"question": "what color is this", "answer": "red",
             "img": Image.new("RGB", (30, 30), (255, 0, 0))}
            for _ in range(3)]
    register_task("toy_vqa", TaskConfig(
        task="toy_vqa", output_type="generate_until",
        doc_to_text=lambda d: d["question"],
        doc_to_visual=lambda d: [d["img"]],
        doc_to_target=lambda d: d["answer"],
        generation_kwargs={"max_new_tokens": 3},
        metric_list=[{"metric": "exact_match", "aggregation": "mean"},
                     {"metric": "anls", "aggregation": "mean"}],
        docs=docs))
    results = simple_evaluate(jax_llava, ["toy_vqa"],
                              return_id_experts=True)
    assert "toy_vqa" in results["results"]
    assert "exact_match" in results["results"]["toy_vqa"]
    # telemetry present: per-layer entropy + histograms
    sample = results["samples"]["toy_vqa"][0]
    tele = sample["logs_metrics_vision"]
    assert tele and "layer_0" in tele
    assert "entropy" in tele["layer_0"]
    assert len(tele["layer_0"]["top1_hist"]) == 4
    table = make_table(results)
    assert "toy_vqa" in table


def test_loglikelihood_eval(jax_llava):
    docs = [{"q": "is this a cat", "a": "yes"} for _ in range(2)]
    register_task("toy_ll", TaskConfig(
        task="toy_ll", output_type="loglikelihood",
        doc_to_text=lambda d: d["q"],
        doc_to_visual=lambda d: [],
        doc_to_target=lambda d: d["a"],
        metric_list=[{"metric": "accuracy", "aggregation": "mean"}],
        docs=docs))
    results = simple_evaluate(jax_llava, ["toy_ll"])
    val = results["results"]["toy_ll"]
    assert "accuracy" in val


def test_rank_splitting():
    docs = [{"q": str(i)} for i in range(10)]
    cfg = TaskConfig(task="t", doc_to_text=lambda d: d["q"], docs=docs)
    t0 = ConfigurableTask(cfg)
    r0 = t0.build_all_requests(rank=0, world_size=2)
    r1 = t0.build_all_requests(rank=1, world_size=2)
    ids0 = {i.doc_id for i in r0}
    ids1 = {i.doc_id for i in r1}
    assert ids0 | ids1 == set(range(10)) and not ids0 & ids1


def test_caching_lm(jax_llava, tmp_path):
    from competesmoe_tpu.eval.cache import CachingLM
    from competesmoe_tpu.eval.instance import Instance

    cached = CachingLM(jax_llava, str(tmp_path / "cache.db"))

    def mk_reqs():
        return [Instance(request_type="generate_until",
                         arguments=("hello world", {"max_new_tokens": 2},
                                    []),
                         idx=0, metadata=("t", i, 1)) for i in range(2)]

    r1 = cached.generate_until(mk_reqs())
    assert cached.misses == 2 and cached.hits == 0
    r2 = cached.generate_until(mk_reqs())
    assert cached.hits == 2
    assert r1 == r2
    # different args -> miss
    reqs = mk_reqs()
    reqs[0].arguments = ("different prompt", {"max_new_tokens": 2}, [])
    cached.generate_until(reqs)
    assert cached.misses == 3


def test_uneven_rank_padding():
    """Every rank must issue the same number of requests (pseudobatch
    padding, ref evaluator.py:276-296), with padded requests excluded
    from scoring."""
    from competesmoe_tpu.eval.evaluator import pad_uneven_ranks

    docs = [{"q": f"q{i}", "a": "x"} for i in range(7)]
    register_task("pad_toy", TaskConfig(
        task="pad_toy", output_type="generate_until",
        doc_to_text=lambda d: d["q"],
        doc_to_target=lambda d: d["a"], docs=docs))
    counts = []
    for rank in range(3):
        task = ConfigurableTask(
            TaskConfig(task="pad_toy", output_type="generate_until",
                       doc_to_text=lambda d: d["q"],
                       doc_to_target=lambda d: d["a"], docs=docs))
        insts = task.build_all_requests(rank=rank, world_size=3)
        pads = pad_uneven_ranks(task, insts, rank, 3)
        counts.append(len(insts) + len(pads))
        assert all(p.padded for p in pads)
    assert counts == [3, 3, 3]  # 7 docs over 3 ranks -> padded to 3 each


def test_stderr_and_groups(jax_llava):
    docs = [{"question": "what color is this", "answer": "red",
             "img": Image.new("RGB", (30, 30), (0, 255, 0))}
            for _ in range(4)]
    for name in ("grp_a", "grp_b"):
        register_task(name, TaskConfig(
            task=name, output_type="generate_until",
            doc_to_text=lambda d: d["question"],
            doc_to_visual=lambda d: [d["img"]],
            doc_to_target=lambda d: d["answer"],
            generation_kwargs={"max_new_tokens": 2},
            metric_list=[{"metric": "exact_match",
                          "aggregation": "mean"}],
            group="toy_group", docs=docs))
    results = simple_evaluate(jax_llava, ["grp_a", "grp_b"])
    for name in ("grp_a", "grp_b"):
        assert "exact_match_stderr" in results["results"][name]
    g = results["groups"]["toy_group"]
    assert "exact_match" in g and "exact_match_stderr" in g
    assert g["n_samples"] == 8
    table = make_table(results)
    assert "[group] toy_group" in table


def test_batched_loglikelihood_matches_unbatched(jax_llava):
    """The bucketed pad-quantum loglikelihood must score like a direct
    per-sequence computation."""
    from competesmoe_tpu.eval.instance import Instance

    img = Image.new("RGB", (30, 30), (0, 0, 255))
    reqs = [Instance(request_type="loglikelihood",
                     arguments=(f"what color {'x ' * i}", "red blue",
                                [img]),
                     idx=0, metadata=("t", i, 1)) for i in range(5)]
    jax_llava.time_inference.clear()
    res = jax_llava.loglikelihood(reqs)
    assert len(res) == 5
    for ll, greedy in res:
        assert np.isfinite(ll) and ll < 0.0
        assert isinstance(greedy, (bool, np.bool_))
    # identical inputs score identically regardless of batch position
    reqs2 = [Instance(request_type="loglikelihood",
                      arguments=("what color ", "red blue", [img]),
                      idx=0, metadata=("t", 0, 1))]
    solo = jax_llava.loglikelihood(reqs2)[0]
    batched = jax_llava.loglikelihood(
        [Instance(request_type="loglikelihood",
                  arguments=("what color ", "red blue", [img]),
                  idx=0, metadata=("t", i, 1)) for i in range(3)])
    for ll, g in batched:
        np.testing.assert_allclose(ll, solo[0], rtol=1e-4)


def test_paper_table_task_prompts():
    """New paper-benchmark configs format prompts like the reference
    task utils."""
    from competesmoe_tpu.eval import tasks_builtin  # noqa: F401
    from competesmoe_tpu.eval.task import get_task_config

    mmb = get_task_config("mmbench_en_dev")
    txt = mmb.doc_to_text({"question": "Which?", "hint": "Look.",
                           "A": "cat", "B": "dog", "C": "", "D": None,
                           "answer": "A"})
    assert txt.startswith("Look. Which? A. cat\nB. dog")
    assert txt.endswith("directly.")

    mmmu = get_task_config("mmmu_val")
    txt = mmmu.doc_to_text({"question": "What is <image 1>?",
                            "options": "['a', 'b']"})
    assert "A. a\nB. b" in txt

    seed = get_task_config("seedbench")
    txt = seed.doc_to_text({"question": "Q?", "choice_a": "1",
                            "choice_b": "2", "choice_c": "3",
                            "choice_d": "4"})
    assert "C. 3" in txt

    ai2d = get_task_config("ai2d")
    assert ai2d.doc_to_target({"answer": "2", "question": "",
                               "options": []}) == "C"
    mv = get_task_config("mathvista_testmini")
    assert mv.doc_to_text({"query": "solve"}) == "solve"


def test_yaml_task_loading(tmp_path):
    """Reference-style task yaml with !function hooks, include templates,
    and per-task utils.py (api/task.py:53-152)."""
    from competesmoe_tpu.eval.task import get_task_config, load_task_yaml

    (tmp_path / "utils.py").write_text(
        "def my_text(doc):\n    return 'Q: ' + doc['q']\n")
    (tmp_path / "_template.yaml").write_text(
        "output_type: generate_until\n"
        "generation_kwargs:\n  max_new_tokens: 4\n")
    (tmp_path / "toy.yaml").write_text(
        "task: yaml_toy\n"
        "include: _template.yaml\n"
        "test_split: test\n"
        "doc_to_text: !function utils.my_text\n"
        "doc_to_target: a\n"
        "metric_list:\n"
        "  - metric: exact_match\n"
        "    aggregation: mean\n"
        "    higher_is_better: true\n")
    cfg = load_task_yaml(tmp_path / "toy.yaml")
    assert cfg.generation_kwargs == {"max_new_tokens": 4}  # via include
    assert cfg.doc_to_text({"q": "hi", "a": "x"}) == "Q: hi"
    # bare-string doc_to_target resolves as a doc field
    from competesmoe_tpu.eval.task import _resolve
    assert _resolve(cfg.doc_to_target)({"a": "yes"}) == "yes"
    assert get_task_config("yaml_toy") is cfg


def test_fewshot_context():
    docs = [{"q": f"q{i}", "a": f"a{i}"} for i in range(6)]
    task = ConfigurableTask(TaskConfig(
        task="fs_toy", output_type="generate_until",
        doc_to_text=lambda d: d["q"],
        doc_to_target=lambda d: d["a"], docs=docs, num_fewshot=2))
    insts = task.build_all_requests()
    ctx = insts[0].arguments[0]
    assert ctx.endswith("q0")
    assert "q0 a0" not in ctx          # never its own answer
    assert ctx.count(" a") == 2        # two examples with answers
    # deterministic
    task2 = ConfigurableTask(TaskConfig(
        task="fs_toy", output_type="generate_until",
        doc_to_text=lambda d: d["q"],
        doc_to_target=lambda d: d["a"], docs=docs, num_fewshot=2))
    assert task2.build_all_requests()[0].arguments[0] == ctx


def test_video_task_end_to_end_synthetic_frames(jax_llava, tmp_path):
    """A video-family task runs end-to-end: doc_to_visual samples frames
    through the decord compat reader (images-from-frames), frames become
    the visual inputs, metrics aggregate (videomme-style flow,
    evaluate/lmms_eval/tasks/videomme/utils.py role)."""
    from competesmoe_tpu.eval.lmms_compat import ensure_lmms_compat
    ensure_lmms_compat()
    import decord

    vid = tmp_path / "clip"
    vid.mkdir()
    for i in range(4):
        Image.new("RGB", (28, 28), (60 * i, 0, 0)).save(vid / f"{i}.png")

    def doc_to_visual(doc):
        vr = decord.VideoReader(doc["video"], ctx=decord.cpu(0))
        n = len(vr)
        idx = np.linspace(0, n - 1, 2).astype(int).tolist()
        frames = vr.get_batch(idx).asnumpy()
        return [Image.fromarray(f) for f in frames]

    docs = [{"video": str(vid), "question": "what color", "answer": "red"}
            for _ in range(2)]
    register_task("toy_video", TaskConfig(
        task="toy_video", output_type="generate_until",
        doc_to_text=lambda d: d["question"],
        doc_to_visual=doc_to_visual,
        doc_to_target=lambda d: d["answer"],
        generation_kwargs={"max_new_tokens": 2},
        metric_list=[{"metric": "exact_match", "aggregation": "mean"}],
        docs=docs))
    results = simple_evaluate(jax_llava, ["toy_video"])
    assert "exact_match" in results["results"]["toy_video"]


def test_offline_judge_fallback_flagged(jax_llava):
    """GPT-judge process_results raising the offline stub error falls
    back to containment scoring WITH the offline_metric flag (VERDICT r2
    item 7: llava-in-the-wild has no offline judge)."""
    def judge_process_results(doc, resps):
        raise RuntimeError("openai is unavailable offline; this task's "
                           "GPT-judge scoring needs it")

    docs = [{"question": "what is this", "answer": "red",
             "img": Image.new("RGB", (30, 30), (255, 0, 0))}
            for _ in range(2)]
    register_task("toy_judge", TaskConfig(
        task="toy_judge", output_type="generate_until",
        doc_to_text=lambda d: d["question"],
        doc_to_visual=lambda d: [d["img"]],
        doc_to_target=lambda d: d["answer"],
        generation_kwargs={"max_new_tokens": 2},
        process_results=judge_process_results,
        metric_list=[{"metric": "gpt_eval", "aggregation": "mean"}],
        docs=docs))
    results = simple_evaluate(jax_llava, ["toy_judge"])
    r = results["results"]["toy_judge"]
    assert r.get("offline_metric") is True
    assert "offline_judge_containment" in r


def test_engine_backed_generate_until_matches_solo(jax_llava):
    """--engine-slots: generate_until through the continuous-batching
    engine returns exactly the solo path's responses (the engine's
    token-exactness carries to eval scores)."""
    from competesmoe_tpu.eval.instance import Instance

    img = Image.new("RGB", (30, 30), (0, 128, 255))
    def mk():
        return [Instance(request_type="generate_until",
                         arguments=(q, {"max_new_tokens": 4}, v),
                         idx=0, metadata=("eng", i, 1))
                for i, (q, v) in enumerate(
                    [("what color is this", [img]),
                     ("is this a cat", [img]),
                     ("yes red blue a cat what", []),
                     ("what color", [img]),
                     ("blue a", [])])]

    want = jax_llava.generate_until(mk())

    eng_lm = JaxLlava(jax_llava.model, jax_llava.params,
                      jax_llava.tokenizer, jax_llava.image_processor,
                      batch_size=2, max_new_tokens=3,
                      engine_slots=2, engine_max_len=96)
    try:
        got = eng_lm.generate_until(mk())
    finally:
        if eng_lm._engine is not None:
            eng_lm._engine.shutdown()
    assert got == want, f"{got} != {want}"

    # pipelined dispatch (--engine-pipeline 2) must not change a byte
    pipe_lm = JaxLlava(jax_llava.model, jax_llava.params,
                       jax_llava.tokenizer, jax_llava.image_processor,
                       batch_size=2, max_new_tokens=3,
                       engine_slots=2, engine_max_len=96,
                       engine_pipeline=2)
    try:
        got_pipe = pipe_lm.generate_until(mk())
    finally:
        if pipe_lm._engine is not None:
            pipe_lm._engine.shutdown()
    assert got_pipe == want, f"{got_pipe} != {want}"


def test_cross_rank_merge_equals_single_rank(jax_llava, tmp_path):
    """Two ranks with a shared merge_dir: rank 0's merged metrics equal
    a single-rank full run (the reference's accelerate-gather role)."""
    img_r = Image.new("RGB", (30, 30), (255, 0, 0))
    docs = [{"question": f"what color is this {i}", "answer": "red",
             "img": img_r} for i in range(5)]
    register_task("merge_vqa", TaskConfig(
        task="merge_vqa", output_type="generate_until",
        doc_to_text=lambda d: d["question"],
        doc_to_visual=lambda d: [d["img"]],
        doc_to_target=lambda d: d["answer"],
        generation_kwargs={"max_new_tokens": 3},
        metric_list=[{"metric": "exact_match", "aggregation": "mean"},
                     {"metric": "anls", "aggregation": "mean"}],
        docs=docs))

    full = simple_evaluate(jax_llava, ["merge_vqa"])

    md = tmp_path / "merge"
    r1 = simple_evaluate(jax_llava, ["merge_vqa"], rank=1, world_size=2,
                         merge_dir=md)
    assert r1.get("partial_rank") == 1
    r0 = simple_evaluate(jax_llava, ["merge_vqa"], rank=0, world_size=2,
                         merge_dir=md)
    assert r0.get("merged_ranks") == 2
    assert len(r0["samples"]["merge_vqa"]) == 5
    for metric in ("exact_match", "anls"):
        np.testing.assert_allclose(
            r0["results"]["merge_vqa"][metric],
            full["results"]["merge_vqa"][metric], rtol=1e-9)
