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
