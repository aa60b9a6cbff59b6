"""Offline LiveBench dataset generator (eval/live_bench.py; reference
evaluate/tools/live_bench — the snapshot ships only the orchestrator and
every stage needs live web/APIs, so this rebuild keeps the pipeline
shape + schema behind registries with offline defaults)."""

import json

import numpy as np
import pytest
from PIL import Image

from competesmoe_tpu.eval.live_bench import (
    COLUMNS,
    GENERATORS,
    LiveBench,
    QAData,
    load_websites,
    load_websites_from_file,
    register_generator,
)


@pytest.fixture()
def shots(tmp_path):
    d = tmp_path / "shots"
    d.mkdir()
    Image.new("RGB", (64, 32), (220, 30, 30)).save(d / "a.png")
    Image.new("RGB", (32, 64), (20, 20, 200)).save(d / "b.png")
    Image.new("RGB", (48, 48), (10, 60, 10)).save(d / "c.jpg")
    return d


def test_generate_save_and_schema(shots, tmp_path):
    sites = load_websites_from_file(shots)
    assert len(sites) == 3
    bench = LiveBench(name="testset")
    logs = bench.capture(sites)
    assert all(l["success"] for l in logs)
    assert len(bench.rows) == 9  # 3 template questions per screenshot
    assert all(set(r) == set(COLUMNS) for r in bench.rows)
    # answers derive from the pixels
    by_site = {r["website"]: r for r in bench.rows
               if "dominant" in r["question"]}
    assert by_site[str(shots / "a.png")]["answer"] == "red"
    assert by_site[str(shots / "b.png")]["answer"] == "blue"
    assert by_site[str(shots / "c.jpg")]["answer"] == "green"
    # offline scoring is flagged, not disguised
    assert all(r["scorer_name"] == "constant(offline)"
               for r in bench.rows)

    path = bench.save(tmp_path / "out")
    data = json.loads(path.read_text())
    assert len(data["rows"]) == 9
    assert (tmp_path / "out" / "images" / "00000_0.png").exists()


def test_generated_dataset_runs_through_eval(shots):
    """Beyond the reference: the generated dataset is directly evaluable
    by the harness (register_as_task -> simple_evaluate)."""
    import jax

    from competesmoe_tpu.eval import JaxLlava, simple_evaluate
    from competesmoe_tpu.models.llava import LlavaModel
    from competesmoe_tpu.multimodal.mm_utils import ImageProcessorConfig
    from tests.test_eval_harness import EvalTok
    from tests.test_llava import tiny_llava_cfg

    bench = LiveBench(name="evalset")
    bench.capture(load_websites_from_file(shots))
    bench.register_as_task("live_bench_evalset", max_new_tokens=2)

    cfg = tiny_llava_cfg(moe=False)
    model = LlavaModel(cfg)
    tok = EvalTok()
    tok("red green blue landscape portrait square light dark")
    ids = np.full((1, 6), 2, np.int32)
    px = np.zeros((1, 28, 28, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), ids, px)["params"]
    lm = JaxLlava(model, params, tok, ImageProcessorConfig(size=28),
                  batch_size=3, max_new_tokens=2)
    res = simple_evaluate(lm, ["live_bench_evalset"])
    assert len(res["samples"]["live_bench_evalset"]) == 9
    assert "exact_match" in res["results"]["live_bench_evalset"]


def test_online_stages_fail_loudly(shots):
    with pytest.raises(RuntimeError, match="air-gapped"):
        load_websites()
    bench = LiveBench()
    logs = bench.capture(load_websites_from_file(shots),
                         qa_generator="gpt4v")
    assert all(not l["success"] for l in logs)
    assert all("API" in l["error"] or "key" in l["error"]
               for l in logs)


def test_custom_generator_plugs_in(shots):
    @register_generator("fixed")
    def fixed(screen, **_k):
        return [QAData("what site is this", "example dot com")]

    try:
        bench = LiveBench()
        bench.capture(load_websites_from_file(shots),
                      qa_generator="fixed")
        assert len(bench.rows) == 3
        assert bench.rows[0]["answer"] == "example dot com"
    finally:
        GENERATORS.pop("fixed", None)
