"""Lite shrinker tests (kCenter greedy coreset + embed cache + CLI)."""

import json

import numpy as np

from competesmoe_tpu.eval.lite import (
    embed_task,
    hashed_bow_embedder,
    kcenter_greedy,
    main,
    shrink_task,
)
from competesmoe_tpu.eval.task import TaskConfig, register_task


def test_kcenter_greedy_picks_spread_points():
    # two tight clusters + one outlier: k=3 must cover all three
    rng = np.random.RandomState(0)
    a = rng.randn(10, 4) * 0.01
    b = rng.randn(10, 4) * 0.01 + 10.0
    c = np.full((1, 4), -50.0)
    X = np.concatenate([a, b, c])
    idx = kcenter_greedy(X, 3)
    assert idx[0] == 0  # deterministic start (kcenter_greedy.py:66)
    groups = {i // 10 if i < 20 else 2 for i in idx}
    assert groups == {0, 1, 2}
    assert len(set(idx.tolist())) == 3


def test_kcenter_greedy_edge_cases():
    X = np.eye(4)
    assert kcenter_greedy(X, 0).size == 0
    assert kcenter_greedy(X, 10).size == 4  # clamped to N
    # [N, 1, D] cache layout accepted
    assert kcenter_greedy(X[:, None, :], 2).size == 2


def test_hashed_bow_embedder_deterministic():
    from PIL import Image
    emb = hashed_bow_embedder()
    d1 = {"q": "what color is the cat",
          "img": Image.new("RGB", (8, 8), (200, 0, 0))}
    v1, v2 = emb(d1), emb(d1)
    np.testing.assert_array_equal(v1, v2)
    d2 = {"q": "entirely different words here"}
    assert np.linalg.norm(emb(d2) - v1) > 0.1


def test_embed_cache_roundtrip(tmp_path):
    docs = [{"q": f"question {i}"} for i in range(5)]
    X1 = embed_task(docs, cache_path=str(tmp_path), task_name="t")
    assert (tmp_path / "t_embed.npy").exists()
    # cache hit: same result even with different docs passed
    X2 = embed_task([{"q": "other"}], cache_path=str(tmp_path),
                    task_name="t")
    np.testing.assert_array_equal(X1, X2)


def test_shrink_task_fraction_and_cli(tmp_path):
    docs = [{"q": f"word{i} " * (i + 1)} for i in range(20)]
    register_task("lite_toy", TaskConfig(
        task="lite_toy", output_type="generate_until",
        doc_to_text=lambda d: d["q"], doc_to_visual=lambda d: [],
        doc_to_target=lambda d: "", docs=docs))
    idx = shrink_task("lite_toy", 0.25, output_path=str(tmp_path))
    assert len(idx) == 5
    rec = json.loads((tmp_path / "lite_toy_lite.json").read_text())
    assert rec["indices"] == idx

    main(["--tasks", "lite_toy", "--num_items", "4",
          "--output_path", str(tmp_path)])
    rec = json.loads((tmp_path / "lite_toy_lite.json").read_text())
    assert rec["n"] == 4
