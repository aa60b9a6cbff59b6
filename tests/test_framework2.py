"""Tests for the second framework batch: zero-shot eval battery, bucketed
sampling, var-length collate, sweep launcher, distributed env detect."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from competesmoe_tpu.data.lm_data import BucketedSampler, var_length_collate
from competesmoe_tpu.eval.lm_zeroshot import (
    ChoiceDoc,
    LMZeroShotEvaluator,
    binary_sentence_docs,
    completion_docs,
    lambada_accuracy,
)
from competesmoe_tpu.models.lm import LMConfig, MoELanguageModel
from competesmoe_tpu.moe import MoEArgs
from competesmoe_tpu.parallel.distributed import detect_env


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = LMConfig(vocab_size=64, d_model=32, n_layers=2, n_heads=2,
                   n_experts=4, expert_size=8, moe_topk=2, moe_name="smoe",
                   moe_args=MoEArgs())
    model = MoELanguageModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return model, params


def test_zeroshot_choice_eval(tiny_lm):
    model, params = tiny_lm
    ev = LMZeroShotEvaluator(model, params, pad_quantum=16, max_len=64)
    docs = [ChoiceDoc(prefix_ids=[1, 2, 3], choices_ids=[[4, 5], [6]],
                      answer=0),
            ChoiceDoc(prefix_ids=[7], choices_ids=[[8], [9, 10]],
                      answer=1, normalize_by_length=True)]
    res = ev.evaluate(docs)
    assert res["n_docs"] == 2
    assert 0.0 <= res["accuracy"] <= 1.0
    # pad_quantum bucketing: both docs' sequences are <=16 -> 1 jitted fn
    assert list(ev._fns) == [16]


def test_zeroshot_scores_are_real_loglikelihoods(tiny_lm):
    model, params = tiny_lm
    ev = LMZeroShotEvaluator(model, params, pad_quantum=16)
    (total, mean, greedy), = ev.score_sequences([([1, 2], [3, 4, 5])])
    # oracle: full forward
    toks = jnp.asarray([[1, 2, 3, 4, 5] + [0] * 11], jnp.int32)
    logits, _ = model.apply(params, toks[:, :-1], train=False)
    lp = jax.nn.log_softmax(np.asarray(logits, np.float32), -1)
    want = lp[0, 1, 3] + lp[0, 2, 4] + lp[0, 3, 5]
    np.testing.assert_allclose(total, float(want), rtol=1e-4)
    np.testing.assert_allclose(mean, float(want) / 3, rtol=1e-4)


def test_zeroshot_doc_builders(tiny_lm):
    model, params = tiny_lm
    ev = LMZeroShotEvaluator(model, params, pad_quantum=16)
    bl = binary_sentence_docs([([1, 2, 3], [1, 2, 9])])
    assert bl[0].answer == 0
    cd = completion_docs([([1], [[2], [3]], 1)])
    assert cd[0].normalize_by_length
    res = lambada_accuracy(ev, [([1, 2, 3], [4])])
    assert 0.0 <= res["accuracy"] <= 1.0


def test_bucketed_sampler():
    lengths = list(np.random.default_rng(0).integers(5, 100, 64))
    s = BucketedSampler(lengths, batch_size=8, bucket_size_mult=2)
    batches = list(iter(s))
    assert all(len(b) == 8 for b in batches)
    # within-batch length spread must be far below global spread
    spreads = [max(lengths[i] for i in b) - min(lengths[i] for i in b)
               for b in batches]
    assert np.mean(spreads) < (max(lengths) - min(lengths)) / 2
    # resumable epoch counter
    st = s.state_dict()
    s2 = BucketedSampler(lengths, batch_size=8, bucket_size_mult=2)
    s2.load_state_dict(st)
    np.testing.assert_array_equal(next(iter(s2)), next(iter(s)))


def test_var_length_collate():
    samples = [{"input_ids": np.asarray([1, 2, 3]),
                "labels": np.asarray([1, 2, 3])},
               {"input_ids": np.asarray([4]),
                "labels": np.asarray([4])}]
    out = var_length_collate(samples)
    assert out["input_ids"].shape == (2, 3)
    assert out["input_ids"][1, 1] == 0
    assert out["labels"][1, 1] == -100
    np.testing.assert_array_equal(out["input_ids_len"], [3, 1])


def test_sweep_parser(tmp_path):
    from competesmoe_tpu.cli.run_sweep import parse_sweep, to_argv
    y = tmp_path / "sweep.yaml"
    y.write_text("""
parameters:
  moe_name:
    value: competesmoe
  lr:
    values: [1e-4, 2e-4]
  state_size:
    value: 128
""")
    runs = parse_sweep(str(y))
    assert len(runs) == 2
    assert all(r["moe_name"] == "competesmoe" for r in runs)
    argv = to_argv(runs[0])
    assert "-moe_name" in argv and "competesmoe" in argv


def test_distributed_env_detect(monkeypatch):
    monkeypatch.delenv("SLURM_PROCID", raising=False)
    monkeypatch.delenv("RANK", raising=False)
    e = detect_env()
    assert e.world_size == 1 and e.is_master
    monkeypatch.setenv("RANK", "2")
    monkeypatch.setenv("WORLD_SIZE", "4")
    e = detect_env()
    assert e.rank == 2 and e.world_size == 4 and not e.is_master
    monkeypatch.setenv("SLURM_PROCID", "1")
    monkeypatch.setenv("SLURM_NTASKS", "8")
    monkeypatch.setenv("SLURM_RESTART_COUNT", "2")
    e = detect_env()
    assert e.is_slurm and e.world_size == 8 and e.is_preemptible
    assert e.restart_count == 2


def test_lm_xl_state_carry(tiny_lm):
    """n_prev_states>0: second block attends to the carried first block."""
    cfg = LMConfig(vocab_size=64, d_model=32, n_layers=2, n_heads=2,
                   n_experts=4, expert_size=8, moe_topk=2, moe_name="smoe",
                   moe_args=MoEArgs(), n_prev_states=1)
    model = MoELanguageModel(cfg)
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 8)),
                       jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)
    logits1, aux1 = model.apply(params, toks, train=False)
    state = aux1["state"]
    assert len(state) == 2 and state[0].shape == (2, 8, 32)
    logits2, aux2 = model.apply(params, toks, train=False, state=state)
    # with context the predictions must differ from the stateless pass
    assert not np.allclose(np.asarray(logits1), np.asarray(logits2))


def test_plot_types(tmp_path):
    """visualize/plot.py plot zoo: JSON record always written; TB images
    when tensorboardX is present."""
    import numpy as np
    from competesmoe_tpu.train.logger import MetricLogger
    from competesmoe_tpu.train.plots import (
        ConfusionMatrix, Heatmap, Histogram, TextPlot, XYChart, log_plots)

    logger = MetricLogger(tmp_path, use_tensorboard=True)
    plots = {
        "hist": Histogram(values=np.random.default_rng(0).normal(size=100)),
        "heat": Heatmap(map=np.arange(12).reshape(3, 4), xlabel="expert",
                        ylabel="layer"),
        "xy": XYChart(curves={"loss": [3.0, 2.0, 1.5]}, xlabel="step"),
        "cm": ConfusionMatrix(matrix=np.eye(3), class_names=list("abc")),
        "txt": TextPlot(text="hello"),
    }
    log_plots(logger, 7, plots)
    logger.close()
    import json as _json
    recs = [_json.loads(l) for l in
            (tmp_path / "log_trainer.jsonl").read_text().splitlines()]
    plot_rec = [r for r in recs if "plots" in r][0]
    assert plot_rec["step"] == 7
    assert plot_rec["plots"]["heat"]["type"] == "heatmap"
    assert len(plot_rec["plots"]["hist"]["hist"]) == 64
    assert plot_rec["plots"]["cm"]["matrix"][0][0] == 1.0
