"""Training-framework tests: data pipeline, samplers, checkpointing,
dotted argparser, end-to-end task loop with resume."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from competesmoe_tpu.data.lm_data import (
    InfiniteRandomSampler,
    SequentialMultibatchSampler,
    SyntheticLMDataset,
    TokenChunkDataset,
)
from competesmoe_tpu.train.checkpoint import Saver
from competesmoe_tpu.utils.argparser import ArgumentParser

pytestmark = pytest.mark.slow



def test_token_chunk_dataset(tmp_path):
    a = np.arange(100, dtype=np.uint16)
    b = np.arange(1000, 1050, dtype=np.uint16)
    pa, pb = tmp_path / "a.bin", tmp_path / "b.bin"
    a.tofile(pa)
    b.tofile(pb)
    ds = TokenChunkDataset([pa, pb], unroll_len=9)  # window 10
    assert len(ds) == 10 + 5
    np.testing.assert_array_equal(ds[0], np.arange(10))
    np.testing.assert_array_equal(ds[10], np.arange(1000, 1010))
    with pytest.raises(IndexError):
        ds[15]


def test_sequential_sampler_resumable():
    s = SequentialMultibatchSampler(n_items=100, batch_size=4)
    batches = [next(s) for _ in range(3)]
    state = s.state_dict()
    nxt = next(s)
    s2 = SequentialMultibatchSampler(n_items=100, batch_size=4)
    s2.load_state_dict(state)
    np.testing.assert_array_equal(next(s2), nxt)
    # lanes are disjoint stripes
    np.testing.assert_array_equal(batches[0], [0, 25, 50, 75])


def test_infinite_sampler_deterministic():
    s1 = InfiniteRandomSampler(n_items=50, batch_size=4, seed=7)
    s2 = InfiniteRandomSampler(n_items=50, batch_size=4, seed=7)
    for _ in range(3):
        np.testing.assert_array_equal(next(s1), next(s2))


def test_tokenize_roundtrip(tmp_path):
    pytest.importorskip("tokenizers")
    from competesmoe_tpu.data.lm_data import (
        open_chunk_dir,
        tokenize_to_chunks,
        train_tokenizer,
    )
    docs = ["the quick brown fox jumps over the lazy dog"] * 50
    tok = train_tokenizer(iter(docs), vocab_size=300,
                          save_path=tmp_path / "tok.json")
    tokenize_to_chunks(iter(docs), tok, tmp_path / "train")
    ds = open_chunk_dir(tmp_path / "train", unroll_len=7)
    assert len(ds) > 0
    w = ds[0]
    assert w.shape == (8,) and w.dtype == np.int32


def test_saver_roundtrip(tmp_path):
    s = Saver(tmp_path, save_interval=10, keep_last=2)
    state = {"w": jnp.arange(4.0), "nested": {"b": jnp.ones((2, 2))}}
    sampler = SequentialMultibatchSampler(n_items=10, batch_size=2, pos=5)
    s["state"] = state
    s["sampler"] = sampler
    s["args"] = {"lr": 0.1, "name": "x"}
    assert s.tick(7) is None
    assert s.tick(10) is not None
    # mutate, then restore
    s["state"] = {"w": jnp.zeros(4), "nested": {"b": jnp.zeros((2, 2))}}
    sampler.pos = 99
    s["args"] = {}
    restored = s.restore()
    assert restored == 10
    np.testing.assert_array_equal(np.asarray(s["state"]["w"]),
                                  [0, 1, 2, 3])
    assert sampler.pos == 5
    assert s["args"]["lr"] == 0.1


def test_saver_retention(tmp_path):
    s = Saver(tmp_path, save_interval=1, keep_last=2)
    s["x"] = {"a": jnp.ones(2)}
    for i in (1, 2, 3, 4):
        s.save(i)
    assert s.saved_steps() == [3, 4]


def test_argparser_dotted():
    p = ArgumentParser()
    p.add_argument("-lm.unroll", default=1024)
    p.add_argument("-moe.n_experts", default=64)
    p.add_argument("-hybrid", default=False)
    p.add_argument("-transformer.head_projection_size", default="none",
                   parser=p.int_or_none_parser)
    a = p.parse(["-lm.unroll", "128", "-hybrid", "1"])
    assert a.lm.unroll == 128 and a.moe.n_experts == 64
    assert a.hybrid is True
    assert a.transformer.head_projection_size is None
    # round-trip
    d = ArgumentParser.namespace_to_dict(a)
    a2 = p.from_dict(d)
    assert a2.lm.unroll == 128
    with pytest.raises(ValueError):
        p.parse(["-nope", "1"])


def test_lm_task_end_to_end_with_resume(tmp_path):
    from competesmoe_tpu.cli.main import main
    base = ["-task", "synthetic_transformer", "-name", "t", "-run_dir",
            str(tmp_path), "-batch_size", "8", "-lm.unroll", "16",
            "-lm.vocab_size", "64", "-state_size", "32",
            "-transformer.encoder_n_layers", "2",
            "-transformer.n_heads", "2", "-moe.n_experts", "4",
            "-moe.expert_size", "8", "-pkm.n_heads", "2",
            "-rate_flip", "0.5", "-warm_up", "0.0", "-save_interval", "5",
            "-valid_interval", "0", "-log_interval", "100",
            "-n_expert_shards", "2", "-amp", "0"]
    main(base + ["-stop_after", "6"])
    log = (tmp_path / "t" / "log_trainer.jsonl").read_text().strip()
    recs = [json.loads(l) for l in log.splitlines()]
    assert any("loss/total" in r for r in recs)
    # resume continues from step 6
    main(base + ["-stop_after", "8"])
    main(base + ["-stop_after", "8", "-test_only", "1"])
