"""Serving-layer tests: controller registry/dispatch + worker streaming
over real localhost HTTP, and the CLI chat loop."""

import io
import json
import socket
import time
from urllib import request as urlrequest

import numpy as np
import pytest

import jax

from competesmoe_tpu.eval import JaxLlava
from competesmoe_tpu.models.llava import LlavaModel
from competesmoe_tpu.multimodal.mm_utils import ImageProcessorConfig
from competesmoe_tpu.serve.controller import serve_controller
from competesmoe_tpu.serve.model_worker import (
    ModelWorker,
    jax_llava_generate_fn,
    serve_worker,
)
from tests.test_eval_harness import EvalTok
from tests.test_llava import tiny_llava_cfg

pytestmark = pytest.mark.slow



def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def post(url, data, timeout=10):
    req = urlrequest.Request(url, data=json.dumps(data).encode(),
                             method="POST",
                             headers={"Content-Type": "application/json"})
    with urlrequest.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def adapter():
    cfg = tiny_llava_cfg(moe=False)
    model = LlavaModel(cfg)
    tok = EvalTok()
    tok("hello world red cat what is this")
    ids = np.full((1, 6), 2, np.int32)
    params = model.init(jax.random.PRNGKey(0), ids, None)
    return JaxLlava(model, params, tok, ImageProcessorConfig(size=28),
                    max_new_tokens=3)


def test_controller_and_worker_http(adapter):
    cport, wport = free_port(), free_port()
    controller, chttpd = serve_controller("127.0.0.1", cport,
                                          background=True)
    caddr = f"http://127.0.0.1:{cport}"
    waddr = f"http://127.0.0.1:{wport}"

    worker = ModelWorker(caddr, waddr, ["tiny-llava"],
                         jax_llava_generate_fn(adapter), register=False)
    whttpd = serve_worker(worker, "127.0.0.1", wport, background=True)
    try:
        # register via HTTP
        r = post(caddr + "/register_worker", {
            "worker_name": waddr, "check_heart_beat": True,
            "worker_status": worker.get_status()})
        assert r["success"]
        models = post(caddr + "/list_models", {})["models"]
        assert models == ["tiny-llava"]
        addr = post(caddr + "/get_worker_address",
                    {"model": "tiny-llava"})["address"]
        assert addr == waddr
        # heartbeat
        r = post(caddr + "/receive_heart_beat",
                 {"worker_name": waddr, "queue_length": 3})
        assert r["exist"]
        # streaming generate through the controller proxy
        req = urlrequest.Request(
            caddr + "/worker_generate_stream",
            data=json.dumps({"model": "tiny-llava", "prompt": "hello",
                             "max_new_tokens": 2}).encode(),
            method="POST",
            headers={"Content-Type": "application/json"})
        chunks = []
        with urlrequest.urlopen(req, timeout=60) as resp:
            buf = resp.read()
        for part in buf.split(b"\0"):
            if part:
                chunks.append(json.loads(part))
        assert chunks, "no streamed chunks"
        assert all(c["error_code"] == 0 for c in chunks)
        # missing model -> error chunk
        req2 = urlrequest.Request(
            caddr + "/worker_generate_stream",
            data=json.dumps({"model": "nope", "prompt": "x"}).encode(),
            method="POST", headers={"Content-Type": "application/json"})
        with urlrequest.urlopen(req2, timeout=10) as resp:
            err = json.loads(resp.read().split(b"\0")[0])
        assert err["error_code"] == 2
    finally:
        chttpd.shutdown()
        whttpd.shutdown()


def test_cli_chat_loop(adapter):
    from competesmoe_tpu.serve.cli import chat_loop
    inp = io.StringIO("hello world\nexit\n")
    out = io.StringIO()
    conv = chat_loop(adapter, image_path=None, max_new_tokens=2,
                     in_stream=inp, out_stream=out)
    text = out.getvalue()
    assert "USER:" in text and "ASSISTANT:" in text
    assert conv.messages[-1][1] is not None


def test_web_chat_page(adapter):
    """Browser chat server: page loads, /chat round-trips through the
    controller proxy to a live worker."""
    import json as _json
    from urllib import request as _ur

    from competesmoe_tpu.serve.web import serve_web

    cport, wport, webport = free_port(), free_port(), free_port()
    controller, chttpd = serve_controller("127.0.0.1", cport,
                                          background=True)
    caddr = f"http://127.0.0.1:{cport}"
    worker = ModelWorker(caddr, f"http://127.0.0.1:{wport}",
                         ["tiny-llava"], jax_llava_generate_fn(adapter),
                         register=False)
    whttpd = serve_worker(worker, "127.0.0.1", wport, background=True)
    post(caddr + "/register_worker", {
        "worker_name": f"http://127.0.0.1:{wport}",
        "check_heart_beat": True, "worker_status": worker.get_status()})
    webhttpd = serve_web(caddr, "tiny-llava", "127.0.0.1", webport,
                         background=True)
    try:
        with _ur.urlopen(f"http://127.0.0.1:{webport}/", timeout=10) as r:
            page = r.read().decode()
        assert "CompeteSMoE chat" in page
        req = _ur.Request(
            f"http://127.0.0.1:{webport}/chat",
            data=_json.dumps({"messages": [["USER", "hello"]],
                              "images": []}).encode(),
            method="POST",
            headers={"Content-Type": "application/json"})
        with _ur.urlopen(req, timeout=60) as r:
            resp = _json.loads(r.read())
        assert "text" in resp
        # streaming variant: ndjson lines of cumulative text, final
        # line must equal the non-stream reply for the same prompt
        req_s = _ur.Request(
            f"http://127.0.0.1:{webport}/chat_stream",
            data=_json.dumps({"messages": [["USER", "hello"]],
                              "images": []}).encode(),
            method="POST",
            headers={"Content-Type": "application/json"})
        with _ur.urlopen(req_s, timeout=60) as r:
            lines = [_json.loads(x) for x in
                     r.read().decode().splitlines() if x.strip()]
        assert lines and all("text" in x for x in lines)
        assert lines[-1]["text"] == resp["text"]
    finally:
        chttpd.shutdown()
        whttpd.shutdown()
        webhttpd.shutdown()


def test_web_votes_and_models(adapter, tmp_path):
    """Vote logging (gradio_web_server vote_last_response semantics) and
    the /models selector endpoint."""
    import json as _json
    import urllib.request as _ur

    from competesmoe_tpu.serve.web import serve_web

    cport, wport, webport = free_port(), free_port(), free_port()
    controller, chttpd = serve_controller("127.0.0.1", cport,
                                          background=True)
    caddr = f"http://127.0.0.1:{cport}"
    worker = ModelWorker(caddr, f"http://127.0.0.1:{wport}",
                         ["tiny-llava"], jax_llava_generate_fn(adapter),
                         register=False)
    whttpd = serve_worker(worker, "127.0.0.1", wport, background=True)
    post(caddr + "/register_worker", {
        "worker_name": f"http://127.0.0.1:{wport}",
        "check_heart_beat": True, "worker_status": worker.get_status()})
    webhttpd = serve_web(caddr, "tiny-llava", "127.0.0.1", webport,
                         background=True, log_dir=str(tmp_path))
    try:
        with _ur.urlopen(f"http://127.0.0.1:{webport}/models",
                         timeout=10) as r:
            models = _json.loads(r.read())["models"]
        assert "tiny-llava" in models
        req = _ur.Request(
            f"http://127.0.0.1:{webport}/vote",
            data=_json.dumps({"type": "downvote", "model": "tiny-llava",
                              "messages": [["USER", "hi"],
                                           ["ASSISTANT", "yo"]]}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with _ur.urlopen(req, timeout=10) as r:
            assert _json.loads(r.read())["ok"]
        logs = list(tmp_path.glob("*-conv.json"))
        assert len(logs) == 1
        rec = _json.loads(logs[0].read_text().splitlines()[0])
        assert rec["type"] == "downvote"
        assert rec["state"]["messages"][0] == ["USER", "hi"]
        assert "tstamp" in rec and "ip" in rec
    finally:
        webhttpd.shutdown()
        whttpd.shutdown()
        chttpd.shutdown()


def test_worker_cli_builds_quantized_worker(tmp_path, monkeypatch):
    """The worker launch CLI loads a checkpoint (incl. quant flags) and
    wires the generate fn; serve_worker is stubbed to capture the built
    worker instead of blocking."""
    from tests.test_builder import make_fake_checkpoint
    from tests.test_cli_mm import tok_dir  # noqa: F401 (fixture)
    from competesmoe_tpu.serve import model_worker as mw

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    make_fake_checkpoint(ckpt)

    # local tokenizer (reuse the builder test corpus recipe)
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.train_from_iterator(["what is this a cat <|end|>"] * 10,
                            trainers.BpeTrainer(
                                vocab_size=40,
                                special_tokens=["<pad>", "<s>", "</s>"]))
    from transformers import PreTrainedTokenizerFast
    PreTrainedTokenizerFast(tokenizer_object=tok, pad_token="<pad>",
                            bos_token="<s>", eos_token="</s>"
                            ).save_pretrained(str(tmp_path / "tok"))

    captured = {}
    monkeypatch.setattr(mw, "serve_worker",
                        lambda w, h, p: captured.update(worker=w,
                                                        host=h, port=p))
    mw.main(["--model-path", str(ckpt),
             "--tokenizer", str(tmp_path / "tok"),
             "--no-register", "--load-8bit", "--kv-quant", "int8",
             "--model-name", "toy-5b", "--port", "21099"])
    w = captured["worker"]
    assert w.model_names == ["toy-5b"]
    assert captured["port"] == 21099
    # quant flags reached the model config
    st = w.get_status()
    assert st["model_names"] == ["toy-5b"]


def test_stream_generate_yields_before_completion(adapter, monkeypatch):
    """First chunk arrives straight from prefill — before ANY decode step
    has run (the TTFT = prefill-time property of true streaming; the
    round-2 worker generated everything first and replayed it)."""
    import competesmoe_tpu.models.llava as L

    calls = {"decode": 0, "scan": 0}
    orig_fns = L.make_generate_fns
    orig_scan = L.make_scan_decode

    def wrapped_fns(model, cfg, max_len):
        prefill, decode_step = orig_fns(model, cfg, max_len)

        def counting_decode(params, token, cache):
            calls["decode"] += 1
            return decode_step(params, token, cache)
        return prefill, counting_decode

    def wrapped_scan(model, n, temperature=0.0, top_p=1.0):
        fn = orig_scan(model, n, temperature, top_p)

        def counting(params, tok, cache, rng):
            calls["scan"] += n
            return fn(params, tok, cache, rng)
        return counting

    monkeypatch.setattr(L, "make_generate_fns", wrapped_fns)
    monkeypatch.setattr(L, "make_scan_decode", wrapped_scan)

    ids = np.full((1, 5), 2, np.int32)
    gen = L.stream_generate(adapter.model, adapter.params, ids, None,
                            max_new_tokens=6)
    first = next(gen)
    assert first.shape == (1, 1)
    assert calls["decode"] == 0 and calls["scan"] == 0, \
        "first chunk must not wait for any decode step"
    rest = list(gen)
    total = 1 + sum(c.shape[1] for c in rest)
    assert total == 6
    # warmup chunk schedule: per-step latency early, scan chunks later
    assert rest[0].shape[1] == 1
    assert calls["decode"] + calls["scan"] == 5


def test_stream_generate_cancellation(adapter, monkeypatch):
    """Abandoning the generator between chunks cancels remaining decode
    steps (the client-disconnect path of the worker handler)."""
    import competesmoe_tpu.models.llava as L

    calls = {"n": 0}
    orig_scan = L.make_scan_decode

    def wrapped_scan(model, n, temperature=0.0, top_p=1.0):
        fn = orig_scan(model, n, temperature, top_p)

        def counting(params, tok, cache, rng):
            calls["n"] += 1
            return fn(params, tok, cache, rng)
        return counting

    monkeypatch.setattr(L, "make_scan_decode", wrapped_scan)
    ids = np.full((1, 5), 2, np.int32)
    gen = L.stream_generate(adapter.model, adapter.params, ids, None,
                            max_new_tokens=32)
    next(gen)
    gen.close()
    assert calls["n"] <= 1, "close() must stop the decode loop"


def test_worker_stream_matches_batch_generate(adapter):
    """Streamed text == one-shot generate text, and the stream is
    incremental (multiple monotonically-growing partials)."""
    from competesmoe_tpu.models.llava import generate

    fn = jax_llava_generate_fn(adapter)
    texts = list(fn({"prompt": "hello world", "max_new_tokens": 6}))
    assert len(texts) >= 3, "expected incremental partial texts"
    for a, b in zip(texts, texts[1:]):
        assert b.startswith(a[:len(a)])

    ids = np.asarray(
        [adapter.tokenizer_ids_for_prompt("hello world", False)], np.int32)
    toks, _ = generate(adapter.model, adapter.params, ids, None,
                       max_new_tokens=6,
                       stop_token_ids=adapter.stop_token_ids)
    ref = adapter.tokenizer.decode(list(toks[0]),
                                   skip_special_tokens=True)
    assert texts[-1] == ref.split("<|end|>")[0]


def test_worker_tp_sharded_stream_token_exact(adapter):
    """--mesh DxM serving: decoder sharded Megatron-style over the model
    axis streams byte-identical text vs the unsharded worker (the
    reference's sharded-inference role, evaluate models/llava.py:161-169,
    as true tensor parallelism)."""
    from jax.sharding import PartitionSpec as P

    from competesmoe_tpu.serve.model_worker import shard_llava_params

    sharded = shard_llava_params(adapter.params, "2x4")
    # decoder matmuls genuinely sharded over the model axis
    inner = sharded["params"] if "params" in sharded else sharded
    qkv = inner["language_model"]["layers_0"]["self_attn"]["qkv_proj"][
        "kernel"]
    assert qkv.sharding.spec == P(None, "model")

    a2 = JaxLlava(adapter.model, sharded, adapter.tokenizer,
                  ImageProcessorConfig(size=28), max_new_tokens=3)
    req = {"prompt": "hello world", "max_new_tokens": 6}
    t_ref = list(jax_llava_generate_fn(adapter)(dict(req)))
    t_tp = list(jax_llava_generate_fn(a2)(dict(req)))
    assert t_tp == t_ref


def test_worker_generate_fn_stop_string(adapter):
    """The reference worker truncates generated text at params['stop']
    (model_worker.py generate_stream); both generate_fns must honor it."""
    fn = jax_llava_generate_fn(adapter)
    base = {"prompt": "hello world", "max_new_tokens": 3}
    full = ""
    for full in fn(dict(base)):
        pass
    words = full.split()
    if not words:
        pytest.skip("tiny model produced empty text")
    stop = words[-1]
    got = ""
    for got in fn(dict(base, stop=stop)):
        pass
    assert stop not in got
    assert got == full.split(stop)[0]
