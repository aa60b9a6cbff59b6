"""OpenAI-compatible API tests: /v1/models and /v1/chat/completions
(stream + non-stream + vision parts) over a real controller + worker
stack on localhost."""

import base64
import io
import json
import socket
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
from competesmoe_tpu.serve.openai_api import (
    _render_prompt,
    serve_openai_api,
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


def post_json(url, data, timeout=60):
    req = urlrequest.Request(url, data=json.dumps(data).encode(),
                             method="POST",
                             headers={"Content-Type": "application/json"})
    with urlrequest.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def stack():
    from competesmoe_tpu.models.llava import IMAGE_TOKEN_INDEX

    cfg = tiny_llava_cfg(moe=False)
    model = LlavaModel(cfg)
    tok = EvalTok()
    tok("hello world red cat what is this the and a")
    # init WITH an image so the vision tower + projector params exist
    # (text-only init leaves them out and image requests then fail —
    # which the API now correctly surfaces as a 502 instead of text)
    ids = np.array([[2, IMAGE_TOKEN_INDEX, 2, 2, 2, 2]], np.int32)
    px = np.zeros((1, 28, 28, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), ids, px)
    adapter = JaxLlava(model, params, tok, ImageProcessorConfig(size=28),
                       max_new_tokens=6)

    cport, wport, oport = free_port(), free_port(), free_port()
    caddr = f"http://127.0.0.1:{cport}"
    _, chttpd = serve_controller("127.0.0.1", cport, background=True)
    worker = ModelWorker(caddr, f"http://127.0.0.1:{wport}",
                         ["tiny-llava"], jax_llava_generate_fn(adapter),
                         register=True)
    whttpd = serve_worker(worker, "127.0.0.1", wport, background=True)
    ohttpd = serve_openai_api(caddr, "127.0.0.1", oport,
                              conv_template="phi35", background=True)
    yield f"http://127.0.0.1:{oport}"
    for h in (ohttpd, whttpd, chttpd):
        h.shutdown()


def test_render_prompt_roles_and_system():
    prompt, images, stop = _render_prompt("phi35", [
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
        {"role": "user", "content": "again"},
    ])
    assert "be brief" in prompt and "hi" in prompt and "again" in prompt
    assert prompt.rstrip().endswith("<|assistant|>")
    assert images == [] and stop


def test_render_prompt_vision_parts():
    b64 = base64.b64encode(b"xx").decode()
    prompt, images, _ = _render_prompt("phi35", [
        {"role": "user", "content": [
            {"type": "text", "text": "what is this"},
            {"type": "image_url",
             "image_url": {"url": f"data:image/png;base64,{b64}"}},
        ]},
    ])
    assert images == [b64]
    assert "<image>" in prompt


def test_models_endpoint(stack):
    with urlrequest.urlopen(stack + "/v1/models", timeout=30) as r:
        d = json.loads(r.read())
    assert d["object"] == "list"
    assert [m["id"] for m in d["data"]] == ["tiny-llava"]


def test_chat_completion_nonstream(stack):
    d = post_json(stack + "/v1/chat/completions", {
        "model": "tiny-llava",
        "messages": [{"role": "user", "content": "hello world"}],
        "max_tokens": 6, "temperature": 0.0})
    assert d["object"] == "chat.completion"
    assert d["choices"][0]["finish_reason"] == "stop"
    assert isinstance(d["choices"][0]["message"]["content"], str)
    assert d["usage"]["completion_tokens"] >= 1


def test_chat_completion_stream_matches_nonstream(stack):
    body = {"model": "tiny-llava",
            "messages": [{"role": "user", "content": "hello world"}],
            "max_tokens": 6, "temperature": 0.0}
    want = post_json(stack + "/v1/chat/completions", body)
    want_text = want["choices"][0]["message"]["content"]

    req = urlrequest.Request(
        stack + "/v1/chat/completions",
        data=json.dumps(dict(body, stream=True)).encode(),
        headers={"Content-Type": "application/json"})
    got, done, roles = "", False, 0
    with urlrequest.urlopen(req, timeout=60) as r:
        for line in r.read().decode().splitlines():
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                done = True
                break
            ch = json.loads(payload)
            assert ch["object"] == "chat.completion.chunk"
            delta = ch["choices"][0]["delta"]
            if delta.get("role"):
                roles += 1
            got += delta.get("content", "")
    assert done and roles == 1
    assert got == want_text


def test_chat_completion_vision_request(stack):
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 32), (120, 30, 200)).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    d = post_json(stack + "/v1/chat/completions", {
        "model": "tiny-llava",
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "what is this"},
            {"type": "image_url",
             "image_url": {"url": f"data:image/png;base64,{b64}"}},
        ]}],
        "max_tokens": 4, "temperature": 0.0})
    assert d["choices"][0]["message"]["content"] is not None


def test_render_prompt_image_in_later_turn():
    """An image attached to a later user message gets its <image> token
    in THAT message (not silently dropped)."""
    b64 = base64.b64encode(b"yy").decode()
    prompt, images, _ = _render_prompt("phi35", [
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
        {"role": "user", "content": [
            {"type": "text", "text": "and this?"},
            {"type": "image_url",
             "image_url": {"url": f"data:image/png;base64,{b64}"}},
        ]},
    ])
    assert images == [b64]
    # the <image> token lands after the assistant turn
    assert prompt.index("<image>") > prompt.index("hello")


def test_worker_error_surfaces_as_api_error(stack):
    """An unknown model produces the controller's 'No available worker'
    error — the API must return an error object, not a 200 completion
    with the error text as assistant content."""
    req = urlrequest.Request(
        stack + "/v1/chat/completions",
        data=json.dumps({
            "model": "no-such-model",
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4}).encode(),
        headers={"Content-Type": "application/json"})
    import urllib.error
    try:
        urlrequest.urlopen(req, timeout=30)
        assert False, "expected an HTTP error"
    except urllib.error.HTTPError as e:
        body = json.loads(e.read())
        assert "error" in body
        assert e.code == 502


def test_stop_list_reaches_worker(stack):
    """OpenAI stop arrays pass through whole (the worker cuts at the
    earliest hit) — a stop matching the first generated word truncates
    the reply."""
    base = {"model": "tiny-llava",
            "messages": [{"role": "user", "content": "hello world"}],
            "max_tokens": 6, "temperature": 0.0}
    full = post_json(stack + "/v1/chat/completions", base)
    text = full["choices"][0]["message"]["content"]
    words = text.split()
    if len(words) < 2:
        pytest.skip("tiny model reply too short to truncate")
    cut = post_json(stack + "/v1/chat/completions",
                    dict(base, stop=["zzz-never", words[1]]))
    cut_text = cut["choices"][0]["message"]["content"]
    assert words[1] not in cut_text
    assert len(cut_text) < len(text)


def test_engine_backed_worker_streams_through_api():
    """The whole composed stack: OpenAI API -> controller -> worker
    backed by the continuous-batching engine (spec + chunked prefill +
    prefix cache on) streams a greedy completion end to end."""
    from competesmoe_tpu.models.llava import IMAGE_TOKEN_INDEX
    from competesmoe_tpu.serve.engine import DecodeEngine
    from competesmoe_tpu.serve.model_worker import engine_generate_fn

    cfg = tiny_llava_cfg(moe=False)
    model = LlavaModel(cfg)
    tok = EvalTok()
    tok("hello world red cat what is this the and a")
    ids = np.array([[2, IMAGE_TOKEN_INDEX, 2, 2, 2, 2]], np.int32)
    px = np.zeros((1, 28, 28, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), ids, px)
    adapter = JaxLlava(model, params, tok, ImageProcessorConfig(size=28),
                       max_new_tokens=6)
    engine = DecodeEngine(model, params, n_slots=2, max_len=128,
                          spec_k=2, prefill_chunk=16,
                          prefix_cache_slots=1)

    cport, wport, oport = free_port(), free_port(), free_port()
    caddr = f"http://127.0.0.1:{cport}"
    _, chttpd = serve_controller("127.0.0.1", cport, background=True)
    worker = ModelWorker(caddr, f"http://127.0.0.1:{wport}",
                         ["tiny-engine"], engine_generate_fn(adapter,
                                                             engine),
                         register=True)
    whttpd = serve_worker(worker, "127.0.0.1", wport, background=True)
    ohttpd = serve_openai_api(caddr, "127.0.0.1", oport,
                              conv_template="phi35", background=True)
    try:
        body = {"model": "tiny-engine", "stream": True,
                "messages": [{"role": "user",
                              "content": "hello world hello world"}],
                "max_tokens": 6, "temperature": 0.0}
        req = urlrequest.Request(
            f"http://127.0.0.1:{oport}/v1/chat/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        got, done = "", False
        with urlrequest.urlopen(req, timeout=120) as r:
            for line in r.read().decode().splitlines():
                if not line.startswith("data: "):
                    continue
                payload = line[len("data: "):]
                if payload == "[DONE]":
                    done = True
                    break
                ch = json.loads(payload)
                got += ch["choices"][0]["delta"].get("content", "")
        assert done
        assert engine.error is None
        assert engine._tokens_emitted >= 1
    finally:
        engine.shutdown()
        for h in (ohttpd, whttpd, chttpd):
            h.shutdown()


def test_legacy_completions_endpoint(stack):
    """/v1/completions (raw prompt, no template): non-stream object
    shape and SSE text chunks reassemble to the same completion."""
    body = {"model": "tiny-llava", "prompt": "hello world hello",
            "max_tokens": 5, "temperature": 0.0}
    d = post_json(stack + "/v1/completions", body)
    assert d["object"] == "text_completion"
    assert d["id"].startswith("cmpl-")
    want = d["choices"][0]["text"]
    assert isinstance(want, str)

    req = urlrequest.Request(
        stack + "/v1/completions",
        data=json.dumps(dict(body, stream=True)).encode(),
        headers={"Content-Type": "application/json"})
    got, done = "", False
    with urlrequest.urlopen(req, timeout=60) as r:
        for line in r.read().decode().splitlines():
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                done = True
                break
            ch = json.loads(payload)
            assert ch["object"] == "text_completion"
            got += ch["choices"][0]["text"]
    assert done and got == want


def test_bad_route_and_bad_request(stack):
    try:
        urlrequest.urlopen(stack + "/v1/embeddings", data=b"{}",
                           timeout=10)
        raised = False
    except Exception:
        raised = True
    assert raised
