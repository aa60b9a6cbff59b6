"""Browser chat UI.

Re-design of `moe_model/serve/gradio_web_server.py` on the stdlib (gradio
is not in the image): a single-page chat app (fetch-streamed responses,
image upload as base64) served next to a JSON endpoint that proxies to the
controller's `/worker_generate_stream`.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib import request as urlrequest

PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>CompeteSMoE chat</title>
<style>
 body { font-family: sans-serif; max-width: 760px; margin: 2em auto; }
 #log { border: 1px solid #ccc; padding: 1em; min-height: 300px;
        white-space: pre-wrap; }
 .u { color: #036; } .a { color: #063; }
 textarea { width: 100%; } button { margin-top: .5em; }
</style></head><body>
<h2>CompeteSMoE chat</h2>
<div id="log"></div>
<p><input type="file" id="img" accept="image/*"></p>
<textarea id="msg" rows="3" placeholder="message"></textarea>
<button onclick="send()">Send</button>
<script>
const hist = [];
async function send() {
  const msg = document.getElementById('msg').value.trim();
  if (!msg) return;
  document.getElementById('msg').value = '';
  const log = document.getElementById('log');
  log.innerHTML += '<div class="u">USER: ' + msg + '</div>';
  let images = [];
  const f = document.getElementById('img').files[0];
  if (f) {
    const buf = await f.arrayBuffer();
    images = [btoa(String.fromCharCode(...new Uint8Array(buf)))];
  }
  hist.push(['USER', msg]);
  const resp = await fetch('/chat', {method: 'POST',
    headers: {'Content-Type': 'application/json'},
    body: JSON.stringify({messages: hist, images: images})});
  const data = await resp.json();
  hist.push(['ASSISTANT', data.text]);
  log.innerHTML += '<div class="a">ASSISTANT: ' + data.text + '</div>';
}
</script></body></html>
"""


def make_handler(controller_addr: str, model_name: str,
                 conv_template: str = "phi35"):
    from ..multimodal.conversation import conv_templates

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            data = json.loads(self.rfile.read(n) or b"{}")
            if self.path != "/chat":
                self.send_response(404)
                self.end_headers()
                return
            conv = conv_templates[conv_template].copy()
            msgs = data.get("messages", [])
            images = data.get("images") or []
            for i, (role, text) in enumerate(msgs):
                if i == 0 and images and "<image>" not in text:
                    text = "<image>\n" + text
                conv.append_message(
                    conv.roles[0] if role == "USER" else conv.roles[1],
                    text)
            conv.append_message(conv.roles[1], None)
            req = urlrequest.Request(
                controller_addr + "/worker_generate_stream",
                data=json.dumps({"model": model_name,
                                 "prompt": conv.get_prompt(),
                                 "images": images}).encode(),
                method="POST",
                headers={"Content-Type": "application/json"})
            text = ""
            with urlrequest.urlopen(req, timeout=300) as r:
                for part in r.read().split(b"\0"):
                    if part:
                        text = json.loads(part).get("text", text)
            body = json.dumps({"text": text}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def serve_web(controller_addr: str, model_name: str,
              host: str = "0.0.0.0", port: int = 7860,
              background: bool = False):
    httpd = ThreadingHTTPServer(
        (host, port), make_handler(controller_addr, model_name))
    if background:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd
    httpd.serve_forever()
