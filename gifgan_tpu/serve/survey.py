"""Human-survey hosting: serve exported sample sets + collect responses.

Replaces the reference's Firebase stack (firebase/firebase.json hosting of
three 250-GIF sample sets + an auth-gated realtime DB for responses,
SURVEY.md §2.7) with a self-contained stdlib server:

  GET  /                -> rating UI (embedded; shuffled GIFs across variants)
  GET  /manifest.json   -> the eval/survey.py export manifest
  GET  /<variant>_samples/<n>.gif
  POST /response        -> JSON {gif, variant, rating, worker} appended to
                           responses.jsonl (atomic line appends)
  GET  /results         -> aggregated mean rating per variant
"""

from __future__ import annotations

import json
import os
import threading
from collections import defaultdict
from typing import Dict, Optional


_SURVEY_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>sample survey</title>
<style>
 body{font-family:system-ui,sans-serif;background:#111;color:#eee;
      text-align:center;padding:40px}
 img{width:256px;height:256px;image-rendering:pixelated;border-radius:8px}
 button{margin:8px;padding:10px 20px;font-size:16px;border:0;
        border-radius:8px;cursor:pointer;background:#2d6cdf;color:#fff}
 #done{color:#8f8}
</style></head><body>
<h2>How realistic is this animation?</h2>
<div><img id="gif" alt="sample"></div>
<div id="buttons"></div>
<div id="progress"></div><div id="done"></div>
<script>
let items = [], idx = 0;
const worker = "w_" + Math.random().toString(36).slice(2, 10);
fetch("manifest.json").then(r => r.json()).then(m => {
  for (const [variant, files] of Object.entries(m.variants))
    for (const f of files) items.push({variant, f});
  for (let i = items.length - 1; i > 0; i--) {
    const j = Math.floor(Math.random() * (i + 1));
    [items[i], items[j]] = [items[j], items[i]];
  }
  show();
});
const labels = ["1 (fake)", "2", "3", "4", "5 (real)"];
document.getElementById("buttons").innerHTML =
  labels.map((l, i) => `<button onclick="rate(${i + 1})">${l}</button>`).join("");
function show() {
  if (idx >= items.length) {
    document.getElementById("done").textContent = "All done — thank you!";
    return;
  }
  document.getElementById("gif").src = items[idx].f;
  document.getElementById("progress").textContent =
    `${idx + 1} / ${items.length}`;
}
function rate(r) {
  const it = items[idx];
  fetch("response", {method: "POST", headers: {"Content-Type":
    "application/json"}, body: JSON.stringify(
    {gif: it.f, variant: it.variant, rating: r, worker})});
  idx++; show();
}
</script></body></html>
"""


class SurveyServer:
    def __init__(self, sample_dir: str,
                 responses_path: Optional[str] = None):
        self.sample_dir = sample_dir
        self.responses_path = responses_path or os.path.join(
            sample_dir, "responses.jsonl")
        self._lock = threading.Lock()

    def record(self, response: Dict) -> None:
        for field in ("gif", "variant", "rating"):
            if field not in response:
                raise ValueError(f"missing field {field}")
        response["rating"] = int(response["rating"])
        if not 1 <= response["rating"] <= 5:
            raise ValueError("rating must be 1..5")
        with self._lock:
            with open(self.responses_path, "a") as f:
                f.write(json.dumps(response) + "\n")

    def results(self) -> Dict:
        agg = defaultdict(list)
        if os.path.exists(self.responses_path):
            with open(self.responses_path) as f:
                for line in f:
                    if line.strip():
                        r = json.loads(line)
                        agg[r["variant"]].append(r["rating"])
        return {
            "variants": {
                v: {"n": len(rs), "mean_rating": sum(rs) / len(rs)}
                for v, rs in sorted(agg.items())
            }
        }


def serve(survey: SurveyServer, host: str = "127.0.0.1", port: int = 8082,
          background: bool = False,
          tls_cert: str = None, tls_key: str = None):
    from http.server import BaseHTTPRequestHandler

    from gifgan_tpu.serve.http_common import (MAX_FORM_BODY, body_length,
                                              make_server)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, body: bytes, ctype: str, code: int = 200):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/":
                return self._send(_SURVEY_PAGE.encode(), "text/html")
            if path == "/results":
                return self._send(json.dumps(survey.results()).encode(),
                                  "application/json")
            rel = path.lstrip("/")
            base = os.path.abspath(survey.sample_dir)
            full = os.path.abspath(os.path.join(base, rel))
            if full != base and not full.startswith(base + os.sep):
                return self._send(b"{}", "application/json", 403)
            if rel == "manifest.json" or rel.endswith(".gif"):
                try:
                    with open(full, "rb") as f:
                        body = f.read()
                except OSError:
                    return self._send(b"{}", "application/json", 404)
                ctype = ("application/json" if rel.endswith(".json")
                         else "image/gif")
                return self._send(body, ctype)
            self._send(b"{}", "application/json", 404)

        def do_POST(self):
            if self.path.split("?")[0] != "/response":
                return self._send(b"{}", "application/json", 404)
            n = body_length(self, MAX_FORM_BODY)
            if n is None:
                return
            try:
                survey.record(json.loads(self.rfile.read(n)))
                self._send(b'{"response": "success"}', "application/json")
            except Exception as e:
                self._send(json.dumps(
                    {"response": "error", "msg": str(e)}).encode(),
                    "application/json", 400)

    return make_server(host, port, Handler, background=background,
                       tls_cert=tls_cert, tls_key=tls_key)
