"""Stdlib HTTP inference server over a ``ServingModel``.

Endpoints:
    GET  /healthz      -> {"status": "ok"}
    GET  /v1/metadata  -> compiled shapes, strategy, source, batch stats
    POST /v1/predict   -> request {"scenes": [[[x,y] * >=8] * peds, ...],
                                   "seed": int (optional)}
                          response {"predictions": [(num, p_i, 12, 2) nested
                                    lists, one per scene]}

Concurrent requests are micro-batched into one device call (runtime.py);
a request may itself carry several scenes. No third-party deps — the whole
server is ``http.server`` + JSON, suitable as a sidecar on a TPU VM.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from mggan_tpu.serving.runtime import MicroBatcher, ServingModel


class _Handler(BaseHTTPRequestHandler):
    # set by make_server:
    model: ServingModel = None
    batcher: MicroBatcher = None
    quiet = True

    def log_message(self, fmt, *args):  # noqa: D102 — silence default stderr
        if not self.quiet:
            super().log_message(fmt, *args)

    def _send(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 — http.server API
        if self.path == "/healthz":
            self._send(200, {"status": "ok"})
        elif self.path == "/v1/metadata":
            m, b = self.model, self.batcher
            self._send(200, {
                "scenes": m.scenes, "peds": m.peds, "num": m.num,
                "obs_len": 8, "pred_len": 12,
                "strategy": m.strategy, "source": m.source,
                "batches_run": b.batches_run,
                "requests_served": b.requests_served,
            })
        else:
            self._send(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):  # noqa: N802
        if self.path != "/v1/predict":
            self._send(404, {"error": f"unknown path {self.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length))
            scenes = req["scenes"]
            seed = int(req.get("seed", 0))
            if not isinstance(scenes, list) or not scenes:
                raise ValueError("'scenes' must be a non-empty list")
            futures = [
                self.batcher.submit(np.asarray(s, np.float32), seed=seed + i)
                for i, s in enumerate(scenes)
            ]
            preds = [f.result(timeout=120).tolist() for f in futures]
            self._send(200, {"predictions": preds})
        except Exception as e:  # noqa: BLE001 — report to the client
            self._send(400, {"error": f"{type(e).__name__}: {e}"})


def make_server(model: ServingModel, host="127.0.0.1", port=0,
                max_wait_ms=5.0, quiet=True):
    """Build (but don't start) the HTTP server; returns (server, batcher).
    ``server.server_address[1]`` is the bound port (use port=0 for tests)."""
    batcher = MicroBatcher(model, max_wait_ms=max_wait_ms)
    handler = type("Handler", (_Handler,), {
        "model": model, "batcher": batcher, "quiet": quiet,
    })
    server = ThreadingHTTPServer((host, port), handler)
    return server, batcher


def serve_forever(model: ServingModel, host="127.0.0.1", port=8000,
                  max_wait_ms=5.0):
    server, batcher = make_server(model, host, port, max_wait_ms, quiet=False)
    print(f"serving {model.source} [{model.strategy}] "
          f"(S={model.scenes}, P={model.peds}, k={model.num}) "
          f"on http://{host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    finally:
        batcher.close()


def start_background(model: ServingModel, host="127.0.0.1", port=0,
                     max_wait_ms=5.0):
    """Start in a daemon thread (tests); returns (server, batcher, port)."""
    server, batcher = make_server(model, host, port, max_wait_ms)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, batcher, server.server_address[1]
