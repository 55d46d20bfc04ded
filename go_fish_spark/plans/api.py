"""REST façade ≡ `api.go`.

Routes (`api.go:55-56` + `monitoring.go:86`):
  POST /pipelines      → validate, store, start async; 201 + UUID text
                         (`CreatePipeline`, `api.go:104-143` — the
                         reference also starts the pipeline in a goroutine)
  GET  /pipelines/{id} → stored raw config, 404 if absent
                         (`GetPipelines`, `api.go:84-101`)
  GET  /metrics        → Prometheus text exposition of the reference's two
                         metric families (`monitoring.go:65-86`): one
                         Pipelines gauge sample per stored pipeline, one
                         EventsReceived counter sample per streaming query
                         from the MetricsListener snapshot

stdlib http.server — the control plane's write rate is human-scale; query
execution stays entirely in Spark. The ``runner`` callable (invoked on a
daemon thread with the raw config) is injected so servers can run batch
pipelines, start streaming queries, or no-op in tests.
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .compiler import resolve_tasks
from .registry import PipelineRegistry
from .spec import ValidationError, parse_spec


class PipelineAPI:
    def __init__(
        self,
        registry: PipelineRegistry,
        runner: Callable[[str], None] | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
        metrics=None,  # streaming.monitoring.MetricsListener | None
        metrics_namespace: str = "go-fish",
    ) -> None:
        self.registry = registry
        self.runner = runner
        self.metrics = metrics
        self.metrics_namespace = metrics_namespace
        api = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, body: str, ctype: str = "text/plain") -> None:
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self) -> None:
                if self.path.rstrip("/") == "/metrics":
                    from ..streaming.monitoring import prometheus_text

                    snap = api.metrics.snapshot() if api.metrics else None
                    body = prometheus_text(
                        pipelines=dict.fromkeys(api.registry.list(), 1),
                        events=snap.by_query if snap else {},
                        namespace=api.metrics_namespace,
                    )
                    self._send(200, body, "text/plain; version=0.0.4")
                    return
                if not self.path.startswith("/pipelines/"):
                    self._send(404, "not found")
                    return
                uid = self.path[len("/pipelines/") :]
                cfg = api.registry.get(uid)
                if cfg is None:
                    # ≡ 404 on empty result (`api.go:95-98`)
                    self._send(404, f"pipeline {uid} not found")
                    return
                self._send(200, cfg, "application/json")

            def do_POST(self) -> None:
                if self.path.rstrip("/") != "/pipelines":
                    self._send(404, "not found")
                    return
                n = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(n).decode()
                try:
                    spec = parse_spec(raw)
                    resolve_tasks(spec)  # every task must load before Store
                except (ValidationError, ValueError) as e:
                    # ≡ the 400 branch of CreatePipeline (`api.go:113-118`)
                    self._send(400, f"invalid pipeline: {e}")
                    return
                uid = api.registry.store(raw)
                if api.runner is not None:
                    # ≡ "start the pipeline in a goroutine" (`api.go:126-131`)
                    threading.Thread(
                        target=api.runner, args=(raw,), daemon=True
                    ).start()
                self._send(201, uid)

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._server.server_address[1]

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)
