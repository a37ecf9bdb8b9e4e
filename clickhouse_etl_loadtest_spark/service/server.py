"""In-process pipeline service: the HTTP surface the reference drives remotely.

The reference talks to a closed GlassFlow service over HTTP through its SDK —
create / get-running / delete, one pipeline at a time
(/root/reference/src/utils/pipeline.py:27-123). This module exposes the same
lifecycle over the engine's own Structured Streaming runner
(:mod:`..streaming.query`), so a user of the reference's harness can point the
same workflow at ``http://host:port`` and get identical behavior with Spark
doing the work.

Endpoints (JSON bodies):

========  ==================  =======================================================
method    path                behavior
========  ==================  =======================================================
GET       /health             service liveness -> ``{"status": "ok"}``
GET       /pipeline           running pipeline id -> 200 ``{"pipeline_id": id}``;
                              404 when none is running
POST      /pipeline           create AND start from a pipeline-config JSON body;
                              201 on success, 409 when one is already running,
                              422 on invalid config
DELETE    /pipeline           stop + forget the running pipeline; 204, or 404
GET       /pipeline/health    running pipeline health: id, active flag, whether a
                              first progress event arrived (the readiness signal
                              replacing the reference's fixed 10 s sleep)
========  ==================  =======================================================

Scale note: the service itself is a control plane only — it holds no data and
starts exactly one streaming query on the driver; all data movement stays on
the executors, so the HTTP layer adds nothing to the 100 TB path.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from ..config.schemas import PipelineConfig
from ..streaming.query import run_streaming_pipeline, stop_pipeline


class PipelineService:
    """One-pipeline-at-a-time control plane over the streaming runner.

    ``work_dir`` receives per-pipeline ``<id>/sink`` parquet output and
    ``<id>/ckpt`` checkpoints. ``files_path`` (optional) resolves non-Kafka
    topic sources to JSON file streams — the hermetic twin used by tests;
    Kafka-sourced configs connect to the brokers named in the config exactly
    as the batch/streaming compiler does (S3/S5).
    """

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        files_path: str | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.spark = spark
        self.work_dir = work_dir
        self.files_path = files_path
        self._address = (host, port)
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()
        self._running_id: str | None = None
        self._query = None

    # -- lifecycle ----------------------------------------------------------
    def start(self) -> str:
        """Bind + serve on a background thread; returns the base URL."""
        handler = _make_handler(self)
        self._httpd = ThreadingHTTPServer(self._address, handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def stop(self) -> None:
        with self._lock:
            self._stop_running_locked()
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None

    # -- pipeline operations (called from handler threads) ------------------
    def create(self, body: dict) -> tuple[int, dict]:
        try:
            pipeline = PipelineConfig.model_validate(body)
        except Exception as exc:
            return 422, {"error": f"invalid pipeline config: {exc}"}
        with self._lock:
            if self._running_id is not None and self._query is not None and self._query.isActive:
                return 409, {"error": f"pipeline {self._running_id!r} already running"}
            self._stop_running_locked()  # crashed query: clear before restart
            pid = pipeline.pipeline_id
            try:
                self._query = run_streaming_pipeline(
                    self.spark,
                    pipeline,
                    f"{self.work_dir}/{pid}/sink",
                    f"{self.work_dir}/{pid}/ckpt",
                    files_path=self.files_path,
                    await_ready=False,
                )
            except Exception as exc:
                return 422, {"error": f"pipeline failed to start: {exc}"}
            self._running_id = pid
            return 201, {"pipeline_id": pid}

    def get_running(self) -> tuple[int, dict]:
        with self._lock:
            if self._running_id is None:
                return 404, {"error": "no running pipeline"}
            return 200, {"pipeline_id": self._running_id}

    def delete(self) -> tuple[int, dict | None]:
        with self._lock:
            if self._running_id is None:
                return 404, {"error": "no running pipeline"}
            self._stop_running_locked()
            return 204, None

    def health(self) -> tuple[int, dict]:
        with self._lock:
            if self._running_id is None or self._query is None:
                return 404, {"error": "no running pipeline"}
            return 200, {
                "pipeline_id": self._running_id,
                "active": bool(self._query.isActive),
                "ready": self._query.lastProgress is not None,
            }

    def _stop_running_locked(self) -> None:
        if self._running_id is not None:
            stop_pipeline(self._running_id)  # no-op if already terminated
            self._running_id = None
            self._query = None


def _make_handler(service: PipelineService):
    class Handler(BaseHTTPRequestHandler):
        # route table keyed by (method, path)
        def do_GET(self):  # noqa: N802 - http.server API
            if self.path == "/health":
                self._reply(200, {"status": "ok"})
            elif self.path == "/pipeline":
                self._reply(*service.get_running())
            elif self.path == "/pipeline/health":
                self._reply(*service.health())
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/pipeline":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError) as exc:
                self._reply(400, {"error": f"bad request body: {exc}"})
                return
            self._reply(*service.create(body))

        def do_DELETE(self):  # noqa: N802
            if self.path != "/pipeline":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            self._reply(*service.delete())

        def _reply(self, status: int, payload: dict | None) -> None:
            data = b"" if payload is None else json.dumps(payload).encode()
            self.send_response(status)
            if data:
                self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            if data:
                self.wfile.write(data)

        def log_message(self, fmt, *args):  # quiet: tests assert on stdout
            pass

    return Handler
