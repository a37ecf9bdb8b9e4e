"""HTTP client with the reference harness's method surface.

``PipelineServiceClient`` is a drop-in for the reference's
``GlassFlowPipeline`` wrapper (/root/reference/src/utils/pipeline.py:10-123):
``load_conf`` / ``create_pipeline`` / ``delete_pipeline`` /
``check_if_pipeline_exists`` / ``stop_pipeline_if_running`` /
``cleanup_pipeline``, raising the same typed errors its SDK raises. Readiness
after create polls ``/pipeline/health`` for the first progress event instead
of the reference's fixed 10 s sleep (:mod:`..streaming.query` readiness rule).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

from ..config.schemas import PipelineConfig
from .errors import (
    InvalidPipelineConfigError,
    PipelineAlreadyExistsError,
    PipelineNotFoundError,
    PipelineServiceError,
    ServiceConnectionError,
)


class PipelineServiceClient:
    def __init__(self, host: str = "http://localhost:8080", timeout_s: float = 10.0):
        self.host = host.rstrip("/")
        self.timeout_s = timeout_s

    @staticmethod
    def load_conf(config_json: dict) -> PipelineConfig:
        """Validate a pipeline-config dict (reference load_conf parity)."""
        return PipelineConfig.model_validate(config_json)

    # -- raw endpoint calls --------------------------------------------------
    def _request(self, method: str, path: str, body: dict | None = None) -> tuple[int, dict]:
        data = None if body is None else json.dumps(body).encode()
        req = urllib.request.Request(
            f"{self.host}{path}",
            data=data,
            method=method,
            headers={"Content-Type": "application/json"} if data else {},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                raw = resp.read()
                return resp.status, json.loads(raw) if raw else {}
        except urllib.error.HTTPError as exc:  # non-2xx: body still carries JSON
            raw = exc.read()
            try:
                payload = json.loads(raw) if raw else {}
            except json.JSONDecodeError:
                payload = {"error": raw.decode(errors="replace")}
            return exc.code, payload
        except urllib.error.URLError as exc:
            raise ServiceConnectionError(f"pipeline service at {self.host} unreachable: {exc.reason}") from exc

    # -- reference method surface -------------------------------------------
    def get_running_pipeline(self) -> str:
        status, payload = self._request("GET", "/pipeline")
        if status == 404:
            raise PipelineNotFoundError(payload.get("error", "no running pipeline"))
        return payload["pipeline_id"]

    def create_pipeline(
        self, config: PipelineConfig | dict, wait_ready: bool = True, timeout_s: float = 60.0
    ) -> str:
        body = config.model_dump(by_alias=True) if isinstance(config, PipelineConfig) else config
        status, payload = self._request("POST", "/pipeline", body)
        if status == 409:
            raise PipelineAlreadyExistsError(payload.get("error", "pipeline already exists"))
        if status != 201:
            raise InvalidPipelineConfigError(payload.get("error", f"create failed ({status})"))
        if wait_ready:
            self._wait_ready(timeout_s)
        return payload["pipeline_id"]

    def delete_pipeline(self) -> None:
        status, payload = self._request("DELETE", "/pipeline")
        if status == 404:
            raise PipelineNotFoundError(payload.get("error", "no running pipeline"))

    def pipeline_health(self) -> dict:
        status, payload = self._request("GET", "/pipeline/health")
        if status == 404:
            raise PipelineNotFoundError(payload.get("error", "no running pipeline"))
        return payload

    # -- composite lifecycle helpers (reference parity) ----------------------
    def check_if_pipeline_exists(self, config: PipelineConfig | dict) -> tuple[bool, str | None]:
        """(exists-with-this-id, running-id-or-None) — reference semantics:
        a DIFFERENT running pipeline returns (False, other_id)."""
        wanted = config.pipeline_id if isinstance(config, PipelineConfig) else config["pipeline_id"]
        try:
            running = self.get_running_pipeline()
        except PipelineNotFoundError:
            return False, None
        return running == wanted, running

    def stop_pipeline_if_running(self) -> None:
        try:
            self.get_running_pipeline()
        except PipelineNotFoundError:
            return
        self.delete_pipeline()

    def cleanup_pipeline(self) -> None:
        self.stop_pipeline_if_running()

    def _wait_ready(self, timeout_s: float) -> None:
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            health = self.pipeline_health()
            if health.get("ready"):
                return
            if not health.get("active"):
                # Runtime death after a valid create is an infrastructure
                # failure, not a config one — keep the error surfaces distinct.
                raise PipelineServiceError("pipeline terminated before first progress")
            time.sleep(0.2)
        raise TimeoutError(f"pipeline produced no progress within {timeout_s}s")
